"""Orbax-backed checkpointing with true resume.

The reference saves epoch + model/optimizer/scheduler/scaler state dicts
(train_advanced.py:475-489) but its loader restores only the model
(test.py:167-188) — resume never actually works.  Here the FULL TrainState
(params, opt_state, step, PRNG key, batch_stats) plus config and metrics
round-trips through Orbax: best-by-metric retention, periodic snapshots,
and restore-into-state.

Torch ``.pth`` import for the published weights lives in
``models/convert.py`` (the two compose: import once, checkpoint natively
after).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 best_metric: str = "val_f1", best_mode: str = "max",
                 save_every_epochs: int = 10, async_save: bool = False):
        # save_every_epochs is informational: the PERIODICITY decision
        # lives in the Trainer (trainer.py), which reads its config
        # directly — tuning it here alone has no effect.
        """``async_save=True`` writes checkpoints on a background thread:
        ``save()`` returns as soon as the state is snapshotted off-device
        and training continues while serialization/IO runs (a full
        ViT-B/16 TrainState is ~1 GB of params+moments — seconds of
        blocked train loop per save otherwise).  ``close()`` and any
        save that must first inspect/delete existing steps drain the
        pending write, so on-disk state is always consistent."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_metric = best_metric
        self.best_mode = best_mode
        self.save_every_epochs = save_every_epochs
        self.async_save = async_save
        # a metric-less save must rank WORST for the configured mode —
        # -inf under best_mode='min' would rank it best and evict the
        # genuinely best checkpoints at max_to_keep
        worst = -np.inf if best_mode == "max" else np.inf
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get(best_metric, worst)),
            best_mode=best_mode,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    # -- save ---------------------------------------------------------------

    def save(self, step: int, state, *, metrics: Optional[dict] = None,
             config: Optional[dict] = None, force: bool = False,
             pin: bool = False) -> bool:
        """Save TrainState (+metrics/config) at `step`.

        Overwrites an existing checkpoint at the same step (a fresh run
        into a previously-used save_dir must not crash — the reference's
        ``torch.save`` overwrites too, train_advanced.py:475-489).  Any
        save at or below the directory's latest step is FORCED: orbax's
        should_save() silently rejects non-monotonic steps, which would
        otherwise skip the save (after a delete, that is data loss).

        ``pin=True`` exempts the checkpoint from best-by-metric
        retention (it is saved metric-LESS at the manager level, which
        orbax keeps unconditionally; the metrics dict still lands in
        the checkpoint's own metrics record).  Used for the preemption
        save: its val_f1 ties the existing best checkpoints, and a tie
        can lose the best-k garbage-collection race — evicting the very
        state the run must resume from."""
        if self.async_save:
            # the non-monotonic/overwrite handling below inspects and may
            # delete existing steps — racing a pending background write
            # there could delete a checkpoint mid-flight
            self._mgr.wait_until_finished()
        latest = self._mgr.latest_step()
        if latest is not None and step <= latest:
            if step in self._mgr.all_steps():
                log.warning("overwriting existing checkpoint at step %d "
                            "(fresh run into a used save_dir?)", step)
                self._mgr.delete(step)
            # fresh-run signature: a save below EVERY existing step can
            # only be a new run in a used directory — drop the previous
            # run's checkpoints, or latest_step()/load_params_from_dir
            # would silently keep serving the old weights until this run
            # surpasses them.  A save merely below the LATEST step is
            # ambiguous (legitimate branch-resume from best_step keeps
            # its later checkpoints), so that case only warns.
            existing = self._mgr.all_steps()
            if existing and step < min(existing):
                for stale in [s for s in existing if s > step]:
                    log.warning(
                        "deleting stale checkpoint at step %d from a "
                        "previous run (fresh run now at step %d)",
                        stale, step)
                    self._mgr.delete(stale)
            elif any(s > step for s in existing):
                # plain same-step overwrite (existing was just deleted
                # or nothing is later) needs no branch-resume warning
                log.warning(
                    "saving step %d below the directory's latest step %d"
                    " — later checkpoints are kept (branch resume?); "
                    "latest_step() will prefer them", step, latest)
            force = True
        payload = {
            "state": _state_tree(state),
        }
        if config is not None:
            payload["config"] = json.loads(json.dumps(config))
        saved = self._mgr.save(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.PyTreeSave(payload),
                metrics=ocp.args.JsonSave(
                    {k: _py(v) for k, v in (metrics or {}).items()}),
            ),
            metrics=(None if pin else
                     {k: _py(v) for k, v in (metrics or {}).items()}),
            force=force,
        )
        if not self.async_save:
            self._mgr.wait_until_finished()
        return saved

    # -- restore ------------------------------------------------------------

    def wait_until_finished(self):
        """Drain any pending background write (no-op when synchronous)."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._drain()
        return self._mgr.latest_step()

    def all_steps(self):
        self._drain()
        return list(self._mgr.all_steps())

    def best_step(self) -> Optional[int]:
        self._drain()
        return self._mgr.best_step()

    def _drain(self):
        # reads must see the async write that save() already acknowledged
        if self.async_save:
            self._mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing TrainState template (shapes/dtypes and
        the non-pytree fields — apply_fn, tx — come from the template)."""
        self._drain()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {"state": _state_tree(state)}
        # pipeline-parallel trainers restore into a PACKED template
        # (vit/blocks stacked subtree); a checkpoint saved in the plain
        # block{i} layout (or vice versa) would die inside orbax with an
        # opaque missing-key error — diagnose the layout mismatch here
        try:
            saved_vit = self._mgr.item_metadata(step)["tree"][
                "state"]["params"].get("vit", {})
        except (KeyError, TypeError):
            saved_vit = {}
        tmpl_vit = template["state"]["params"].get("vit", {})
        if hasattr(saved_vit, "get") and hasattr(tmpl_vit, "get"):
            saved_packed = "blocks" in saved_vit
            tmpl_packed = "blocks" in tmpl_vit
            if saved_packed != tmpl_packed:
                raise ValueError(
                    f"checkpoint at step {step} is in the "
                    f"{'packed pipeline' if saved_packed else 'plain module'} "
                    f"parameter layout but this trainer expects the "
                    f"{'packed pipeline' if tmpl_packed else 'plain module'} "
                    "layout — resume with the same sharding.pipeline_parallel "
                    "setting the checkpoint was trained with, or load it for "
                    "inference via load_params_from_dir (which always hands "
                    "back the plain layout)")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.PyTreeRestore(
                    item=template,
                    restore_args=jax.tree.map(
                        lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype),
                        template),
                    partial_restore=True),
            ),
        )["tree"]
        t = restored["state"]
        return state.replace(
            step=t["step"], params=t["params"], opt_state=t["opt_state"],
            rng=t["rng"], batch_stats=t.get("batch_stats"))

    def restore_metrics(self, step: Optional[int] = None) -> dict:
        self._drain()
        if step is None:
            step = self._mgr.latest_step()
        out = self._mgr.restore(
            step, args=ocp.args.Composite(metrics=ocp.args.JsonRestore()))
        return out["metrics"]

    def close(self):
        self._mgr.close()


def load_params_from_dir(directory: str, step: Optional[int] = None):
    """Load just the model params (and batch_stats if present) from an
    Orbax checkpoint directory written by :class:`CheckpointManager`,
    without needing the TrainState template — the bridge that lets the
    eval/benchmark CLIs consume checkpoints produced by training."""
    variables, step, _metrics = load_checkpoint_bundle(directory, step)
    return variables, step


def _state_tree(state) -> dict:
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    return tree


def _py(v) -> Any:
    return v.item() if hasattr(v, "item") else v


def _find_ema_subtree(node):
    """The EMA shadow inside a RESTORED (template-free) opt_state:
    train/state.py::EmaState round-trips through orbax as a container
    whose only child is ``polyak_shadow`` (its single NamedTuple field
    — named to be collision-proof against params-shaped optimizer
    states like adamw's mu/nu, which mirror the model's module names)."""
    if isinstance(node, dict):
        keys = set(node)
        if keys == {"polyak_shadow"}:
            return node["polyak_shadow"]
        it = node.values()
    elif isinstance(node, (list, tuple)):
        it = node
    else:
        return None
    for sub in it:
        found = _find_ema_subtree(sub)
        if found is not None:
            return found
    return None


def list_checkpoints(directory: str):
    """[(step, metrics_dict)] ascending — a metrics-only read (no
    arrays touch the device or host RAM), for inspection tooling
    (`describe` CLI).  Steps saved without a metrics item report {}."""
    directory = os.path.abspath(directory)
    mgr = ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            enable_async_checkpointing=False),
        item_handlers={"metrics": ocp.JsonCheckpointHandler()})
    try:
        out = []
        for step in sorted(mgr.all_steps()):
            try:
                restored = mgr.restore(step, args=ocp.args.Composite(
                    metrics=ocp.args.JsonRestore()))
                metrics = dict(restored["metrics"] or {})
            except (KeyError, FileNotFoundError):
                metrics = {}
            out.append((int(step), metrics))
        return out
    finally:
        mgr.close()


def load_checkpoint_bundle(directory: str, step: Optional[int] = None,
                           ema: bool = False):
    """(variables, step, metrics) from an Orbax checkpoint directory in
    ONE manager pass — params plus the metrics JSON (epoch, val_f1, ...
    from Trainer saves), no state template needed.  ``ema=True`` hands
    back the Polyak shadow weights (optim.ema_decay training) instead
    of the last iterate; raises if the run trained without EMA."""
    directory = os.path.abspath(directory)
    # item_handlers make item_metadata readable from a FRESH manager
    # (without them the metadata tree is empty and restore_args below
    # would be a no-op)
    mgr = ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(enable_async_checkpointing=False),
        item_handlers={"tree": ocp.PyTreeCheckpointHandler(),
                       "metrics": ocp.JsonCheckpointHandler()})
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        # restore as HOST numpy: without restore_args orbax re-applies
        # the sharding recorded at SAVE time, which fails when the
        # eval/export host has a different device topology than the
        # training mesh (orbax warns this fallback is unsafe).  Only the
        # "state" subtree holds arrays — forcing np.ndarray onto the
        # config payload's string leaves makes tensorstore look for
        # zarr metadata that does not exist
        meta = mgr.item_metadata(step)["tree"]
        ra = {k: jax.tree.map(
            lambda _m, _k=k: (ocp.RestoreArgs(restore_type=np.ndarray)
                              if _k == "state" else ocp.RestoreArgs()), v)
            for k, v in meta.items()}
        restored = mgr.restore(
            step, args=ocp.args.Composite(
                tree=ocp.args.PyTreeRestore(restore_args=ra),
                metrics=ocp.args.JsonRestore()))
        tree = restored["tree"]["state"]
        params = tree["params"]
        if ema:
            shadow = _find_ema_subtree(tree.get("opt_state"))
            if shadow is None:
                raise ValueError(
                    f"checkpoint at {directory} (step {step}) has no EMA "
                    f"state — train with optim.ema_decay set")
            params = shadow
        variables = {"params": params}
        if "batch_stats" in tree:
            variables["batch_stats"] = tree["batch_stats"]
        # pipeline-parallel trainers save params in the packed layout
        # (blocks stacked over the pipe axis); this is the read-for-
        # inference/export path, so hand back the plain module layout
        # (numpy views — no copy).  Resume restores into the Trainer's
        # own packed target and never comes through here.
        if "blocks" in variables["params"].get("vit", {}):
            from ..parallel.pipeline import unpack_pipeline_params
            variables = unpack_pipeline_params(variables)
        return variables, int(step), dict(restored["metrics"] or {})
    finally:
        mgr.close()
