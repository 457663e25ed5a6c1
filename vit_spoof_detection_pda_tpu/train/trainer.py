"""Config-driven training orchestrator.

The reference's ``train()`` (train_advanced.py:492-693) is a 200-line
script: wandb init, seeding, scan, class weights, split, loaders, model,
loss/opt/sched/scaler, epoch loop with best-tracking + early stop.  Here
the lifecycle is the same but the per-batch work is one compiled
``train_step`` and validation is one compiled ``eval_step`` + device-side
metric reductions (metrics/device.py) — the host loop only feeds batches
and logs.

Data contract: ``train_batches(epoch) -> iterator of {"image": [B,H,W,3]
float32 (normalized), "label": [B] int32}``; ``val_batches() ->`` same.
The data layer provides these; synthetic iterators work for tests.
Sources may additionally accept ``train_batches(epoch, skip=n)`` to
reposition ``n`` batches into the epoch before decode (exact mid-epoch
resume); without it the Trainer discards the prefix host-side.
"""

from __future__ import annotations

import logging
import signal
import threading
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..metrics import device as dmetrics
from ..ops import losses
from ..parallel import (mesh_from_config, shard_batch, shard_params,
                        shard_params_fsdp)
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from ..utils.checkpoint import CheckpointManager
from ..utils.telemetry import MetricLogger
from .early_stop import EarlyStopping
from .schedule import make_lr_schedule
from .state import create_train_state, make_optimizer
from .step import make_eval_step, make_train_step

log = logging.getLogger(__name__)


class _Preempted(Exception):
    """Raised at a safe point (batch boundary) after a preemption
    request; caught by the fit loop to checkpoint and exit."""


class Trainer:
    def __init__(self, config: Config, module, *,
                 train_batches: Callable[[int], Iterable],
                 val_batches: Callable[[], Iterable],
                 steps_per_epoch: int,
                 class_counts=None,
                 variables=None,
                 mesh=None,
                 logger: Optional[MetricLogger] = None,
                 checkpoints: Optional[CheckpointManager] = None,
                 batch_prep=None):
        self.config = config
        self.module = module
        self.train_batches = train_batches
        self.val_batches = val_batches
        self.steps_per_epoch = steps_per_epoch
        self._preempt = threading.Event()
        self.mesh = (mesh if mesh is not None
                     else mesh_from_config(config.sharding))
        self.logger = logger or MetricLogger(
            jsonl_path=config.telemetry.jsonl_path,
            wandb_project=config.telemetry.wandb_project,
            wandb_entity=config.telemetry.wandb_entity,
            config=config.to_dict())
        self.checkpoints = checkpoints

        # the schedule inside optax.MultiSteps advances once per
        # ACCUMULATED update, not per micro-step — size the horizon in
        # updates or the cosine never completes under accumulation
        self._accum = max(config.optim.gradient_accumulation_steps, 1)
        total_steps = steps_per_epoch * config.optim.num_epochs \
            // self._accum
        warmup_steps = steps_per_epoch * config.optim.warmup_epochs \
            // self._accum
        self.lr_schedule = make_lr_schedule(
            config.optim.learning_rate, total_steps, warmup_steps,
            config.optim.min_lr, config.optim.true_warmup)

        tx = make_optimizer(
            self.lr_schedule,
            weight_decay=config.optim.weight_decay,
            beta1=config.optim.beta1, beta2=config.optim.beta2,
            max_grad_norm=config.optim.max_grad_norm,
            gradient_accumulation_steps=(
                config.optim.gradient_accumulation_steps),
            ema_decay=getattr(config.optim, "ema_decay", None))

        class_weights = None
        if config.loss.loss_type == "weighted_ce":
            if class_counts is None:
                raise ValueError("weighted_ce needs class_counts")
            class_weights = losses.class_weights_from_counts(class_counts)
        loss_fn = losses.make_loss_fn(
            config.loss.loss_type,
            focal_alpha=config.loss.focal_alpha,
            focal_gamma=config.loss.focal_gamma,
            label_smoothing=config.loss.label_smoothing,
            class_weights=class_weights)

        rng = jax.random.PRNGKey(config.seed)
        size = config.data.img_size
        # configured parameter layout, applied INSIDE create_train_state
        # (before tx.init) so the Adam moments are born in the layout and
        # GSPMD derives the use-site collectives from the state's
        # shardings (the train step's in_shardings for the state are
        # inherited); a replicated init + re-init would transiently
        # double the optimizer memory on device 0
        from ..parallel.pipeline import PIPE_AXIS
        param_layout = None
        pipelined_apply = None
        if self.mesh.devices.size > 1:
            axis_sizes = dict(zip(self.mesh.axis_names,
                                  self.mesh.devices.shape))
            fsdp = getattr(config.sharding, "fsdp", False)
            n_pipe = axis_sizes.get(PIPE_AXIS, 1)
            if n_pipe > 1:
                # pipeline-parallel training: parameters live in the
                # PACKED pipeline layout (parallel/pipeline.py::
                # pack_pipeline_params — the block{i} subtrees as one
                # "blocks" stack, its layer dim sharded over pipe, so
                # each stage holds 1/pipe of the encoder AND its Adam
                # moments; with a model axis the stacked leaves also
                # carry their Megatron trailing-dim specs).  The train
                # forward routes through the GPipe schedule; eval
                # unpacks inside its jitted step and runs the plain
                # module forward (any batch size, GSPMD data-shards it).
                from ..models.vit import ViTAntiSpoof
                from ..parallel.pipeline import (
                    pack_pipeline_params, pipe_param_specs, pipeline_apply)
                from jax.sharding import NamedSharding
                if fsdp:
                    # mesh_from_config rejects this; guard explicit
                    # meshes too
                    raise ValueError(
                        "fsdp composes with pure data parallelism only "
                        "(mesh has a pipe axis > 1)")
                if not isinstance(module, ViTAntiSpoof):
                    raise ValueError(
                        "pipeline_parallel supports the ViT anti-spoof "
                        f"module only; got {type(module).__name__}")
                micro = getattr(config.sharding, "pipeline_microbatches",
                                0) or 2 * n_pipe
                remat = getattr(config.sharding, "pipeline_remat", False)
                mesh_pp = self.mesh
                tp_in_pipe = axis_sizes.get(MODEL_AXIS, 1) > 1

                def param_layout(p):
                    packed = pack_pipeline_params(
                        {"params": p}, module.depth)["params"]
                    specs = pipe_param_specs(
                        {"params": p}, module.depth,
                        tp=tp_in_pipe)["params"]
                    return jax.tree.map(
                        lambda x, s: jax.device_put(
                            x, NamedSharding(mesh_pp, s)), packed, specs)

                def pipelined_apply(variables, images, train=False,
                                    rngs=None):
                    return pipeline_apply(module, variables, images,
                                          mesh_pp, microbatches=micro,
                                          train=train, rngs=rngs,
                                          remat=remat)
            elif axis_sizes.get(MODEL_AXIS, 1) > 1:
                if fsdp:
                    # mesh_from_config rejects this; guard explicit meshes
                    # too — silently dropping fsdp would fake its memory
                    # saving
                    raise ValueError(
                        "fsdp composes with pure data parallelism only "
                        "(mesh has a model axis > 1)")
                param_layout = lambda p: shard_params(p, self.mesh)
            elif fsdp:
                param_layout = lambda p: shard_params_fsdp(
                    p, self.mesh,
                    min_size=getattr(config.sharding, "fsdp_min_size",
                                     2 ** 16))
        self.state = create_train_state(
            module, tx, rng, input_shape=(1, size, size, 3),
            variables=variables, param_layout=param_layout)
        if pipelined_apply is not None:
            self.state = self.state.replace(apply_fn=pipelined_apply)
        if getattr(config.model, "fused_train_forward", False):
            from ..models.fasttrain import fast_apply_available, make_apply
            if fast_apply_available(module, self.mesh):
                # train-step forward through the fused attention-block
                # Pallas kernel (models/fasttrain.py); eval keeps
                # module.apply.  model.mlp_vjp selects the MLP backward
                # strategy (default "hidden" — the measured optimum)
                self.state = self.state.replace(apply_fn=make_apply(
                    module,
                    mlp_mode=getattr(config.model, "mlp_vjp", None)))
        has_stats = self.state.batch_stats is not None
        self._eval_loss = jax.jit(loss_fn)   # val loss (reference :387-391)

        # batch_prep: on-device augmentation fused INTO the compiled step
        # (callable, or {group_tag: callable} for the online severity
        # groups — batches then carry a "group" key selecting their step)
        preps = (batch_prep if isinstance(batch_prep, dict)
                 else {None: batch_prep})
        self.train_steps = {
            tag: make_train_step(loss_fn, has_batch_stats=has_stats,
                                 mesh=self.mesh, batch_prep=prep)
            for tag, prep in preps.items()}
        eval_apply = module.apply
        if pipelined_apply is not None:
            # packed-layout params: unpack INSIDE the jitted eval step
            # (slices of the stacked leaves — a transient replicated
            # copy, off the training memory peak) and run the plain
            # module forward: no microbatch-divisibility constraint on
            # eval batches
            from ..parallel.pipeline import unpack_pipeline_params

            def eval_apply(variables, images, **kw):
                return module.apply(unpack_pipeline_params(variables),
                                    images, **kw)
        self.eval_step = make_eval_step(
            eval_apply, has_batch_stats=has_stats, mesh=self.mesh)

    # ------------------------------------------------------------------

    def request_preemption(self):
        """Ask the fit loop to checkpoint and exit at the next batch
        boundary (safe point).  Called from the SIGTERM handler fit()
        installs, or directly by a cluster manager integration."""
        self._preempt.set()

    def _preemption_agreed(self) -> bool:
        """Whether to preempt at this safe point.  Single-process: the
        local flag.  Multi-host SPMD: hosts receive SIGTERM at slightly
        different times, and a host that stops enqueueing while the
        others enter the gradient all-reduce deadlocks the pod — so the
        flag is agreed across hosts (any host set -> all preempt at the
        SAME batch index, so the collective orbax save sees one step)."""
        local = self._preempt.is_set()
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(local, np.bool_))
        return bool(np.any(flags))

    def fit(self, start_epoch: int = 0, start_batch: int = 0):
        """Run the training lifecycle.  ``start_epoch`` > 0 resumes the
        epoch loop mid-horizon (the optimizer/schedule position lives
        in the restored opt_state; this only skips already-trained
        epochs' data passes).  ``start_batch`` > 0 additionally resumes
        the FIRST epoch run at that batch position (exact mid-epoch
        resume after preemption: per-epoch shuffles are seeded, so the
        skipped prefix is exactly the set of batches already trained)."""
        cfg = self.config
        stopper = EarlyStopping(cfg.early_stop.patience,
                                cfg.early_stop.min_delta,
                                cfg.early_stop.mode)
        best = {"val_f1": -1.0, "epoch": -1}
        from ..utils.profiling import profile_trace
        import contextlib

        from ..ops.attention import attention_sharding
        fit_ctx = (attention_sharding(mesh=self.mesh)
                   if self.mesh.devices.size > 1
                   else contextlib.nullcontext())
        # Preemption-safe training: SIGTERM (the TPU-pod / cluster
        # eviction signal) requests a checkpoint at the next batch
        # boundary instead of killing the run mid-state.  The handler
        # only sets a flag — all checkpoint IO happens at the safe
        # point in the loop, never inside the signal context.
        prev_handler = None
        hook = (self.checkpoints is not None
                and cfg.checkpoint.save_on_preemption
                and threading.current_thread() is threading.main_thread())
        # a stale flag from a cancelled eviction (spot-VM false alarm)
        # must not make every later fit() exit at batch 0 untrained
        self._preempt.clear()
        if hook:
            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: self.request_preemption())
        try:
            with fit_ctx:
                return self._fit_loop(cfg, stopper, best, profile_trace,
                                      start_epoch, start_batch)
        finally:
            if hook:
                signal.signal(signal.SIGTERM, prev_handler)

    def _fit_loop(self, cfg, stopper, best, profile_trace,
                  start_epoch=0, start_batch=0):
        try:
            return self._fit_epochs(cfg, stopper, best, profile_trace,
                                    start_epoch, start_batch)
        except _Preempted:
            if self.checkpoints:
                step = int(self.state.step)
                if step in self.checkpoints.all_steps():
                    # e.g. SIGTERM landed in the validate/best-save
                    # window: this exact state is already on disk.
                    # Re-saving would DELETE it first (same-step
                    # overwrite semantics) and re-serialize ~1 GB —
                    # a data-loss window if the grace period expires
                    # mid-rewrite.  Keep the existing checkpoint.
                    log.warning("preemption requested — step %d is "
                                "already checkpointed; exiting", step)
                else:
                    log.warning("preemption requested — checkpointing "
                                "at step %d before exit", step)
                    # pin: exempt from best-k retention — this val_f1
                    # ties the existing best checkpoints and a tie can
                    # lose the GC race, silently evicting the resume
                    # state
                    # deliberately NO optimal_threshold here: the saved
                    # weights are the mid-training preemption point, and
                    # best's threshold was validated on a DIFFERENT
                    # (best-epoch) model — deploying that pair would mix
                    # weights and operating point.  `--threshold
                    # optimal` on this checkpoint fails with the
                    # train-and-persist message instead.
                    self.checkpoints.save(
                        step, self.state,
                        metrics={"val_f1": best["val_f1"],
                                 "epoch": best["epoch"],
                                 "preempted": True},
                        config=self.config.to_dict(), force=True,
                        pin=True)
                self.checkpoints.wait_until_finished()
            return {**best, "preempted": True}

    def _fit_epochs(self, cfg, stopper, best, profile_trace,
                    start_epoch=0, start_batch=0):
        for epoch in range(start_epoch, cfg.optim.num_epochs):
            if self._preemption_agreed():
                raise _Preempted
            t0 = time.time()
            # capture a profiler trace of the first epoch when configured
            with profile_trace(cfg.telemetry.profile_dir
                               if epoch == start_epoch else None):
                train_metrics = self.train_epoch(
                    epoch,
                    skip_batches=start_batch if epoch == start_epoch
                    else 0)
            val_metrics = self.validate(epoch=epoch)
            epoch_summary = {
                "epoch": epoch,
                "epoch_time_s": time.time() - t0,
                "train/epoch": epoch,
                **{f"train/{k}": v for k, v in train_metrics.items()},
                **{f"val/{k}": v for k, v in val_metrics.items()},
            }
            self.logger.log(epoch_summary, step=int(self.state.step))

            val_f1 = float(val_metrics["f1"])
            # persist the validated OPERATING POINT with the weights:
            # export-serving --threshold optimal and serve --threshold
            # optimal deploy it (the reference computes an optimal
            # threshold every epoch, train_advanced.py:449-462, but its
            # .pth checkpoints drop it)
            ckpt_metrics = {"val_f1": val_f1, "epoch": epoch}
            for k in ("optimal_threshold", "optimal_f1", "auc"):
                if k in val_metrics:
                    ckpt_metrics[k] = float(val_metrics[k])
            if getattr(cfg.optim, "ema_decay", None) is not None:
                # deployment consumers (export-serving/serve) use this
                # to warn when the raw iterate is deployed at a
                # threshold that was validated on the EMA shadow
                ckpt_metrics["ema_decay"] = float(cfg.optim.ema_decay)
            if val_f1 > best["val_f1"]:
                # in-place: _fit_loop's preemption handler reads THIS
                # dict — rebinding the local name would make a preempted
                # return (and the preemption checkpoint's metrics)
                # report the stale initial {-1, -1} forever
                best.clear()
                best.update({"val_f1": val_f1, "epoch": epoch,
                             **{k: float(v) for k, v in val_metrics.items()
                                if np.isscalar(v)
                                or getattr(v, "ndim", 1) == 0}})
                if self.checkpoints:
                    self.checkpoints.save(
                        int(self.state.step), self.state,
                        metrics=ckpt_metrics,
                        config=self.config.to_dict(), force=True)
            elif self.checkpoints and (
                    (epoch + 1) % cfg.checkpoint.save_every_epochs == 0):
                self.checkpoints.save(
                    int(self.state.step), self.state,
                    metrics=ckpt_metrics,
                    config=self.config.to_dict())

            if stopper.update(val_f1):
                log.info("early stopping at epoch %d (best %.4f @ %d)",
                         epoch, stopper.best_score, best["epoch"])
                break
        if self.checkpoints:
            # async_save: the last save may still be writing — fit() must
            # not return before the checkpoint a caller will read exists
            self.checkpoints.wait_until_finished()
        return best

    # ------------------------------------------------------------------

    def _epoch_batches(self, epoch: int, skip: int):
        """The epoch's batch iterator, positioned ``skip`` batches in.

        Data sources that accept ``skip=`` (DataPipeline / ShardStore /
        OnlineAugmentedData and the driver's wrappers) reposition BEFORE
        decode; anything else falls back to host-side discard of the
        prefix — slower but identical batches, since per-epoch orders
        are seeded."""
        if not skip:
            return self.train_batches(epoch)
        try:
            return self.train_batches(epoch, skip=skip)
        except TypeError:
            log.warning(
                "train_batches has no skip= support — discarding %d "
                "already-trained batches host-side (decode cost only)",
                skip)
            it = iter(self.train_batches(epoch))
            for _ in range(skip):
                if next(it, None) is None:
                    break
            return it

    def train_epoch(self, epoch: int, skip_batches: int = 0):
        from ..utils.profiling import StepTimer, device_memory_gb

        meters = {"loss": 0.0, "accuracy": 0.0}
        count = 0
        pending = None
        timer = StepTimer()
        # host-side step mirror: int(self.state.step) inside the loop
        # would block on the step just enqueued (the same-step sync this
        # loop exists to avoid); one fetch at epoch start is free (queue
        # empty) and micro-steps advance by exactly 1 per batch
        step0 = int(self.state.step)
        for i, batch in enumerate(self._epoch_batches(epoch,
                                                      skip_batches)):
            if self._preemption_agreed():
                raise _Preempted     # safe point: between enqueued steps
            batch = dict(batch)
            group = batch.pop("group", None)
            batch = self._device_batch(batch)
            try:
                # an unknown tag must fail loudly — silently training a
                # batch through another group's augmentation chain would
                # corrupt the run with plausible-looking metrics
                step_fn = self.train_steps[group]
            except KeyError:
                raise KeyError(
                    f"batch tagged group={group!r} but batch_prep only "
                    f"defines {sorted(map(str, self.train_steps))}")
            prev = pending
            self.state, pending = step_fn(self.state, batch)
            rate = timer.tick()
            # fetch the *previous* step's metrics: keeps the device queue
            # busy (no same-step sync, unlike the reference's `.item()`
            # every batch, train_advanced.py:341-352)
            if prev is not None:
                self._accumulate(meters, prev)
                count += 1
            if ((i + 1) % self.config.telemetry.log_interval == 0
                    and prev is not None):
                # prev holds the metrics of the PREVIOUS batch (the
                # one-behind fetch) — its micro-step index is i-1
                step = step0 + i - 1
                record = {
                    "train/loss": float(prev["loss"]),
                    "train/acc": float(prev["accuracy"]),
                    # the LR the optimizer applied at that micro-step:
                    # MultiSteps advances the inner schedule once per
                    # accumulated update
                    "train/lr": float(self.lr_schedule(
                        step // self._accum)),
                }
                if "grad_norm" in prev:
                    record["train/grad_norm"] = float(prev["grad_norm"])
                if rate:
                    record["train/steps_per_sec"] = rate
                # reference parity: per-step gpu_mem tqdm postfix
                # (train_advanced.py:348-352); sampled at log cadence
                # only (may round-trip on relayed backends)
                mem = device_memory_gb()
                if mem is not None:
                    record["train/device_mem_gb"] = mem
                self.logger.log(record, step=step)
        if pending is not None:
            self._accumulate(meters, pending)
            count += 1
        return {k: v / max(count, 1) for k, v in meters.items()}

    @staticmethod
    def _accumulate(meters, metrics):
        for k in meters:
            meters[k] += float(metrics[k])

    # ------------------------------------------------------------------

    def validate(self, epoch: Optional[int] = None):
        """Eval pass + device-side metrics.

        Emits the reference's FULL per-phase W&B block
        (train_advanced.py:411-427: loss/accuracy/precision/recall/f1/auc/
        specificity/npv/tp/tn/fp/fn/far/frr/epoch), the complete
        optimal-threshold block (:449-462) and, through the MetricLogger,
        the 41-point ``threshold_sweep/*`` series (:267-275) — all from
        one device-side threshold table instead of host sklearn
        round-trips.
        """
        # data-axis size by NAME — a caller-built mesh need not put the
        # data axis first (shard_params_fsdp does the same lookup)
        dsize = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get(DATA_AXIS, 1)
        # with EMA enabled, validate the weights that would DEPLOY (the
        # Polyak shadow), so best-checkpoint selection tracks them
        eval_params = self.state.params
        if getattr(self.config.optim, "ema_decay", None) is not None:
            from .state import find_ema_params
            ema = find_ema_params(self.state.opt_state)
            if ema is not None:
                eval_params = ema
        scores, labels, losses = [], [], []
        n_seen = 0
        for batch in self.val_batches():
            images = jnp.asarray(batch["image"])
            lbl = jnp.asarray(batch["label"])
            b = images.shape[0]
            # pad to a multiple of the data axis so the batch shards evenly
            target = -(-b // dsize) * dsize
            if target != b:
                pad = jnp.zeros((target - b,) + images.shape[1:],
                                images.dtype)
                images = jnp.concatenate([images, pad])
            out = self.eval_step(eval_params, self.state.batch_stats,
                                 images)
            # loss stays ON DEVICE until after the loop (a float() here
            # would sync the queue every batch — the reference's .item()
            # pattern this module exists to avoid)
            losses.append(self._eval_loss(out["logits"][:b], lbl) * b)
            n_seen += b
            scores.append(out["score"][:b])
            labels.append(lbl)
        scores = jnp.concatenate(scores)
        labels = jnp.concatenate(labels)

        table = dmetrics.threshold_table(scores, labels, jnp.asarray([0.5]))
        out = {
            "loss": float(sum(losses)) / max(n_seen, 1),
            "accuracy": table["accuracy"][0],
            "precision": table["precision"][0],
            "recall": table["recall"][0],
            "f1": table["f1_score"][0],
            "auc": dmetrics.auc(scores, labels),
            "specificity": table["specificity"][0],
            "npv": table["npv"][0],
            "tp": table["tp"][0], "tn": table["tn"][0],
            "fp": table["fp"][0], "fn": table["fn"][0],
            "far": table["far"][0],
            "frr": table["frr"][0],
        }
        if epoch is not None:
            out["epoch"] = epoch
        if self.config.threshold.optimize:
            cfg_t = self.config.threshold
            grid = jnp.linspace(cfg_t.t_min, cfg_t.t_max, cfg_t.steps)
            sweep = dmetrics.threshold_table(scores, labels, grid)
            sweep = {k: np.asarray(v) for k, v in sweep.items()}
            # the reference logs every sweep point (:267-275)
            for i in range(len(grid)):
                self.logger.log({
                    "threshold_sweep/threshold": float(sweep["threshold"][i]),
                    "threshold_sweep/accuracy": float(sweep["accuracy"][i]),
                    "threshold_sweep/precision": float(sweep["precision"][i]),
                    "threshold_sweep/recall": float(sweep["recall"][i]),
                    "threshold_sweep/f1": float(sweep["f1_score"][i]),
                })
            bi = int(np.argmax(sweep["f1_score"]))
            out.update({
                "optimal_threshold": sweep["threshold"][bi],
                "optimal_accuracy": sweep["accuracy"][bi],
                "optimal_precision": sweep["precision"][bi],
                "optimal_recall": sweep["recall"][bi],
                "optimal_f1": sweep["f1_score"][bi],
                "optimal_specificity": sweep["specificity"][bi],
                "optimal_far": sweep["far"][bi],
                "optimal_frr": sweep["frr"][bi],
                "optimal_tp": sweep["tp"][bi],
                "optimal_tn": sweep["tn"][bi],
                "optimal_fp": sweep["fp"][bi],
                "optimal_fn": sweep["fn"][bi],
            })
        out = {k: float(v) for k, v in out.items()}
        if jax.process_count() > 1:
            # multi-host: each process validated its own shard
            # (data/loader.py::shard_for_host), so per-host metrics
            # differ — every process must adopt ONE value or the
            # early-stop / best-checkpoint decisions in fit() diverge
            # and the next epoch's SPMD step deadlocks (one host joins
            # the gradient all-reduce, another has stopped)
            from jax.experimental import multihost_utils
            keys = sorted(out)
            vals = multihost_utils.broadcast_one_to_all(
                np.asarray([out[k] for k in keys], np.float32))
            out = {k: float(v) for k, v in zip(keys, vals)}
        return out

    # ------------------------------------------------------------------

    def _device_batch(self, batch):
        img = batch["image"]
        if not isinstance(img, jax.Array):
            img = np.asarray(img)
            if img.dtype != np.uint8:   # raw u8 stays u8 for fused prep
                img = img.astype(np.float32, copy=False)
        lbl = batch["label"]
        if not isinstance(lbl, jax.Array):
            lbl = np.asarray(lbl, np.int32)
        if "index" in batch:
            # pool mode (train/pool.py): image is the HBM-resident pool,
            # already replicated on device — only the tiny index/label
            # vectors cross host->device each step.  Every process
            # generates the IDENTICAL global index batch (same seeds on
            # the unsharded record set), so in a multi-process run each
            # host contributes its row slice (shard_batch expects LOCAL
            # rows there).
            idx = np.asarray(batch["index"], np.int32)
            lbl_np = np.asarray(lbl, np.int32)
            n_proc = jax.process_count()
            if n_proc > 1:
                if len(idx) % n_proc:
                    # fail loudly: silent truncation would shrink the
                    # global batch to per*n_proc and bias training
                    raise ValueError(
                        f"pool-mode batch of {len(idx)} rows does not "
                        f"divide over {n_proc} processes; choose a "
                        "batch_size divisible by process_count")
                per = len(idx) // n_proc
                lo = jax.process_index() * per
                idx = idx[lo:lo + per]
                lbl_np = lbl_np[lo:lo + per]
            small = shard_batch({"index": idx, "label": lbl_np},
                                self.mesh)
            return {"image": img, **small}
        return shard_batch({"image": img, "label": lbl}, self.mesh)
