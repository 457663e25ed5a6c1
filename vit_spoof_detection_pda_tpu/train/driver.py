"""Config -> full training run (the reference's ``train()`` lifecycle,
train_advanced.py:492-693, as a library function).

Pipeline: scan augmented store -> class counts -> stratified split ->
host decode (shorter-side resize to 256) -> ON-DEVICE per-batch
augmentation (RandomCrop 224 / HFlip / ColorJitter / Rotation /
RandomErasing as one compiled program; train_advanced.py:166-177 ran
these on 28 CPU workers) -> normalize -> pjit train step -> validation
with device-side metrics -> checkpoints / early stop.

Deviations from the reference, both documented in augment/policy.py:
RandomErasing erases pre-normalization, and the 256 resize center-crops
the long side (torchvision keeps full aspect until RandomCrop).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from ..augment.policy import train_time_chain
from ..config import Config
from ..data.loader import DataPipeline, shard_for_host
from ..data.manifest import class_counts, scan_augmented, stratified_split
from ..models.registry import build_model
from ..ops import augment as A
from ..ops import image as I
from ..utils.checkpoint import CheckpointManager
from .trainer import Trainer

log = logging.getLogger(__name__)


def _aug_dtype(cfg: Config):
    return (jnp.float32 if cfg.train_aug.aug_dtype == "float32"
            else jnp.bfloat16)


def make_prep_fn(cfg: Config, chain):
    """uint8 [B,S,S,3] -> augmented ImageNet-normalized float32 — meant
    to run INSIDE the compiled train step (Trainer batch_prep), fusing
    augmentation with forward/backward.  The chain computes in
    ``train_aug.aug_dtype`` (bf16 default: half the aug HBM/VPU traffic,
    BENCH_NOTES.md round 2); normalization and the output stay f32."""
    dtype = _aug_dtype(cfg)

    def prep(key, batch_u8):
        x = I.to_float(batch_u8).astype(dtype)
        x = A.apply_chain(key, x, chain)
        return I.normalize(x.astype(jnp.float32))

    return prep


def _train_chain(cfg: Config, *, crop: bool = True):
    """The torchvision train-time chain from TrainAugConfig — single
    source of truth for every path that builds it."""
    ta = cfg.train_aug
    # ta.resize_to sizes the DATA LAYER's decode (the chain itself never
    # resizes — RandomCrop's 256->224 jitter comes from the loader
    # decoding at resize_to)
    return train_time_chain(
        crop_size=ta.crop_size if crop else None,
        hflip_prob=ta.hflip_prob, color_jitter=ta.color_jitter,
        rotation_deg=ta.rotation_deg,
        random_erase_prob=ta.random_erase_prob)


def make_train_aug_fn(cfg: Config):
    """One compiled program: uint8 [B,256,256,3] -> augmented normalized
    float32 [B,224,224,3].  (Standalone variant of the fused
    ``make_prep_fn`` path, kept for direct library use.)"""
    return jax.jit(make_prep_fn(cfg, _train_chain(cfg)))


def make_eval_prep_fn():
    @jax.jit
    def run(batch_u8):
        return I.normalize(I.to_float(batch_u8)).astype(jnp.float32)

    return run


def _make_online_data(cfg: Config):
    """Online differential augmentation: raw store -> expanded severity
    groups -> per-batch on-device augment+normalize (train/online.py)."""
    from ..augment.policy import CHAINS
    from ..data.manifest import scan_raw
    from .online import OnlineAugmentedData

    records = scan_raw(cfg.augment.input_dir)
    if not records:
        raise FileNotFoundError(
            f"online augmentation: no images under {cfg.augment.input_dir}")
    records = shard_for_host(records)
    train_recs, val_recs = stratified_split(
        records, cfg.data.train_split, cfg.data.split_seed)

    data = OnlineAugmentedData(
        train_recs, live_mult=cfg.augment.live_augmentations,
        spoof_mult=cfg.augment.spoof_augmentations,
        batch_size=cfg.data.batch_size, img_size=cfg.data.img_size,
        num_workers=cfg.data.num_workers,
        prefetch_depth=cfg.data.prefetch_depth, seed=cfg.seed)

    # class weights must reflect the stream the loss actually sees — the
    # EXPANDED differential fan-out, not the raw store (live x9 / spoof x3
    # with the default multipliers)
    expanded = [r for rs in data.groups.values() for r in rs]
    counts = class_counts(expanded)

    ta = cfg.train_aug
    # originals get the train-time aug (sans crop: inputs are already
    # img_size) unless train_aug is disabled.  Severity copies get their
    # tier chain PLUS the same train-time ops: in the reference the
    # materialized _aug copies are re-randomized EVERY epoch by
    # get_transforms (train_advanced.py:166-177) on top of their frozen
    # tier warp, so tier-only online copies would see strictly less
    # per-epoch diversity than the reference store path.  (Remaining
    # deviation: the reference's Resize(256)->RandomCrop(224) position
    # jitter — online inputs are already img_size; the flip/jitter/
    # rotation/erase re-randomization is the dominant term.)  One fused
    # aug pass per batch either way, INSIDE the compiled train step
    # (Trainer batch_prep; one program per group).
    orig_chain = _train_chain(cfg, crop=False) if ta.enabled else []
    chains = {"orig": orig_chain}
    for g in ("heavy", "medium", "light"):
        chains[g] = CHAINS[g]() + orig_chain
    preps = {g: make_prep_fn(cfg, chain) for g, chain in chains.items()}

    def train_batches(epoch, skip=0):
        for g, batch in data.batches(epoch, skip=skip):
            yield {"image": batch["image"], "label": batch["label"],
                   "group": g}

    return train_batches, val_recs, data.steps_per_epoch, counts, preps


def _make_pool_data(cfg: Config, mesh=None):
    """Online differential augmentation with the original pool staged in
    device HBM (train/pool.py): decode the unique originals ONCE (via
    the shard cache when configured), device_put them, and feed the
    epoch as per-severity index streams — no per-step image upload.

    Same expansion/class-weight/chain semantics as ``_make_online_data``;
    the reference's 115k-image epoch (README.md:92-94) is this pool's
    live×9/spoof×3 index fan-out."""
    import numpy as np

    from ..augment.policy import CHAINS
    from ..data.manifest import scan_raw
    from .pool import DevicePoolData

    records = scan_raw(cfg.augment.input_dir)
    if not records:
        raise FileNotFoundError(
            f"online augmentation: no images under {cfg.augment.input_dir}")
    # Pool mode must NOT host-shard the records: the pool is staged
    # REPLICATED over the (global) mesh, so every process needs the
    # IDENTICAL image set in the identical order — per-host record
    # shards would stage differently-shaped "replicated" arrays and
    # diverge/deadlock the collective staging programs.  The per-host
    # data split happens on the INDEX streams instead
    # (Trainer._device_batch -> shard_batch assembles each host's rows).
    # Validation still STREAMS images host->device, so the val half
    # keeps the usual per-host shard.
    train_recs, val_recs = stratified_split(
        records, cfg.data.train_split, cfg.data.split_seed)
    val_recs = shard_for_host(val_recs)

    size = cfg.data.img_size
    if cfg.data.shard_cache:
        from ..data.shards import ShardStore
        cache_dir = f"{cfg.data.shard_cache}/pool"
        if jax.process_count() > 1:
            # same content per host, but per-host dirs avoid lock
            # contention when the cache path is on a shared filesystem
            cache_dir = f"{cache_dir}/host{jax.process_index()}"
        store = ShardStore.build(train_recs, cache_dir, img_size=size,
                                 resize="exact",
                                 num_workers=cfg.data.num_workers)
        images = store.gather(np.arange(len(store)))
        labels = store.labels
    else:
        from concurrent.futures import ThreadPoolExecutor

        from ..data.loader import decode_image
        with ThreadPoolExecutor(max(1, cfg.data.num_workers)) as pool:
            imgs = list(pool.map(
                lambda r: decode_image(r.path, size, "exact"), train_recs))
        images = np.stack(imgs)
        labels = np.asarray([r.label for r in train_recs], np.int32)

    lm, sm = (cfg.augment.live_augmentations,
              cfg.augment.spoof_augmentations)
    data = DevicePoolData(images, labels, live_mult=lm, spoof_mult=sm,
                          batch_size=cfg.data.batch_size, seed=cfg.seed,
                          mesh=mesh)
    # class weights over the EXPANDED stream, like _make_online_data
    n_live = int(np.sum(labels == 1))
    n_spoof = len(labels) - n_live
    counts = (n_spoof * (1 + sm), n_live * (1 + lm))

    ta = cfg.train_aug
    orig_chain = _train_chain(cfg, crop=False) if ta.enabled else []
    chains = {"orig": orig_chain}
    for g in ("heavy", "medium", "light"):
        chains[g] = CHAINS[g]() + orig_chain
    preps = {g: data.wrap_prep(make_prep_fn(cfg, chain))
             for g, chain in chains.items()}

    def train_batches(epoch, skip=0):
        return data.batches(epoch, skip=skip)

    return train_batches, val_recs, data.steps_per_epoch, counts, preps


def _run_training(cfg: Config, train_batches, val_recs, steps, counts,
                  mesh, max_steps_per_epoch, batch_prep=None):
    """Shared tail: val pipeline, model build, checkpoints, Trainer."""
    val_pipe = DataPipeline(
        val_recs, batch_size=cfg.data.eval_batch_size,
        img_size=cfg.data.img_size, resize="exact",
        num_workers=cfg.data.num_workers, drop_last=False)
    prep_fn = make_eval_prep_fn()

    def val_batches():
        for b in val_pipe.batches():
            yield {"image": prep_fn(jnp.asarray(b["image"])),
                   "label": b["label"]}

    if max_steps_per_epoch is not None:
        steps = min(steps, max_steps_per_epoch)
        inner = train_batches

        def train_batches(epoch, skip=0):             # noqa: F811
            budget = max(0, max_steps_per_epoch - skip)
            for i, item in enumerate(inner(epoch, skip=skip)):
                if i >= budget:
                    break
                yield item

    from ..models.registry import build_vit_from_config

    dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
             else jnp.float32)
    module = build_vit_from_config(cfg.model, dtype)
    variables = None
    if cfg.model.pretrained_path:
        # reuse the registry's weight-resolution path for the flagship
        _, variables = build_model(
            "Custom_ViT_FineTuned",
            checkpoint_path=cfg.model.pretrained_path,
            dropout=cfg.model.dropout, dtype=dtype)
        # the registry path loads the FLAGSHIP tree; a cfg.model with a
        # different geometry would otherwise die at the first train
        # step with a cryptic flax scope error (or silently train the
        # wrong architecture on subtly compatible trees)
        from ..models.registry import geometry_mismatches
        want = jax.eval_shape(
            module.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3),
                      jnp.float32))["params"]
        structure_err, mismatched = geometry_mismatches(
            want, variables["params"])
        if structure_err or mismatched:
            raise ValueError(
                "model.pretrained_path loads the flagship "
                "Custom_ViT_FineTuned architecture, but cfg.model "
                "describes a different parameter tree — drop the "
                "non-default model geometry or convert the checkpoint "
                "explicitly (models.convert)")

    if cfg.checkpoint.keep_best_by != "val_f1":
        # the Trainer records only {"val_f1", "epoch"} in its save
        # metrics — any other key ranks every checkpoint as a tie and
        # silently degrades best-by-metric retention to keep-latest
        log.warning(
            "checkpoint.keep_best_by=%r but Trainer saves record only "
            "val_f1 — best-k retention will treat all checkpoints as "
            "ties", cfg.checkpoint.keep_best_by)
    ckpt = CheckpointManager(
        cfg.checkpoint.save_dir,
        max_to_keep=cfg.checkpoint.max_to_keep,
        best_metric=cfg.checkpoint.keep_best_by,
        save_every_epochs=cfg.checkpoint.save_every_epochs,
        async_save=getattr(cfg.checkpoint, "async_save", False))

    trainer = Trainer(
        cfg, module,
        train_batches=train_batches, val_batches=val_batches,
        steps_per_epoch=steps,
        class_counts=counts,
        variables=variables,
        mesh=mesh, checkpoints=ckpt, batch_prep=batch_prep)
    start_epoch = 0
    start_batch = 0
    if getattr(cfg.checkpoint, "resume", False):
        latest = ckpt.latest_step()
        if latest is None:
            log.info("checkpoint.resume: no checkpoint in %s — fresh run",
                     cfg.checkpoint.save_dir)
        else:
            # full-state restore: params, optimizer moments, schedule
            # position, PRNG key.  The epoch loop resumes EXACTLY where
            # the step count says: completed epochs are skipped, and a
            # mid-epoch preemption checkpoint resumes at its batch
            # position within the epoch (the per-epoch shuffle is
            # seeded, so the remaining batches are exactly the ones the
            # uninterrupted run would have trained — no sample is seen
            # twice and the schedule horizon stays intact).
            trainer.state = ckpt.restore(trainer.state)
            step = int(trainer.state.step)
            start_epoch = min(step // max(steps, 1), cfg.optim.num_epochs)
            if start_epoch < cfg.optim.num_epochs:
                start_batch = step % max(steps, 1)
            log.info("resumed from step %d (%s) -> starting at epoch %d"
                     " batch %d", latest, cfg.checkpoint.save_dir,
                     start_epoch, start_batch)
    best = trainer.fit(start_epoch=start_epoch, start_batch=start_batch)
    log.info("training done: best %s", best)
    return best, trainer


def train_from_config(cfg: Config, *, mesh=None, records=None,
                      max_steps_per_epoch: Optional[int] = None):
    """Run the full training lifecycle; returns the best-metrics dict."""
    if cfg.augment.online:
        if cfg.augment.device_pool:
            if mesh is None:
                # the pool must stage REPLICATED over the same mesh the
                # Trainer will compile the step on — resolving the
                # config mesh only inside the Trainer would leave the
                # pool committed to one device and the mesh step
                # re-transferring (or rejecting) it every call
                from ..parallel import mesh_from_config
                mesh = mesh_from_config(cfg.sharding)
            (train_batches, val_recs, steps, counts,
             preps) = _make_pool_data(cfg, mesh=mesh)
        else:
            (train_batches, val_recs, steps, counts,
             preps) = _make_online_data(cfg)
        return _run_training(cfg, train_batches, val_recs, steps, counts,
                             mesh, max_steps_per_epoch, batch_prep=preps)
    if records is None:
        records = scan_augmented(cfg.data.data_root)
    if not records:
        raise FileNotFoundError(
            f"no images found under {cfg.data.data_root} "
            "(expected live/ and spoof/ subdirectories)")
    records = shard_for_host(records)
    counts = class_counts(records)
    log.info("dataset: %d images (spoof=%d live=%d)", len(records),
             counts[0], counts[1])

    train_recs, val_recs = stratified_split(
        records, cfg.data.train_split, cfg.data.split_seed)

    aug_on = cfg.train_aug.enabled
    size = cfg.train_aug.resize_to if aug_on else cfg.data.img_size
    resize = "shorter" if aug_on else "exact"

    if cfg.data.shard_cache:
        # decode once into the memmapped shard store; epochs gather from
        # memory (data/shards.py — the SURVEY §2.1 shard equivalent)
        from ..data.shards import ShardStore
        cache_dir = cfg.data.shard_cache
        if jax.process_count() > 1:
            # each host's record shard differs (shard_for_host above) —
            # a shared directory would alternate "stale" rebuilds and
            # clobber the store other hosts are actively memmapping
            cache_dir = f"{cache_dir}/host{jax.process_index()}"
        store = ShardStore.build(
            train_recs, cache_dir, img_size=size,
            resize=resize, num_workers=cfg.data.num_workers)
        steps = store.steps_per_epoch(cfg.data.batch_size,
                                      cfg.data.drop_last_train)

        def train_batches(epoch, skip=0):
            for b in store.batches(cfg.data.batch_size, epoch=epoch,
                                   shuffle=True, seed=cfg.seed,
                                   drop_last=cfg.data.drop_last_train,
                                   skip=skip):
                yield {"image": b["image"], "label": b["label"]}
    else:
        train_pipe = DataPipeline(
            train_recs, batch_size=cfg.data.batch_size,
            img_size=size, resize=resize,
            num_workers=cfg.data.num_workers,
            prefetch_depth=cfg.data.prefetch_depth,
            shuffle=True, drop_last=cfg.data.drop_last_train,
            seed=cfg.seed)
        steps = train_pipe.steps_per_epoch

        def train_batches(epoch, skip=0):                 # noqa: F811
            for b in train_pipe.batches(epoch, skip=skip):
                yield {"image": b["image"], "label": b["label"]}

    chain = _train_chain(cfg) if aug_on else []
    prep = make_prep_fn(cfg, chain)   # fused into the train step

    return _run_training(cfg, train_batches, val_recs, steps, counts,
                         mesh, max_steps_per_epoch, batch_prep=prep)
