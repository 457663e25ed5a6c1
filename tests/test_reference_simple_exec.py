"""Execute the REFERENCE's SIMPLE-variant training code against this
framework.

``test_reference_train_exec.py`` proved the advanced loop
(train_advanced.py); this file closes the simple variant —
``/root/reference/simple/train.py`` imports UNMODIFIED (same
timm/torchvision/wandb shims) and its actual functions run against us:

- ``create_splits`` (simple/train.py:138-161): the persisted-split
  contract — membership AND order must equal our
  ``data.manifest.stratified_split`` (both drive sklearn's
  ``train_test_split(stratify, random_state=42)``), and the
  ``train_files.txt``/``val_files.txt`` side effect must parse back.
- ``train_epoch`` (:223-271): smoothed-CE + AdamW + the simple flavor
  of the no-warmup cosine quirk (T_max = total - warmup, stepped per
  BATCH from step 0, simple/train.py:428-430) vs our compiled
  ``make_train_step`` from the identical init/batches/hyperparameters —
  per-step loss parity and post-epoch per-leaf weight parity.
- ``validate`` (:273-331): returned loss/acc/f1/auc and the logged
  val/* block (incl. cm cells, specificity, npv) vs our eval step +
  float64 sklearn replica on identical inputs.

The simple model class is structurally identical to the advanced one
(same ``vit``/``classifier`` attributes, simple/train.py:185-202 vs
train_advanced.py:186-204), so our exported ``.pth`` strict-loads into
it unchanged — ``_build_pair`` is reused as-is.

Parity knobs as in the advanced file: dropout=0.0 (torch RNG not
replayable in XLA), mixed_precision=False (CPU), pretrained=False
(network-gated; weights come from our export instead).
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_train_exec import (GEOM, _build_pair, _make_batches,
                                       _timm_shim, _torch_loader,
                                       _torchvision_stub, _wandb_shim)

REF_SIMPLE = "/root/reference/simple/train.py"


@pytest.fixture
def ref_simple(tmp_path, monkeypatch):
    """Import /root/reference/simple/train.py with timm / torchvision /
    wandb shimmed; cwd moved so its txt-file side effects land in tmp."""
    monkeypatch.chdir(tmp_path)
    tv, tf = _torchvision_stub()
    monkeypatch.setitem(sys.modules, "timm", _timm_shim())
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tf)
    monkeypatch.setitem(sys.modules, "wandb", _wandb_shim())
    spec = importlib.util.spec_from_file_location("reference_simple",
                                                  REF_SIMPLE)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def _simple_cfg(ref_simple, *, num_epochs=5):
    # num_epochs must exceed warmup_epochs(=3): T_max = total - warmup
    # goes negative on shorter runs (a config the reference never runs)
    cfg = ref_simple.Config()
    cfg.device = "cpu"
    cfg.mixed_precision = False
    cfg.pretrained = False
    cfg.dropout = 0.0
    cfg.num_epochs = num_epochs
    cfg.log_interval = 1
    return cfg


def test_reference_simple_split_parity(ref_simple, tmp_path):
    """ref.create_splits == our stratified_split on the same file list
    (element-for-element, order included), and its txt side effect
    parses back to the same split."""
    from vit_spoof_detection_pda_tpu.data.manifest import (Record,
                                                           stratified_split)

    rng = np.random.default_rng(5)
    file_list = [{"path": f"subj{i % 7}/{'live' if l else 'spoof'}/"
                          f"im{i}.png", "label": int(l)}
                 for i, l in enumerate(rng.integers(0, 2, 80))]

    train_l, val_l = ref_simple.create_splits(file_list, train_split=0.85,
                                              val_split=0.15, seed=42)

    records = [Record(path=d["path"], label=d["label"]) for d in file_list]
    ours_tr, ours_va = stratified_split(records, 0.85, 42)

    assert [r.path for r in ours_tr] == [d["path"] for d in train_l]
    assert [r.path for r in ours_va] == [d["path"] for d in val_l]
    assert [r.label for r in ours_va] == [d["label"] for d in val_l]

    # the persisted-split side effect (simple/train.py:148-156)
    lines = (tmp_path / "val_files.txt").read_text().splitlines()
    assert lines == [f"{r.path}\t{r.label}" for r in ours_va]
    lines = (tmp_path / "train_files.txt").read_text().splitlines()
    assert lines == [f"{r.path}\t{r.label}" for r in ours_tr]


def _simple_optim(ref_simple, model, cfg, steps_per_epoch):
    """The simple variant's optimizer/scheduler/scaler construction,
    verbatim hyperparameters (simple/train.py:424-432)."""
    import torch.nn as nn
    from torch.cuda.amp import GradScaler

    criterion = nn.CrossEntropyLoss(label_smoothing=cfg.label_smoothing)
    optimizer = torch.optim.AdamW(model.parameters(), lr=cfg.learning_rate,
                                  weight_decay=cfg.weight_decay,
                                  betas=(0.9, 0.999))
    total = steps_per_epoch * cfg.num_epochs
    warmup = int(total * cfg.warmup_epochs / cfg.num_epochs)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=total - warmup, eta_min=cfg.min_lr)
    scaler = GradScaler(enabled=cfg.mixed_precision)
    return criterion, optimizer, scheduler, scaler, total, warmup


@pytest.mark.slow
def test_reference_simple_train_epoch_parity(ref_simple, tmp_path):
    """ref.train_epoch (simple/train.py:223-271; smoothed CE, per-batch
    scheduler steps) and our compiled make_train_step train the SAME
    init on the SAME batches: per-step losses and post-epoch weights
    agree at f32 tolerance (rationale: test_reference_train_exec)."""
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models import convert
    from vit_spoof_detection_pda_tpu.ops.losses import make_loss_fn
    from vit_spoof_detection_pda_tpu.train.schedule import make_lr_schedule
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.train.step import make_train_step

    batches = _make_batches(5, 4)
    cfg = _simple_cfg(ref_simple)
    module, variables, model = _build_pair(ref_simple, cfg, tmp_path)

    criterion, optimizer, scheduler, scaler, total, warmup = _simple_optim(
        ref_simple, model, cfg, len(batches))
    wandb = sys.modules["wandb"]
    wandb.logged.clear()
    ref_avg_loss, ref_avg_acc, global_step = ref_simple.train_epoch(
        model, _torch_loader(batches), criterion, optimizer, scheduler,
        scaler, cfg, epoch=0, global_step=0)
    assert global_step == len(batches)
    ref_losses = [d["train/loss"] for d in wandb.logged
                  if "train/loss" in d]
    assert len(ref_losses) == len(batches)

    sched = make_lr_schedule(cfg.learning_rate, total, warmup,
                             min_lr=cfg.min_lr)
    tx = make_optimizer(sched, weight_decay=cfg.weight_decay,
                        max_grad_norm=cfg.max_grad_norm)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               variables=variables)
    step_fn = make_train_step(
        make_loss_fn("ce", label_smoothing=cfg.label_smoothing),
        donate=False)
    our_losses, our_accs = [], []
    for x, y in batches:
        state, m = step_fn(state, {"image": jnp.asarray(x),
                                   "label": jnp.asarray(y)})
        our_losses.append(float(m["loss"]))
        our_accs.append(float(m["accuracy"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.mean(our_losses), ref_avg_loss,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.mean(our_accs), ref_avg_acc, atol=1e-9)

    got = convert.antispoof_from_torch(model.state_dict(),
                                       depth=GEOM["depth"])["params"]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    flat_want = dict(
        jax.tree_util.tree_flatten_with_path(state.params)[0])
    assert flat_got.keys() == flat_want.keys()
    for path in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_want[path]), np.asarray(flat_got[path]),
            rtol=2e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_reference_simple_validate_parity(ref_simple, tmp_path):
    """ref.validate (simple/train.py:273-331) scores the same weights and
    batches as our eval step + float64 replica: the four returned values
    and the logged val/* block (cm cells, specificity, npv) agree."""
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.metrics import parity
    from vit_spoof_detection_pda_tpu.ops.losses import make_loss_fn
    from vit_spoof_detection_pda_tpu.train.step import make_eval_step

    val_batches = _make_batches(3, 8, seed=23)
    cfg = _simple_cfg(ref_simple)
    module, variables, model = _build_pair(ref_simple, cfg, tmp_path,
                                           seed=29)
    criterion = torch.nn.CrossEntropyLoss(
        label_smoothing=cfg.label_smoothing)

    wandb = sys.modules["wandb"]
    wandb.logged.clear()
    ref_loss, ref_acc, ref_f1, ref_auc = ref_simple.validate(
        model, _torch_loader(val_batches), criterion, cfg, epoch=0,
        phase="val")

    loss_fn = make_loss_fn("ce", label_smoothing=cfg.label_smoothing)
    eval_fn = make_eval_step(module.apply)
    losses, probs, labels = [], [], []
    for x, y in val_batches:
        out = eval_fn(variables["params"], None, jnp.asarray(x))
        losses.append(float(loss_fn(out["logits"], jnp.asarray(y))))
        probs.append(np.asarray(out["score"], np.float64))
        labels.append(y)
    probs = np.concatenate(probs)
    labels = np.concatenate(labels)
    preds = (probs >= 0.5).astype(np.int64)   # argmax == p1 >= 0.5 for 2 cls

    np.testing.assert_allclose(np.mean(losses), ref_loss, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(parity.np_roc_auc_score(labels, probs),
                               ref_auc, rtol=0, atol=1e-6)
    want, _ = parity.calculate_metrics(labels.astype(np.int64), preds,
                                       probs)
    np.testing.assert_allclose(want["accuracy"], ref_acc, atol=1e-6)
    np.testing.assert_allclose(want["f1_score"], ref_f1, atol=1e-6)

    # the logged val/* block (simple/train.py:311-329): cm cells +
    # specificity/npv, which the advanced flavor does not emit
    block = next(d for d in wandb.logged if "val/accuracy" in d)
    for ref_key, our_key in (("accuracy", "accuracy"),
                             ("precision", "precision"),
                             ("recall", "recall"), ("f1", "f1_score"),
                             ("auc", "auc"), ("tp", "tp"), ("tn", "tn"),
                             ("fp", "fp"), ("fn", "fn")):
        assert f"val/{ref_key}" in block, ref_key
        np.testing.assert_allclose(want[our_key], block[f"val/{ref_key}"],
                                   rtol=0, atol=1e-6, err_msg=ref_key)
    tn, fp, fn = want["tn"], want["fp"], want["fn"]
    np.testing.assert_allclose(block["val/specificity"],
                               tn / (tn + fp) if tn + fp else 0,
                               atol=1e-9)
    np.testing.assert_allclose(block["val/npv"],
                               tn / (tn + fn) if tn + fn else 0,
                               atol=1e-9)


@pytest.fixture
def ref_simple_test(tmp_path, monkeypatch):
    """Import /root/reference/simple/test.py with the same shims; cwd
    moved so its timestamped log file lands in tmp."""
    monkeypatch.chdir(tmp_path)
    tv, tf = _torchvision_stub()
    monkeypatch.setitem(sys.modules, "timm", _timm_shim())
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tf)
    spec = importlib.util.spec_from_file_location(
        "reference_simple_test", "/root/reference/simple/test.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def test_reference_simple_test_stack_scores_our_export(ref_simple_test,
                                                       tmp_path):
    """simple/test.py's load_checkpoint (:167-189) + test_model
    (:192-222) + calculate_metrics (:223-280) run on OUR exported
    ``.pth``: per-image score parity with our eval step, every metric
    equal to our float64 replica on the identical vectors."""
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.metrics import parity
    from vit_spoof_detection_pda_tpu.models import convert
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.train.step import make_eval_step

    module = ViTAntiSpoof(dropout=0.0, **GEOM)
    variables = module.init(jax.random.PRNGKey(31),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    pth = tmp_path / "export.pth"
    convert.save_torch_checkpoint(str(pth), variables, epoch=3)

    cfg = ref_simple_test.TestConfig()
    cfg.device = "cpu"
    cfg.mixed_precision = False
    cfg.dropout = 0.0
    model = ref_simple_test.ViTFaceAntiSpoofing(cfg).to("cpu")
    model, ckpt = ref_simple_test.load_checkpoint(str(pth), model, "cpu")
    assert ckpt["epoch"] == 3

    batches = _make_batches(3, 8, seed=41)
    loader = [(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
               torch.from_numpy(y),
               torch.arange(i * 8, i * 8 + 8))
              for i, (x, y) in enumerate(batches)]
    preds, labels, probs, indices = ref_simple_test.test_model(
        model, loader, cfg)
    np.testing.assert_array_equal(indices, np.arange(24))

    eval_fn = make_eval_step(module.apply)
    ours = np.concatenate([np.asarray(
        eval_fn(variables["params"], None, jnp.asarray(x))["score"],
        np.float64) for x, _ in batches])
    np.testing.assert_allclose(ours, probs, rtol=0, atol=1e-5)

    ref_metrics, ref_cm = ref_simple_test.calculate_metrics(
        labels, preds, probs)
    want, want_cm = parity.calculate_metrics(
        labels.astype(np.int64), (ours >= 0.5).astype(np.int64), ours)
    np.testing.assert_array_equal(want_cm, ref_cm)
    for key in ("accuracy", "precision", "recall", "f1_score", "auc",
                "specificity", "npv", "ppv", "far", "frr", "eer",
                "tp", "tn", "fp", "fn", "total_samples", "live_samples",
                "spoof_samples"):
        np.testing.assert_allclose(want[key], ref_metrics[key],
                                   rtol=0, atol=1e-6, err_msg=key)
