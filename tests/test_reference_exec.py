"""Execute the REFERENCE's own evaluation code against this framework's
exported checkpoints.

Everything else in the suite proves interop against torch replicas we
wrote; this file imports ``/root/reference/test.py`` itself and runs its
actual ``load_checkpoint`` (strict ``load_state_dict``), ``test_model``
(autocast + softmax inference loop) and ``calculate_metrics`` (sklearn)
functions on a ``.pth`` we exported — the strongest fidelity proof
available without network access.

The only parts shimmed are third-party libraries absent from this image:

- ``timm``: ``create_model("vit_base_patch16_224", num_classes=0)`` is
  answered with the hand-built torch replica of timm's module tree from
  ``test_weight_fidelity`` (state-dict keys proven identical there), so
  the reference's strict ``load_state_dict`` still checks every key.
- ``torchvision.transforms``: ``Resize/ToTensor/Normalize/Compose`` with
  torchvision's documented semantics (test images are written at the
  target size, so ``Resize`` is an identity and no resampling-kernel
  question enters the comparison).

The reference module code runs UNMODIFIED.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image

from test_weight_fidelity import _TorchTimmViT

REF_TEST = "/root/reference/test.py"


# --------------------------------------------------------------------------
# third-party shims (NOT reference code — stand-ins for absent libraries)
# --------------------------------------------------------------------------


def _timm_shim():
    mod = types.ModuleType("timm")

    def create_model(name, pretrained=False, num_classes=0, **kw):
        assert name == "vit_base_patch16_224", name
        assert num_classes == 0 and not pretrained
        return _TorchTimmViT()

    mod.create_model = create_model
    return mod


def _torchvision_shim():
    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")

    class Resize:
        def __init__(self, size, **kw):
            self.size = size if isinstance(size, (tuple, list)) \
                else (size, size)

        def __call__(self, img):
            if img.size == (self.size[1], self.size[0]):
                return img
            return img.resize((self.size[1], self.size[0]),
                              Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, x):
            for op in self.ops:
                x = op(x)
            return x

    for cls in (Resize, ToTensor, Normalize, Compose):
        setattr(tf, cls.__name__, cls)
    tv.transforms = tf
    return tv, tf


@pytest.fixture
def reference_test_module(tmp_path, monkeypatch):
    """Import /root/reference/test.py with the two absent third-party
    libraries shimmed; cwd moved so its module-level log file lands in
    tmp.  The shims are removed from sys.modules afterwards."""
    monkeypatch.chdir(tmp_path)
    tv, tf = _torchvision_shim()
    monkeypatch.setitem(sys.modules, "timm", _timm_shim())
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tf)
    spec = importlib.util.spec_from_file_location("reference_test", REF_TEST)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def _make_test_split(root, *, subjects=2, per_class=3, size=224, seed=5):
    """Reference test-split layout: <root>/<subject>/{live,spoof}/*.png,
    written at the eval size so no resampling happens in either stack."""
    rng = np.random.default_rng(seed)
    for s in range(subjects):
        for cls in ("live", "spoof"):
            d = root / f"subject_{s:03d}" / cls
            d.mkdir(parents=True)
            for i in range(per_class):
                arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i:02d}.png")


@pytest.mark.slow
def test_reference_stack_scores_our_export(reference_test_module, tmp_path):
    """Train-side export -> the reference's load_checkpoint/test_model
    score it -> per-image equality with our eval on the same images, and
    its calculate_metrics agrees with our float64 replica on identical
    inputs (reference test.py:167-280)."""
    ref = reference_test_module
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.data import scan_test
    from vit_spoof_detection_pda_tpu.eval.runner import run_inference
    from vit_spoof_detection_pda_tpu.metrics import parity
    from vit_spoof_detection_pda_tpu.models import convert
    from vit_spoof_detection_pda_tpu.models.registry import build_model

    root = tmp_path / "test_split"
    _make_test_split(root)

    # --- our side: build + export a reference-format checkpoint ---------
    module, variables = build_model("Custom_ViT_FineTuned", seed=11)
    pth = tmp_path / "exported.pth"
    convert.save_torch_checkpoint(
        str(pth), variables, epoch=3, metrics={"val_f1": 0.5},
        config={"model_name": "vit_base_patch16_224"})

    records = scan_test(str(root))
    ours = run_inference(module, variables, records,
                         batch_size=4, img_size=224, num_workers=2)
    our_prob = {r.path: p for r, p in zip(records, ours["prob1"])}

    # --- reference side: its own functions, end to end ------------------
    cfg = ref.TestConfig()
    cfg.device = "cpu"
    cfg.mixed_precision = False
    cfg.checkpoint_path = str(pth)
    model = ref.ViTFaceAntiSpoofing(cfg).to("cpu")
    model, ckpt = ref.load_checkpoint(str(pth), model, "cpu")  # strict
    assert ckpt["epoch"] == 3

    ds = ref.TestDataset(str(root), transform=ref.get_test_transforms(224))
    assert len(ds) == len(records)
    loader = ref.DataLoader(ds, batch_size=4, shuffle=False, num_workers=0)
    preds, labels, probs, indices = ref.test_model(model, loader, cfg)

    # --- per-image score parity (reference torch vs our jax) ------------
    assert len(probs) == len(records)
    for pos, idx in enumerate(indices):
        path = ds.samples[int(idx)]
        assert abs(float(probs[pos]) - float(our_prob[path])) < 1e-5, path
        assert int(labels[pos]) == ds.labels[int(idx)]

    # --- metric parity on IDENTICAL inputs ------------------------------
    # (feed OUR arrays through the reference's sklearn-based
    # calculate_metrics and through our float64 replica: equality must be
    # bitwise-ish, proving the metrics engine against reference-executed
    # code rather than against our own reading of it)
    y_true = ours["labels"].astype(np.int64)
    y_pred = ours["pred"].astype(np.int64)
    y_prob = ours["prob1"].astype(np.float64)
    want, want_cm = ref.calculate_metrics(y_true, y_pred, y_prob)
    got, got_cm = parity.calculate_metrics(y_true, y_pred, y_prob)
    np.testing.assert_array_equal(np.asarray(got_cm), np.asarray(want_cm))
    for key, wv in want.items():
        assert key in got, key
        np.testing.assert_allclose(got[key], wv, rtol=0, atol=1e-12,
                                   err_msg=key)

    # and the reference's own run on its own arrays matches our metrics
    # run on ours (same images, same checkpoint => same predictions)
    ref_metrics, _ = ref.calculate_metrics(labels, preds, probs)
    assert ref_metrics["accuracy"] == got["accuracy"]
    assert ref_metrics["tp"] == got["tp"] and ref_metrics["tn"] == got["tn"]
