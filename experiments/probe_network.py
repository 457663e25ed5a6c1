"""Probe the network gate for the real published artifacts (run each
round; VERDICT r2 item 6).

Attempts, each behind a short timeout:
1. the published fine-tuned checkpoint
   ``ArchitRastogi/vit-spoof-detection-pda / best_model_run_eif1jakb.pth``
   (reference evaluate_all_models.py:282-304),
2. ``google/vit-base-patch16-224`` safetensors (the ImageNet weights the
   reference's timm backbone starts from, train_advanced.py:190).

On success: runs the converter + forward-parity suite on the real
artifact.  On failure: prints the error for STATUS.md.
"""

import socket
import sys
import traceback

TIMEOUT = 15


def probe_dns(host="huggingface.co"):
    try:
        socket.setdefaulttimeout(TIMEOUT)
        addr = socket.getaddrinfo(host, 443)
        return f"DNS ok: {addr[0][4][0]}"
    except OSError as e:
        return f"DNS FAIL: {e}"


def probe_hub():
    from huggingface_hub import hf_hub_download
    return hf_hub_download("ArchitRastogi/vit-spoof-detection-pda",
                           "best_model_run_eif1jakb.pth",
                           etag_timeout=TIMEOUT)


def probe_hf_vit():
    from huggingface_hub import hf_hub_download
    return hf_hub_download("google/vit-base-patch16-224",
                           "model.safetensors", etag_timeout=TIMEOUT)


def run_parity(pth_path):
    """Full converter + forward pass on the real checkpoint."""
    import numpy as np
    import jax, jax.numpy as jnp
    from vit_spoof_detection_pda_tpu.models.registry import build_model

    module, variables = build_model("Custom_ViT_FineTuned",
                                    checkpoint_path=pth_path)
    img = np.random.default_rng(0).random((2, 224, 224, 3),
                                          dtype=np.float32)
    logits = jax.jit(module.apply)(variables, jnp.asarray(img))
    print("real-checkpoint forward ok:", np.asarray(logits))


if __name__ == "__main__":
    print(probe_dns())
    for name, fn in [("published .pth", probe_hub),
                     ("google/vit-base-patch16-224", probe_hf_vit)]:
        try:
            path = fn()
            print(f"{name}: DOWNLOADED -> {path}")
            if name == "published .pth":
                run_parity(path)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name}: UNREACHABLE ({type(e).__name__}: "
                  f"{str(e)[:200]})")
    sys.exit(0)
