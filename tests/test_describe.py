"""`describe` CLI (cli/describe.py): format detection + reporting over
every artifact format the framework writes, with no device work."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.cli.describe import (describe_path,
                                                      main)
from vit_spoof_detection_pda_tpu.models import artifact as A
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof


def _tiny():
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16)
    return m, m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_describe_serving_artifact(tmp_path, capsys):
    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=4, img_size=32,
                            platforms=("cpu",), threshold=0.62,
                            temperature=1.8)
    info = describe_path(str(tmp_path / "art"), verify=True)
    assert info["kind"] == "serving_artifact"
    assert info["mode"] == "module" and info["batch_size"] == 4
    assert info["threshold"] == 0.62 and info["temperature"] == 1.8
    assert info["checksums_ok"] is True
    assert info["weight_leaves"] > 10 and info["weight_bytes"] > 10_000
    # weight census matches the actual leaf count/bytes
    leaves = jax.tree.leaves(variables)
    assert info["weight_leaves"] == len(leaves)
    assert info["weight_bytes"] == sum(
        np.asarray(x).nbytes for x in leaves)

    main([str(tmp_path / "art")])
    out = capsys.readouterr().out
    assert "threshold=0.62" in out and "temperature=1.8" in out

    # corrupt weights -> --verify reports and exits 2
    wf = tmp_path / "art" / "weights.npz"
    data = bytearray(wf.read_bytes())
    data[len(data) // 2] ^= 0xFF
    wf.write_bytes(bytes(data))
    assert describe_path(str(tmp_path / "art"),
                         verify=True)["checksums_ok"] is False
    with pytest.raises(SystemExit):
        main([str(tmp_path / "art"), "--verify"])

    # a MISSING checksummed file (truncated copy) reports corrupt too,
    # it does not crash
    wf.unlink()
    info = describe_path(str(tmp_path / "art"), verify=True)
    assert info["checksums_ok"] is False
    assert info["missing_files"] == ["weights.npz"]


def test_describe_orbax_and_torch(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from vit_spoof_detection_pda_tpu.models.convert import (
        save_torch_checkpoint)
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    m, variables = _tiny()
    state = create_train_state(m, make_optimizer(1e-3),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(3, state, metrics={"val_f1": 0.5, "epoch": 0,
                                       "optimal_threshold": 0.44})
    assert mgr.save(7, state, metrics={"val_f1": 0.8, "epoch": 1})
    mgr.close()

    info = describe_path(str(tmp_path / "ckpt"))
    assert info["kind"] == "orbax_checkpoint"
    assert info["latest_step"] == 7
    by_step = {r["step"]: r for r in info["steps"]}
    assert by_step[3]["optimal_threshold"] == 0.44
    assert by_step[7]["val_f1"] == 0.8

    pth = tmp_path / "export.pth"
    save_torch_checkpoint(str(pth), variables, epoch=4,
                          metrics={"val_f1": 0.9})
    tinfo = describe_path(str(pth))
    assert tinfo["kind"] == "torch_checkpoint"
    assert tinfo["epoch"] == 4 and tinfo["tensors"] > 10

    # --json emits one object per line; dispatcher knows the command
    main([str(tmp_path / "ckpt"), str(pth), "--json"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["kind"] == "orbax_checkpoint"
    assert json.loads(lines[1])["kind"] == "torch_checkpoint"

    with pytest.raises(SystemExit):
        main([str(tmp_path / "nowhere")])

    from vit_spoof_detection_pda_tpu.__main__ import COMMANDS
    assert "describe" in COMMANDS
