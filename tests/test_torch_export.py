"""flax -> reference-torch checkpoint export (models/torch_export.py).

Each exporter must be the exact inverse of the matching importer: feeding a
reference-named torch state_dict through import -> export reproduces it
key-for-key, value-for-value, so TPU-pretrained weights can return to the
reference's PyTorch downstream stack unchanged.
"""
import numpy as np
import torch

from audiossl_tpu.models.torch_export import (
    ast_to_torch,
    audiontt_to_torch,
    mast_to_torch,
)
from audiossl_tpu.models.torch_import import (
    ast_from_torch,
    audiontt_from_torch,
    mast_from_torch,
)
from tests.test_torch_import import _tiny_mast_cfg, _torch_ast, _torch_audiontt, _torch_mvit

RNG = np.random.default_rng(13)


def _assert_state_dicts_equal(got: dict, want: dict):
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))} extra={sorted(set(got) - set(want))}"
    )
    for k in want:
        w = want[k].numpy() if isinstance(want[k], torch.Tensor) else np.asarray(want[k])
        if "num_batches_tracked" in k:
            continue  # counter, not a weight
        np.testing.assert_allclose(np.asarray(got[k]), w, atol=0, err_msg=k)


def test_audiontt_roundtrip_is_identity():
    sd = _torch_audiontt(64, 32).state_dict()
    _assert_state_dicts_equal(audiontt_to_torch(audiontt_from_torch(sd)), sd)


def test_ast_roundtrip_is_identity():
    f, t = 4, 6  # rectangular grid exercises the freq-major <-> time-major flip
    tm = _torch_ast(d=32, heads=4, depth=2, in_chans=1)(n_tokens=f * t).eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    imported = ast_from_torch(sd, num_heads=4, src_grid_ft=(f, t))
    _assert_state_dicts_equal(ast_to_torch(imported, dst_grid_ft=(f, t)), sd)


def test_mast_roundtrip_is_identity():
    tm = _torch_mvit(_tiny_mast_cfg(), grid_ft=(4, 6))
    sd = tm.state_dict()
    imported = mast_from_torch(sd)
    _assert_state_dicts_equal(mast_to_torch(imported), sd)


def test_load_raw_across_device_counts(tmp_path):
    """A checkpoint saved on this 8-device mesh must open in a 1-device
    process (pod checkpoint -> single-chip export/serving job): load_raw
    falls back to metadata-shaped, locally-sharded restore."""
    import os
    import subprocess
    import sys

    from audiossl_tpu.train.checkpoint import save_encoder_only

    sd = _torch_audiontt(64, 32).state_dict()
    variables = audiontt_from_torch(sd)
    ckpt_dir = os.path.join(tmp_path, "run_chkp")
    save_encoder_only(ckpt_dir, 3, variables)

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert jax.device_count() == 1, jax.device_count()\n"
         f"from audiossl_tpu.train.checkpoint import load_raw\n"
         f"v = load_raw({str(ckpt_dir)!r}, 3)\n"
         "print('OK', v['params']['Dense_0']['kernel'].shape)"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK (512, 32)" in out.stdout


def test_cli_writes_loadable_pth(tmp_path):
    """orbax encoder checkpoint -> torch_export CLI -> torch.load round."""
    import os

    from audiossl_tpu.models.torch_export import main
    from audiossl_tpu.train.checkpoint import save_encoder_only

    sd = _torch_audiontt(64, 32).state_dict()
    variables = audiontt_from_torch(sd)
    ckpt_dir = os.path.join(tmp_path, "run_chkp")
    save_encoder_only(ckpt_dir, 5, variables)
    out = os.path.join(tmp_path, "encoder.pth")
    main(["--checkpoint", ckpt_dir, "--arch", "audiontt", "--out", out])
    loaded = torch.load(out, map_location="cpu", weights_only=True)
    _assert_state_dicts_equal({k: v.numpy() for k, v in loaded.items()}, sd)
