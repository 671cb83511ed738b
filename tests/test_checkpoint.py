"""Checkpoint round-trips: native state, torch .pt interchange, golden files."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import checkpoint, configs, train
from desmo_tpu.models import desmo

REFERENCE = "/root/reference"


def test_native_state_roundtrip(tmp_path):
    spec = desmo.DesmoSpec(n=12, m=9, r=2, poly_order=2)
    params = desmo.init_params(spec)
    cfg = configs.get("cylinder")
    state = train.init_state(params, cfg)
    path = tmp_path / "state.npz"
    checkpoint.save_state(str(path), state)
    restored = checkpoint.load_state(str(path), train.init_state(params, cfg))
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(state),
        __import__("jax").tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_dict_conversion_roundtrip():
    rng = np.random.default_rng(0)
    spec = desmo.DesmoSpec(n=10, m=8, r=3, poly_order=2)
    params = {
        "phi": rng.standard_normal((3, 10)).astype(np.float32),
        "c": rng.standard_normal(10).astype(np.float32),
        "z": rng.standard_normal((10, 8)).astype(np.float32),
        "z_trig": rng.standard_normal((3, 3, 8)).astype(np.float32),
        "c_trig": rng.standard_normal((3, 3)).astype(np.float32),
        "omega": rng.standard_normal((3, 3)).astype(np.float32),
    }
    sd = checkpoint.state_dict_from_params(params)
    assert set(k.split(".")[0] for k in sd) == {
        "phi_list",
        "c_coef",
        "z_list",
        "zsin_list",
        "zcos_list",
        "ztanh_list",
        "sin_coef_list",
        "cos_coef_list",
        "tanh_coef_list",
        "omega_list",
    }
    back = checkpoint.params_from_state_dict(sd)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), params[k])


def test_pt_write_then_pure_read(tmp_path):
    rng = np.random.default_rng(1)
    sd = {
        "a": rng.standard_normal((4, 5)).astype(np.float32),
        "scalar": np.float32(3.25).reshape(()),
        "ints": np.arange(6, dtype=np.int64),
    }
    path = str(tmp_path / "x.pt")
    checkpoint.save_pt(path, sd)
    loaded = checkpoint.load_pt(path)
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], np.asarray(sd[k]))


def test_pt_write_torch_loads(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    sd = {"w": rng.standard_normal((3, 7)).astype(np.float32), "b": np.zeros(3, np.float32)}
    path = str(tmp_path / "t.pt")
    checkpoint.save_pt(path, sd)
    loaded = torch.load(path, weights_only=True)
    for k in sd:
        np.testing.assert_array_equal(loaded[k].numpy(), sd[k])


def test_pure_read_matches_torch_save(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "phi_list.0": torch.randn(11),
        "c_coef": torch.randn(6),
        "scalar": torch.tensor(2.5),
    }
    path = str(tmp_path / "ref.pt")
    torch.save(sd, path)
    loaded = checkpoint.load_pt(path)
    for k, v in sd.items():
        np.testing.assert_array_equal(loaded[k], v.numpy())


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference repo not mounted")
def test_golden_checkpoints_import():
    """Every shipped reference checkpoint must import into a valid pytree with
    the documented shapes (SURVEY §2.11) and agree with torch.load."""
    torch = pytest.importorskip("torch")
    pts = sorted(glob.glob(f"{REFERENCE}/**/*.pt", recursive=True))
    assert pts, "no shipped checkpoints found"
    for path in pts:
        sd_ours = checkpoint.load_pt(path)
        sd_torch = torch.load(path, map_location="cpu", weights_only=True)
        assert set(sd_ours) == set(sd_torch), path
        for k in sd_torch:
            np.testing.assert_array_equal(sd_ours[k], sd_torch[k].numpy(), err_msg=f"{path}:{k}")
        if "temporal_ae.encoder.0.weight" in sd_ours:
            continue  # AE checkpoint: different scheme, covered in test_ae
        variant = "fourier" if any(k.startswith("period_list") for k in sd_ours) else "desmo"
        params = checkpoint.params_from_state_dict(sd_ours, variant)
        r, n = params["phi"].shape
        T, m_or_coeffs = params["z"].shape
        assert params["z_trig"].shape == (3, r, m_or_coeffs)
        assert params["c"].shape == (T,)
        assert params["omega"].shape == (3, r)
        # exports back to the identical state_dict
        back = checkpoint.state_dict_from_params(params, variant)
        assert set(back) == set(sd_ours), path
        for k in back:
            got = np.asarray(back[k])
            # scalar coefficients are stored 0-d in the reference scheme
            if sd_ours[k].shape == () and got.shape == ():
                pass
            assert got.shape == sd_ours[k].shape or (
                k.startswith(("period_list", "trig_period_list")) and got.shape == sd_ours[k].shape
            ), f"{path}:{k}: {got.shape} vs {sd_ours[k].shape}"
            np.testing.assert_array_equal(got, sd_ours[k], err_msg=f"{path}:{k}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference repo not mounted")
def test_infer_spec_dims_from_shipped_checkpoints():
    """Read-and-infer flows size the model from the CHECKPOINT: the shipped
    SR checkpoint is r=2, P=2 while the cylinder training preset is r=4, P=3
    (regression: cmd_sr/evaluate used the preset dims and crashed on shape
    mismatch)."""
    from desmo_tpu import checkpoint as ck

    sr_pt = f"{REFERENCE}/DESMO-SR/cylinder_flow/DESMO_r2_final_2025-01-27_20-41-11.pt"
    assert ck.infer_spec_dims(ck.load_pt(sr_pt)) == (2, 2)
    cyl = glob.glob(f"{REFERENCE}/DESMO/cylinder_flow/DESMO_r4_final_*.pt")
    assert cyl and ck.infer_spec_dims(ck.load_pt(cyl[0])) == (4, 3)


def test_evaluate_with_mismatched_rank_checkpoint(tmp_path):
    """runner.evaluate overrides the preset (r, P) with the checkpoint's."""
    import dataclasses

    from desmo_tpu import checkpoint as ck, configs, runner
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo

    # save a tiny r=2/P=2 checkpoint, evaluate under an r=3/P=3 preset
    spec = desmo.DesmoSpec(50, 30, 2, 2, 1.0)
    params = desmo.init_params(spec)
    pt = str(tmp_path / "r2.pt")
    ck.save_pt(pt, ck.state_dict_from_params(params, "desmo"))
    cfg = configs.RunConfig(
        name="t", variant="desmo", n=50, m=30, r=3, poly_order=3,
        omega_init=1.0, num_epochs=10,
    )
    x = synthetic.separable_rank_k(50, 30, k=2, seed=0)
    out = runner.evaluate(cfg, x, pt, echo=False)
    assert np.isfinite(out["relative_error"])
