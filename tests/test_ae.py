"""Autoencoder-latent variant: oracle checks, golden checkpoint import, training."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import checkpoint, configs, train
from desmo_tpu.models import autoencoder as ae
from desmo_tpu.models import desmo
from oracles import pool_data_oracle

REFERENCE = "/root/reference"


def small_spec(n=40, m=32):
    return ae.AESpec(n=n, m=m, r=2, poly_order=2)


def test_init_shapes_and_param_count():
    spec = ae.AESpec(n=3961, m=1001, r=2, poly_order=2)
    params = ae.init_params(spec)
    # reference prints "Total number of parameters in Dual AE" in its log;
    # encoder+decoder mirror widths (1001->256->...->2 and back)
    widths = (1001, 256, 128, 64, 16, 8, 4, 2)
    mlp = sum(a * b + b for a, b in zip(widths[:-1], widths[1:]))
    mlp += sum(a * b + b for a, b in zip(widths[::-1][:-1], widths[::-1][1:]))
    T = spec.num_poly_terms
    expected = mlp + T + T * 1001 + 6 * 1001 + 6 + 6
    assert desmo.count_params(params) == expected
    assert params["ae_enc_w0"].shape == (1001, 256)
    np.testing.assert_array_equal(
        np.asarray(params["omega"]), [[1e4, 1e4], [1e3, 1e3], [1e2, 1e2]]
    )


def test_forward_matches_oracle():
    """Given the encoder's latent, recon must follow the library contraction
    with tanh excluded."""
    rng = np.random.default_rng(0)
    spec = small_spec()
    params = ae.init_params(spec, seed=1)
    # randomize library params so the check is nontrivial
    for k in ("c", "z", "z_trig", "c_trig"):
        params[k] = jnp.asarray(rng.standard_normal(params[k].shape), jnp.float32)
    params["omega"] = jnp.asarray(rng.uniform(0.5, 2.0, (3, 2)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)

    recon, latent, z, ae_rec = ae.apply(params, x, spec)
    latent_o = np.asarray(latent, np.float64)
    pp = {k: np.asarray(v, np.float64) for k, v in params.items()}
    theta = pool_data_oracle(latent_o, 2, 2)
    recon_o = (pp["c"][None, :] * theta) @ pp["z"]
    funcs = [np.sin, np.cos]
    for i in range(2):
        for k in range(2):  # tanh (k=2) excluded
            spatial = funcs[k](pp["omega"][k, i] * latent_o[:, i])
            recon_o += pp["c_trig"][k, i] * np.outer(spatial, pp["z_trig"][k, i])
    np.testing.assert_allclose(np.asarray(recon), recon_o, rtol=1e-3, atol=1e-4)


def test_ortho_and_l1_match_reference_formulas():
    rng = np.random.default_rng(1)
    latent = rng.standard_normal((30, 2)).astype(np.float32)
    got = float(ae.ae_orthogonality(jnp.asarray(latent)))
    outer = np.outer(latent[:, 0], latent[:, 1])
    expect = float(np.mean(outer**2))
    assert np.isclose(got, expect, rtol=1e-5)

    spec = small_spec()
    params = ae.init_params(spec)
    params["c_trig"] = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)
    got_l1 = float(ae.ae_sparsity_l1(params))
    ct = np.asarray(params["c_trig"])
    expect_l1 = float(np.abs(np.asarray(params["c"])).sum() + np.abs(ct[0]).sum() + np.abs(ct[1]).sum())
    assert np.isclose(got_l1, expect_l1, rtol=1e-6)


def test_tanh_receives_no_gradient():
    """Reference quirk: tanh terms are outside the sum and the L1, so their
    parameters must have exactly zero gradient."""
    rng = np.random.default_rng(2)
    spec = small_spec()
    params = ae.init_params(spec, seed=3)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    loss_fn = ae.build_loss(spec, 1e-3, 1e-6, 1e-3)
    g = jax.grad(lambda p: loss_fn(p, {"x": x})[0])(params)
    assert np.all(np.asarray(g["z_trig"][2]) == 0.0)
    assert np.all(np.asarray(g["c_trig"][2]) == 0.0)
    assert np.all(np.asarray(g["omega"][2]) == 0.0)
    # sin/cos do receive gradients
    assert np.any(np.asarray(g["z_trig"][0]) != 0.0)


def test_factored_ae_mse_matches_naive():
    """The factored AE-MSE (never materializes the (n, m) decode) must agree
    with the naive decode+MSE in value AND gradients — same objective, only
    the fp association differs."""
    rng = np.random.default_rng(7)
    spec = small_spec()
    params = ae.init_params_live(spec, seed=5)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    batch = {"x": x, "x_sq": jnp.sum(x * x), "x_colsum": jnp.sum(x, axis=0)}
    fac = ae.build_loss(spec, 1e-3, 1e-6, 1.0, method="factored")
    naive = ae.build_loss(spec, 1e-3, 1e-6, 1.0, method="naive")
    (tf, mf), gf = jax.value_and_grad(fac, has_aux=True)(params, batch)
    (tn, mn), gn = jax.value_and_grad(naive, has_aux=True)(params, {"x": x})
    np.testing.assert_allclose(float(mf["ae"]), float(mn["ae"]), rtol=1e-5)
    np.testing.assert_allclose(float(tf), float(tn), rtol=1e-5)
    for k in gf:
        scale = max(np.max(np.abs(np.asarray(gn[k]))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(gn[k]), rtol=5e-4, atol=5e-5 * scale, err_msg=k
        )
    # the batch helpers are optional — omitting them must not change values
    (tf2, _) = fac(params, {"x": x})
    np.testing.assert_allclose(float(tf2), float(tf), rtol=1e-6)


def test_ae_training_converges():
    rng = np.random.default_rng(3)
    n, m = 80, 48
    spec = ae.AESpec(n=n, m=m, r=2, poly_order=2)
    s = np.linspace(0, 2 * np.pi, n)
    t = np.linspace(0, 6 * np.pi, m)
    x = np.outer(np.sin(s), np.sin(t)) + 0.5 * np.outer(np.cos(2 * s), np.cos(2 * t))
    x = (x - x.mean(axis=1, keepdims=True)).astype(np.float32)
    cfg = configs.RunConfig(
        name="t",
        variant="ae",
        n=n,
        m=m,
        r=2,
        poly_order=2,
        beta=1e-3,
        l1_lambda=1e-6,
        ae_beta=1e-3,
        lr_omega=1e-2,
        num_epochs=2500,
        patience=600,
        sched_every=1,
        log_every=1000,
        checkpoint_every=10_000,
    )
    params = ae.init_params(spec, seed=43)
    # O(1) data: huge omega inits are the reference's choice for its data; for
    # this synthetic check keep frequencies tame
    params["omega"] = jnp.asarray([[1.0, 1.0], [1.0, 1.0], [1.0, 1.0]], jnp.float32)
    loss_fn = ae.build_loss(spec, cfg.beta, cfg.l1_lambda, cfg.ae_beta)
    res = train.fit(
        loss_fn, ae.param_groups(params), cfg, params, {"x": jnp.asarray(x)},
        log=None, chunk_size=500,
    )
    assert res.history["rec"][-1] < res.history["rec"][0] * 0.05


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference repo not mounted")
def test_golden_ae_checkpoint_roundtrip():
    paths = [
        p
        for p in glob.glob(f"{REFERENCE}/DESMO_AE/**/*.pt", recursive=True)
    ]
    if not paths:
        pytest.skip("no AE checkpoint shipped")
    sd = checkpoint.load_pt(paths[0])
    m = sd["temporal_ae.encoder.0.weight"].shape[1]
    n = None  # not recorded in the checkpoint
    spec = ae.AESpec(n=1, m=m, r=2, poly_order=2)
    params = ae.params_from_state_dict(sd)
    assert params["z"].shape[1] == m
    back = ae.state_dict_from_params(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(back[k]).reshape(np.asarray(sd[k]).shape), sd[k], err_msg=k
        )


def test_data_scaled_omega_recipe():
    """The convergence recipe keeps the reference's 1:0.1:0.01 channel ratio
    and normalizes the sin arg scale to the initial latent RMS, so
    omega * latent starts O(1) regardless of data units."""
    spec = small_spec()
    params = ae.init_params(spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    om = ae.data_scaled_omega(params, x)
    assert om.shape == (3, spec.r)
    np.testing.assert_allclose(np.asarray(om[1] / om[0]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(om[2] / om[0]), 0.01, rtol=1e-6)
    latent, _ = ae.encode_decode(params, x)
    rms = np.sqrt(np.mean(np.asarray(latent) ** 2, axis=0))
    np.testing.assert_allclose(np.asarray(om[0]) * rms, 1.0, rtol=1e-5)
    # scale invariance: 100x data -> args unchanged (omega shrinks to match)
    om2 = ae.data_scaled_omega(params, 100.0 * x)
    latent2, _ = ae.encode_decode(params, 100.0 * x)
    rms2 = np.sqrt(np.mean(np.asarray(latent2) ** 2, axis=0))
    np.testing.assert_allclose(np.asarray(om2[0]) * rms2, 1.0, rtol=1e-5)


def test_live_init_has_gradient_flow():
    """Regression for the dead-funnel pathology: at the reference's
    Xavier/zero-bias init the decoder funnel can output exactly zero for
    every input, making the gradient of the AE reconstruction w.r.t. every
    MLP weight exactly 0.0 (docs/RESULTS.md "AE convergence"). The recipe's
    live init must keep gradients nonzero everywhere and latents varying
    across points."""
    spec = small_spec(n=96, m=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    params = ae.init_params_live(spec, seed=43)
    # library params untouched by the live init
    ref = ae.init_params(spec, seed=43)
    for k in ("c", "z", "z_trig", "c_trig", "omega"):
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(ref[k]))

    def ae_loss(p):
        _lat, rec = ae.encode_decode(p, x)
        return jnp.mean((rec - x) ** 2)

    g = jax.grad(ae_loss)(params)
    for k in params:
        if k.startswith("ae_") and k.endswith(tuple("0123456")) and "_w" in k:
            assert float(jnp.max(jnp.abs(g[k]))) > 0.0, f"dead gradient at {k}"
    lat, _ = ae.encode_decode(params, x)
    assert np.all(np.asarray(lat).std(axis=0) > 1e-3), "latents spatially constant"


def test_warmup_loss_is_pure_ae_mse():
    spec = small_spec()
    params = ae.init_params_live(spec, seed=43)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    loss_fn = ae.build_warmup_loss(spec)
    total, mets = loss_fn(params, {"x": x})
    _lat, rec = ae.encode_decode(params, x)
    np.testing.assert_allclose(float(total), float(jnp.mean((rec - x) ** 2)), rtol=1e-6)
    assert set(mets) == {"rec", "ortho", "l1", "ae"}
    # dictionary params get no gradient during warmup (frozen by construction)
    g = jax.grad(lambda p: loss_fn(p, {"x": x})[0])(params)
    assert float(jnp.max(jnp.abs(g["z"]))) == 0.0
    assert float(jnp.max(jnp.abs(g["omega"]))) == 0.0
