"""Pallas dual-GEMM kernel vs. XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import losses
from desmo_tpu.pallas import dual_contractions, factored_mse_fused


@pytest.mark.parametrize("n,k,m", [(100, 7, 50), (512, 47, 128), (700, 50, 333)])
def test_dual_contractions_match_xla(n, k, m):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, m)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    ax, xb = dual_contractions(a, b, x, interpret=True)
    # the kernel runs 3-pass bf16 (fp32-grade vs the matrix norm; ~1e-5 of
    # max|entry|): compare with scale-aware tolerances
    ax_ref, xb_ref = np.asarray(a.T @ x), np.asarray(x @ b.T)
    assert np.abs(np.asarray(ax) - ax_ref).max() < 5e-5 * np.abs(ax_ref).max()
    assert np.abs(np.asarray(xb) - xb_ref).max() < 5e-5 * np.abs(xb_ref).max()


def test_fused_mse_value_and_grads_match_factored():
    rng = np.random.default_rng(1)
    n, k, m = 300, 11, 90
    a = jnp.asarray(rng.standard_normal((n, k)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, m)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    x_sq = jnp.sum(x * x)

    v_ref = losses.factored_mse(a, b, x, x_sq)
    v_fused = factored_mse_fused(a, b, x, x_sq, True)
    assert np.isclose(float(v_ref), float(v_fused), rtol=1e-4)
    # against the direct definition too
    v_direct = losses.mse(a @ b, x)
    assert np.isclose(float(v_fused), float(v_direct), rtol=1e-3)

    g_ref = jax.grad(lambda a, b: losses.factored_mse(a, b, x, x_sq), argnums=(0, 1))(a, b)
    g_fused = jax.grad(lambda a, b: factored_mse_fused(a, b, x, x_sq, True), argnums=(0, 1))(a, b)
    for gr, gf in zip(g_ref, g_fused):
        scale = np.abs(np.asarray(gr)).max() + 1e-30
        assert np.abs(np.asarray(gr) - np.asarray(gf)).max() < 1e-4 * scale


def test_fused_loss_in_model():
    from desmo_tpu.models import desmo

    rng = np.random.default_rng(2)
    spec = desmo.DesmoSpec(n=120, m=60, r=2, poly_order=2, omega_init=1.0)
    params = desmo.init_params(spec)
    pod_modes = jnp.asarray(rng.standard_normal((120, 2)) / 11.0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((120, 60)), jnp.float32)
    batch = {"x": x, "pod_modes": pod_modes, "x_sq": jnp.sum(x * x)}
    lf_fact = desmo.build_loss(spec, 1e-3, 1e-4, method="factored")
    lf_fused = desmo.build_loss(spec, 1e-3, 1e-4, method="fused")
    t1, m1 = lf_fact(params, batch)
    t2, m2 = lf_fused(params, batch)
    assert np.isclose(float(t1), float(t2), rtol=1e-4)
    g1 = jax.grad(lambda p: lf_fact(p, batch)[0])(params)
    g2 = jax.grad(lambda p: lf_fused(p, batch)[0])(params)
    for key in g1:
        scale = np.abs(np.asarray(g1[key])).max() + 1e-30
        assert np.abs(np.asarray(g1[key]) - np.asarray(g2[key])).max() < 2e-4 * scale, key


def test_split_kernel_matches_fused():
    from desmo_tpu.pallas import (
        dual_contractions_split,
        factored_mse_fused_split,
        split_snapshots,
    )

    rng = np.random.default_rng(3)
    n, k, m = 300, 11, 90
    a = jnp.asarray(rng.standard_normal((n, k)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, m)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    x_sq = jnp.sum(x * x)
    xh, xl = split_snapshots(x)

    ax, xb = dual_contractions_split(a, b, xh, xl, interpret=True)
    ax_ref = np.asarray(a.T @ x)
    assert np.abs(np.asarray(ax) - ax_ref).max() < 5e-5 * np.abs(ax_ref).max()

    v = factored_mse_fused_split(a, b, xh, xl, x_sq, True)
    v_ref = losses.mse(a @ b, x)
    assert np.isclose(float(v), float(v_ref), rtol=1e-3)

    g = jax.grad(lambda a, b: factored_mse_fused_split(a, b, xh, xl, x_sq, True), argnums=(0, 1))(a, b)
    g_ref = jax.grad(lambda a, b: losses.factored_mse(a, b, x, x_sq), argnums=(0, 1))(a, b)
    for gs, gr in zip(g, g_ref):
        scale = np.abs(np.asarray(gr)).max() + 1e-30
        assert np.abs(np.asarray(gs) - np.asarray(gr)).max() < 2e-4 * scale
