"""DESMO model forward vs. the NumPy oracle, and loss parity."""

import numpy as np

import jax
import jax.numpy as jnp

from desmo_tpu import losses
from desmo_tpu.models import desmo
from oracles import desmo_forward_oracle, total_loss_oracle


def random_params(spec, rng):
    T = spec.num_poly_terms
    return {
        "phi": jnp.asarray(rng.standard_normal((spec.r, spec.n)), jnp.float32),
        "c": jnp.asarray(rng.standard_normal(T), jnp.float32),
        "z": jnp.asarray(rng.standard_normal((T, spec.m)), jnp.float32),
        "z_trig": jnp.asarray(rng.standard_normal((3, spec.r, spec.m)), jnp.float32),
        "c_trig": jnp.asarray(rng.standard_normal((3, spec.r)), jnp.float32),
        "omega": jnp.asarray(rng.uniform(0.5, 3.0, (3, spec.r)), jnp.float32),
    }


def test_init_matches_reference_shapes_and_values():
    spec = desmo.DesmoSpec(n=50, m=30, r=4, poly_order=3)
    p = desmo.init_params(spec)
    assert p["phi"].shape == (4, 50)
    assert p["c"].shape == (35,)
    assert p["z"].shape == (35, 30)
    assert p["z_trig"].shape == (3, 4, 30)
    assert p["omega"].shape == (3, 4)
    assert np.all(np.asarray(p["phi"]) == 1.0)
    assert np.all(np.asarray(p["omega"]) == 10000.0)
    # parameter count formula: r*n + T + T*m + 3r*m + 3r + 3r
    # cylinder config: 4*3961 + 35 + 35*1001 + 12*1001 + 12 + 12 = 62,950
    big = desmo.DesmoSpec(n=3961, m=1001, r=4, poly_order=3)
    assert desmo.count_params(desmo.init_params(big)) == 62_950


def test_param_count_all_presets():
    # totals printed by each reference run (BASELINE.md "Model sizes")
    cases = {
        (3961, 1001, 4, 3): 62_950,
        (27_000, 1000, 4, 2): 135_039,
        (16_384, 1000, 4, 2): 92_575,
    }
    for (n, m, r, p), expected in cases.items():
        spec = desmo.DesmoSpec(n=n, m=m, r=r, poly_order=p)
        assert desmo.count_params(desmo.init_params(spec)) == expected


def test_forward_matches_oracle():
    rng = np.random.default_rng(1)
    spec = desmo.DesmoSpec(n=23, m=11, r=3, poly_order=3)
    params = random_params(spec, rng)
    pod_modes = jnp.asarray(rng.standard_normal((spec.n, spec.r)), jnp.float32)

    recon, latent, z = desmo.apply(params, pod_modes, spec)
    recon_o, latent_o = desmo_forward_oracle(
        *(np.asarray(params[k], np.float64) for k in ["phi", "c", "z", "z_trig", "c_trig", "omega"]),
        np.asarray(pod_modes, np.float64),
        spec.poly_order,
    )
    np.testing.assert_allclose(np.asarray(latent), latent_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(recon), recon_o, rtol=1e-3, atol=1e-4)
    assert z.shape == (spec.num_poly_terms, spec.m)


def test_loss_matches_oracle():
    rng = np.random.default_rng(2)
    spec = desmo.DesmoSpec(n=23, m=11, r=3, poly_order=2)
    params = random_params(spec, rng)
    pod_modes = jnp.asarray(rng.standard_normal((spec.n, spec.r)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)

    beta, lam = 1e-3, 1e-4
    loss_fn = desmo.build_loss(spec, beta, lam)
    total, metrics = loss_fn(params, {"x": x, "pod_modes": pod_modes})

    recon_o, latent_o = desmo_forward_oracle(
        *(np.asarray(params[k], np.float64) for k in ["phi", "c", "z", "z_trig", "c_trig", "omega"]),
        np.asarray(pod_modes, np.float64),
        spec.poly_order,
    )
    total_o, rec_o, ortho_o, l1_o = total_loss_oracle(
        recon_o,
        np.asarray(x, np.float64),
        latent_o,
        np.asarray(params["c"]),
        np.asarray(params["c_trig"]),
        beta,
        lam,
    )
    assert np.isclose(float(metrics["rec"]), rec_o, rtol=1e-4)
    assert np.isclose(float(metrics["ortho"]), ortho_o, rtol=1e-4)
    assert np.isclose(float(metrics["l1"]), l1_o, rtol=1e-5)
    assert np.isclose(float(total), total_o, rtol=1e-4)


def test_factored_loss_matches_direct():
    rng = np.random.default_rng(7)
    spec = desmo.DesmoSpec(n=200, m=150, r=4, poly_order=3)
    params = random_params(spec, rng)
    # keep magnitudes realistic (masks near 1, modest z) to avoid fp blowup
    params["phi"] = 1.0 + 0.1 * params["phi"]
    pod_modes = jnp.asarray(
        rng.standard_normal((spec.n, spec.r)) / np.sqrt(spec.n), jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    batch = {"x": x, "pod_modes": pod_modes}
    direct = desmo.build_loss(spec, 1e-3, 1e-4, method="direct")
    fact = desmo.build_loss(spec, 1e-3, 1e-4, method="factored")
    td, md = direct(params, batch)
    tf, mf = fact(params, batch)
    assert np.isclose(float(md["rec"]), float(mf["rec"]), rtol=1e-4)
    assert np.isclose(float(td), float(tf), rtol=1e-4)
    # gradients agree too
    gd = jax.grad(lambda p: direct(p, batch)[0])(params)
    gf = jax.grad(lambda p: fact(p, batch)[0])(params)
    for k in gd:
        np.testing.assert_allclose(
            np.asarray(gd[k]), np.asarray(gf[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )


def test_loss_is_differentiable_everywhere():
    rng = np.random.default_rng(3)
    spec = desmo.DesmoSpec(n=13, m=7, r=2, poly_order=3)
    params = desmo.init_params(spec)  # ones init: includes zeros nowhere, but
    pod_modes = jnp.zeros((spec.n, spec.r))  # zero POD modes stress x**0 paths
    x = jnp.asarray(rng.standard_normal((spec.n, spec.m)), jnp.float32)
    loss_fn = desmo.build_loss(spec, 1e-3, 1e-4)
    grads = jax.grad(lambda p: loss_fn(p, {"x": x, "pod_modes": pod_modes})[0])(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
