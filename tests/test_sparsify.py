"""Sparsification: energies vs. brute-force rank-1 norms, sweeps, pruning."""

import numpy as np

import jax.numpy as jnp

from desmo_tpu import library, sparsify
from desmo_tpu.models import desmo, fourier
from oracles import pool_data_oracle


def setup_model(seed=0, n=25, m=17, r=3, p=2):
    rng = np.random.default_rng(seed)
    spec = desmo.DesmoSpec(n=n, m=m, r=r, poly_order=p)
    T = spec.num_poly_terms
    params = {
        "phi": jnp.asarray(rng.standard_normal((r, n)), jnp.float32),
        "c": jnp.asarray(rng.standard_normal(T), jnp.float32),
        "z": jnp.asarray(rng.standard_normal((T, m)), jnp.float32),
        "z_trig": jnp.asarray(rng.standard_normal((3, r, m)), jnp.float32),
        "c_trig": jnp.asarray(rng.standard_normal((3, r)), jnp.float32),
        "omega": jnp.asarray(rng.uniform(0.5, 2.0, (3, r)), jnp.float32),
    }
    pod_modes = rng.standard_normal((n, r)).astype(np.float32)
    x = rng.standard_normal((n, m)).astype(np.float32)
    return spec, params, pod_modes, x


def test_energies_match_bruteforce_rank1_norms():
    """The reference computes term energies on the RAW masks (param.data at
    CYL:626-628), not the POD-scaled modes — the oracle mirrors that."""
    spec, params, pod_modes, _ = setup_model()
    e = sparsify.term_energies(params, spec=spec)

    pp = {k: np.asarray(v, np.float64) for k, v in params.items()}
    latent = pp["phi"].T
    theta = pool_data_oracle(latent, spec.r, spec.poly_order)
    for t in range(theta.shape[1]):
        field = pp["c"][t] * np.outer(theta[:, t], pp["z"][t])
        np.testing.assert_allclose(e.poly[t], np.linalg.norm(field), rtol=1e-4)
    funcs = [np.sin, np.cos, np.tanh]
    for i in range(spec.r):
        for k in range(3):
            spatial = funcs[k](pp["omega"][k, i] * latent[:, i])
            field = pp["c_trig"][k, i] * np.outer(spatial, pp["z_trig"][k, i])
            np.testing.assert_allclose(e.trig[k, i], np.linalg.norm(field), rtol=1e-4)
    # interleaved view matches reference nonlinear_norm order
    inter = e.interleaved_trig()
    assert np.isclose(inter[0], e.trig[0, 0]) and np.isclose(inter[1], e.trig[1, 0])
    assert np.isclose(inter[3], e.trig[0, 1])


def test_threshold_zero_and_counts():
    spec, params, pod_modes, x = setup_model()
    e = sparsify.term_energies(params, spec=spec)
    all_e = np.concatenate([e.poly, e.trig.reshape(-1)])
    thr = float(np.median(all_e))
    pruned = sparsify.zero_below_threshold(params, e, thr)
    expected = int(np.sum(all_e >= thr))
    assert sparsify.nonzero_terms(pruned) == expected
    # surviving coefficients unchanged
    keep = np.asarray(e.poly) >= thr
    np.testing.assert_array_equal(
        np.asarray(pruned["c"])[keep], np.asarray(params["c"])[keep]
    )


def test_sweep_monotone_term_count_and_extremes():
    spec, params, pod_modes, x = setup_model()
    batch = {"x": jnp.asarray(x), "pod_modes": jnp.asarray(pod_modes)}
    thresholds = sparsify.default_thresholds()
    res = sparsify.threshold_sweep(params, batch, spec, thresholds=thresholds)
    counts = [r.nonzero_terms for r in res]
    assert all(a >= b for a, b in zip(counts, counts[1:])) or all(
        a <= b for a, b in zip(counts, counts[1:])
    )
    total = spec.num_poly_terms + 3 * spec.r
    # tiny threshold keeps everything
    assert res[0].nonzero_terms == total or res[-1].nonzero_terms == total


def test_greedy_prune_curve():
    spec, params, pod_modes, x = setup_model()
    batch = {"x": jnp.asarray(x), "pod_modes": jnp.asarray(pod_modes)}
    res = sparsify.greedy_prune(params, batch, spec)
    total = spec.num_poly_terms + 3 * spec.r
    assert len(res) == total + 1
    assert res[0].nonzero_terms == total
    assert res[-1].nonzero_terms == 0
    # removing everything must give error 1.0 (recon == 0)
    assert np.isclose(res[-1].error, 1.0, rtol=1e-5)


def test_fourier_energies_use_series():
    rng = np.random.default_rng(1)
    spec = fourier.FourierSpec(n=15, m=11, r=2, poly_order=2, n_fourier=2)
    params = fourier.init_params(spec)
    params = {
        k: jnp.asarray(rng.standard_normal(v.shape), jnp.float32) if k != "period" and k != "trig_period" else v
        for k, v in params.items()
    }
    e = sparsify.term_energies(params, spec=spec)
    assert e.poly.shape == (spec.num_poly_terms,)
    assert np.isfinite(e.poly).all() and np.isfinite(e.trig).all()


def test_coefficient_thresholding_raw_magnitudes():
    """AE/SR convention: threshold |coef| directly; AE leaves tanh untouched."""
    spec, params, pod_modes, x = setup_model(r=2, p=2)
    c = np.array([1.0, 1e-5, 0.5, 1e-6, 2.0, 3e-4], np.float32)
    ct = np.array([[1e-5, 1.0], [0.5, 1e-6], [1e-7, 1e-7]], np.float32)
    params = dict(params, c=__import__("jax").numpy.asarray(c), c_trig=__import__("jax").numpy.asarray(ct))
    pruned = sparsify.zero_coefficients_below(params, 1e-4, include_tanh=True)
    np.testing.assert_array_equal(np.asarray(pruned["c"]) != 0, [1, 0, 1, 0, 1, 1])
    assert np.count_nonzero(np.asarray(pruned["c_trig"])) == 2
    # AE mode: tanh row untouched even below threshold
    pruned_ae = sparsify.zero_coefficients_below(params, 1e-4, include_tanh=False)
    np.testing.assert_array_equal(np.asarray(pruned_ae["c_trig"][2]), ct[2])

    batch = {"x": __import__("jax").numpy.asarray(x), "pod_modes": __import__("jax").numpy.asarray(pod_modes)}
    res = sparsify.coefficient_sweep(params, batch, spec, variant="desmo")
    assert len(res) == 12  # arange(8, 2, -0.5) grid
    assert all(np.isfinite(e.error) for e in res)


def test_describe_nonzero_terms():
    spec, params, pod_modes, x = setup_model(r=2, p=2)
    c = np.zeros(spec.num_poly_terms, np.float32)
    c[1] = 2.5  # phi1
    ct = np.zeros((3, 2), np.float32)
    ct[0, 1] = -1.0  # sin(phi2)
    params = dict(params, c=jnp.asarray(c), c_trig=jnp.asarray(ct))
    terms = sparsify.describe_nonzero_terms(params, spec)
    assert ("phi1", 2.5) in terms
    assert ("sin(phi2)", -1.0) in terms
    assert len(terms) == 2


def test_mask_inactive_trig_zeroes_masked_tanh_energies():
    """Trig kinds the forward pass masks out of the reconstruction (AE's
    include_tanh=False) never train, so their raw init-ones energies can
    dominate the table — channel SELECTION must see them as dead or they
    crowd real channels out of a capped selection (runner's 3r forecast cap)
    and feed constant all-ones columns into STLSQ."""
    from desmo_tpu.models import autoencoder as ae

    e = sparsify.TermEnergies(
        poly=np.array([2.0, 0.5]),
        trig=np.array([[3.0, 0.1], [0.2, 4.0], [50.0, 60.0]]),
    )
    spec = ae.AESpec(n=8, m=12, r=2, poly_order=1)  # include_tanh=False
    masked = sparsify.mask_inactive_trig(e, spec)
    np.testing.assert_array_equal(masked.trig[2], 0.0)
    np.testing.assert_array_equal(masked.trig[:2], np.asarray(e.trig)[:2])
    np.testing.assert_array_equal(masked.poly, e.poly)
    # the original table is untouched (sweep goldens keep RAW energies)
    assert np.asarray(e.trig)[2, 0] == 50.0

    # specs whose forward keeps tanh (plain desmo) pass through unchanged
    plain = desmo.DesmoSpec(n=8, m=12, r=2, poly_order=1)
    same = sparsify.mask_inactive_trig(e, plain)
    np.testing.assert_array_equal(same.trig, e.trig)

    # selection on the masked table never picks a dead tanh channel
    from desmo_tpu import sr

    top = sr.top_channels(masked, max_channels=3)
    assert top and all(kind != "tanh" for kind, _ in top)
