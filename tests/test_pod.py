"""POD: method of snapshots vs. full SVD vs. the host oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import pod
from desmo_tpu.io import synthetic


def test_snapshots_matches_svd_oracle():
    x = synthetic.separable_rank_k(200, 50, k=6, seed=0).astype(np.float64)
    r = 4
    x_approx_o, modes_o, temporal_o, s_o = pod.pod_numpy(x, r)
    res = pod.pod(x, r, method="snapshots")
    np.testing.assert_allclose(np.asarray(res.singular_values), s_o, rtol=1e-3)
    # modes match up to per-mode sign
    got = np.asarray(res.modes)
    for i in range(r):
        dot = abs(float(got[:, i] @ modes_o[:, i]))
        assert dot > 1 - 1e-3, f"mode {i} misaligned: |dot|={dot}"
    # reconstruction is sign-invariant
    np.testing.assert_allclose(
        np.asarray(res.reconstruction), x_approx_o, rtol=2e-3, atol=2e-4
    )


def test_exact_svd_method():
    x = synthetic.separable_rank_k(40, 60, k=5, seed=1)
    res = pod.pod(x, 3, method="svd")
    _, modes_o, _, s_o = pod.pod_numpy(x.astype(np.float64), 3)
    np.testing.assert_allclose(np.asarray(res.singular_values), s_o, rtol=1e-4)


def test_energy_normalized():
    x = synthetic.separable_rank_k(64, 32, k=4, seed=2)
    res = pod.pod(x, 4)
    e = np.asarray(res.energy)
    assert np.isclose(e.sum(), 1.0, rtol=1e-5)
    assert (np.diff(e) <= 1e-6).all()  # descending


def test_relative_error_decreases_with_rank():
    x = synthetic.separable_rank_k(100, 40, k=8, seed=3)
    errs = [pod.pod_relative_error(x, pod.pod(x, r)) for r in (1, 2, 4, 8)]
    assert all(a >= b - 1e-6 for a, b in zip(errs, errs[1:]))
    assert errs[-1] < 1e-3  # rank-8 data, rank-8 POD


def test_exactly_rank_r_data():
    x = synthetic.separable_rank_k(80, 30, k=2, seed=4)
    assert pod.pod_relative_error(x, pod.pod(x, 2)) < 1e-3


def test_rank_sweep_monotone():
    """AE-script mode-count sweep equivalent: one factorization, all ranks."""
    x = synthetic.separable_rank_k(90, 40, k=6, seed=5)
    sweep = pod.rank_sweep(x, 8)
    assert [r for r, _ in sweep] == list(range(1, 9))
    errs = [e for _, e in sweep]
    assert all(a >= b - 1e-6 for a, b in zip(errs, errs[1:]))
    assert errs[5] < 1e-3  # rank-6 data fully captured at r=6


def test_pod_host_matches_reference_signs_exactly():
    """pod_host must reproduce np.linalg.svd bit-for-bit including mode signs
    (the reference's POD provenance, CYL:199-205)."""
    x = synthetic.separable_rank_k(50, 30, k=4, seed=6)
    res = pod.pod_host(x, 4)
    _, modes_o, temporal_o, s_o = pod.pod_numpy(x.astype(np.float32), 4)
    np.testing.assert_array_equal(np.asarray(res.modes), modes_o)
    np.testing.assert_array_equal(np.asarray(res.temporal), temporal_o)
    np.testing.assert_array_equal(np.asarray(res.singular_values), s_o)


def test_sign_align_detects_and_fixes_flips():
    """A deliberately sign-flipped mode corrupts frozen-mask inference; after
    sign_align against the reference modes the pairing is restored (VERDICT r1
    Missing #4)."""
    import dataclasses

    x = synthetic.separable_rank_k(60, 40, k=3, seed=7)
    ref = pod.pod_host(x, 3)
    flip = np.array([1.0, -1.0, 1.0], np.float32)
    flipped = dataclasses.replace(
        ref,
        modes=ref.modes * flip[None, :],
        temporal=ref.temporal * flip[:, None],
    )
    # flipped modes no longer pair with masks trained against ref signs
    assert float(np.max(np.abs(np.asarray(flipped.modes) - np.asarray(ref.modes)))) > 0.01
    aligned = pod.sign_align(flipped, ref.modes)
    np.testing.assert_array_equal(np.asarray(aligned.modes), np.asarray(ref.modes))
    np.testing.assert_array_equal(np.asarray(aligned.temporal), np.asarray(ref.temporal))


def test_sign_flip_changes_frozen_mask_reconstruction():
    """Demonstrate the failure mode evaluate() guards against: the same frozen
    phi with a sign-flipped POD basis yields a different reconstruction."""
    from desmo_tpu.models import desmo

    x = synthetic.separable_rank_k(48, 32, k=2, seed=8)
    x -= x.mean(axis=1, keepdims=True)
    spec = desmo.DesmoSpec(48, 32, 2, 2, omega_init=1.0)
    params = desmo.init_params(spec)
    rng = np.random.default_rng(0)
    params = dict(params, phi=jnp.asarray(rng.standard_normal((2, 48)), jnp.float32))
    ref = pod.pod_host(x, 2)
    recon_ref, _, _ = desmo.apply(params, ref.modes, spec)
    flipped_modes = ref.modes * jnp.asarray([-1.0, 1.0])[None, :]
    recon_flip, _, _ = desmo.apply(params, flipped_modes, spec)
    assert float(np.max(np.abs(np.asarray(recon_ref) - np.asarray(recon_flip)))) > 1e-3


def test_randomized_pod_matches_exact_on_decaying_spectrum():
    """Range-finder POD (sketch + 2 power iterations) must reproduce the
    exact truncated SVD on data with a decaying spectrum: singular values,
    mode subspace (up to sign), reconstruction, and the factored error
    identity sqrt(1 - sum(energy[:r]))."""
    x = synthetic.separable_rank_k(300, 80, k=10, seed=3).astype(np.float64)
    x += 1e-4 * np.random.default_rng(0).standard_normal(x.shape)
    r = 4
    exact = pod.pod_numpy(x, r)
    res = pod.randomized_pod(x, r, oversample=8, n_iter=2, seed=0)
    np.testing.assert_allclose(
        np.asarray(res.singular_values), exact[3], rtol=1e-3
    )
    got = np.asarray(res.modes)
    for i in range(r):
        dot = abs(float(got[:, i] @ exact[1][:, i]))
        assert dot > 1 - 1e-3, f"mode {i} misaligned: |dot|={dot}"
    np.testing.assert_allclose(
        np.asarray(res.reconstruction), exact[0], rtol=5e-3, atol=5e-4
    )
    # factored error == materialized error (both ~ the exact optimum)
    err_mat = pod.pod_relative_error(x, res)
    err_fac = float(np.sqrt(max(0.0, 1.0 - np.sum(np.asarray(res.energy)[:r]))))
    assert abs(err_mat - err_fac) < 1e-3
    # orthonormal modes out of CholeskyQR2
    gram = got.T @ got
    np.testing.assert_allclose(gram, np.eye(r), atol=1e-5)


def test_randomized_pod_method_dispatch():
    x = synthetic.separable_rank_k(120, 40, k=5, seed=4)
    res = pod.pod(x, 3, method="randomized")
    ref = pod.pod(x, 3, method="svd")
    np.testing.assert_allclose(
        np.asarray(res.singular_values), np.asarray(ref.singular_values),
        rtol=1e-3,
    )


def test_randomized_pod_sharded_over_space():
    """With a ('space', 'time') mesh the whole factorization runs with the
    spatial axis sharded: same numbers as single-device (same sketch seed),
    modes and reconstruction come back 'space'-sharded, never gathered."""
    from desmo_tpu.parallel import make_mesh

    mesh = make_mesh(n_space=4, n_time=2)
    x = synthetic.separable_rank_k(320, 60, k=8, seed=5)
    r = 3
    single = pod.randomized_pod(x, r, seed=1)
    sharded = pod.randomized_pod(x, r, seed=1, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.singular_values),
        np.asarray(single.singular_values), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.modes), np.asarray(single.modes),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.reconstruction), np.asarray(single.reconstruction),
        rtol=1e-4, atol=1e-6,
    )
    for arr in (sharded.modes, sharded.reconstruction):
        shard = next(iter(arr.addressable_shards))
        assert shard.data.shape[0] == 320 // 4, arr.sharding


def test_streaming_randomized_pod_matches_in_memory():
    """The out-of-core sketch (blocks streamed, X never materialized inside)
    must reproduce randomized_pod with the same sketch seed: identical math,
    only fp accumulation order differs. Also checks the factored-error
    contract (reconstruction is None by design)."""
    x = synthetic.separable_rank_k(250, 70, k=9, seed=6).astype(np.float32)
    x += 1e-4 * np.random.default_rng(1).standard_normal(x.shape).astype(
        np.float32
    )
    r = 4

    def blocks(width):
        def gen():
            for t in range(0, x.shape[1], width):
                yield x[:, t : t + width]
        return gen

    mem = pod.randomized_pod(x, r, seed=2)
    for width in (16, 70, 7):  # uneven tail, single block, tiny blocks
        stream = pod.streaming_randomized_pod(blocks(width), 70, r, seed=2)
        np.testing.assert_allclose(
            np.asarray(stream.singular_values),
            np.asarray(mem.singular_values), rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(stream.modes), np.asarray(mem.modes),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(stream.energy), np.asarray(mem.energy),
            rtol=1e-4, atol=1e-12,  # tail entries are numerical zeros
        )
        assert stream.reconstruction is None
    # wrong m must be caught, not silently truncated
    with pytest.raises(ValueError, match="covered"):
        pod.streaming_randomized_pod(blocks(16), 99, r, seed=2)


def test_streaming_pod_from_vtu_files(tmp_path):
    """End-to-end out-of-core POD over on-disk .vtu snapshots via
    io.vtk.iter_snapshot_column_blocks: never assembles X, matches the POD
    of the read_snapshot_series matrix."""
    from desmo_tpu.io import vtk as vio

    n_pts, m = 80, 30
    x = synthetic.separable_rank_k(n_pts, m, k=5, seed=7).astype(np.float32)
    pts = np.random.default_rng(2).standard_normal((n_pts, 3)).astype(
        np.float32
    )
    mesh = vio.Mesh(
        points=pts, point_data={}, cell_data={},
        cells=np.arange(3, dtype=np.int64),
        cell_offsets=np.array([3], np.int64),
        cell_types=np.array([5], np.uint8),
    )
    for t in range(m):
        vio.write_vtu(
            str(tmp_path / f"snap{t}.vtu"), mesh,
            point_data={"velocity": x[:, t]},
        )
    blocks = lambda: vio.iter_snapshot_column_blocks(
        str(tmp_path), "snap", 0, m, block=8
    )
    stream = pod.streaming_randomized_pod(blocks, m, 3, seed=0)
    x_mat, _ = vio.read_snapshot_series(str(tmp_path), "snap", 0, m)
    mem = pod.randomized_pod(x_mat, 3, seed=0)
    np.testing.assert_allclose(
        np.asarray(stream.singular_values), np.asarray(mem.singular_values),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(stream.modes), np.asarray(mem.modes), rtol=1e-3, atol=1e-5
    )


def test_canonical_signs_convention():
    """canonical_signs pins a data-only sign convention: largest-|entry| entry
    of each mode positive, flips absorbed by the temporal rows (U@Vt
    invariant), idempotent, and invariant to ARBITRARY input sign flips — the
    property the runner's non-host pod_method round trip rests on."""
    x = synthetic.separable_rank_k(80, 30, k=5, seed=7)
    res = pod.pod(x, 4, method="snapshots")
    canon = pod.canonical_signs(res)
    got = np.asarray(canon.modes)
    idx = np.argmax(np.abs(got), axis=0)
    assert (got[idx, np.arange(got.shape[1])] > 0).all()
    np.testing.assert_allclose(
        got @ np.asarray(canon.temporal),
        np.asarray(res.modes) @ np.asarray(res.temporal),
        rtol=1e-5, atol=1e-6,
    )
    again = pod.canonical_signs(canon)
    np.testing.assert_array_equal(np.asarray(again.modes), got)
    flip = np.where(np.arange(4) % 2 == 0, -1.0, 1.0).astype(np.float32)
    flipped = pod.PODResult(
        modes=res.modes * flip[None, :],
        temporal=res.temporal * flip[:, None],
        singular_values=res.singular_values,
        energy=res.energy,
        reconstruction=res.reconstruction,
    )
    canon2 = pod.canonical_signs(flipped)
    np.testing.assert_array_equal(np.asarray(canon2.modes), got)
    np.testing.assert_array_equal(
        np.asarray(canon2.temporal), np.asarray(canon.temporal)
    )


def test_randomized_pod_rank_deficient_data():
    """Exactly low-rank data with sketch width k > numerical rank must not NaN
    (shifted CholeskyQR escalation): leading modes are exact, tail singular
    values collapse to ~0, everything stays finite."""
    x = synthetic.separable_rank_k(60, 40, k=2, seed=0).astype(np.float32)
    x -= x.mean(axis=1, keepdims=True)
    res = pod.randomized_pod(x, 4)  # k = 12 >> rank 2
    for a in (res.modes, res.temporal, res.singular_values, res.energy, res.reconstruction):
        assert np.isfinite(np.asarray(a)).all()
    s = np.asarray(res.singular_values)
    exact = np.linalg.svd(np.asarray(x, np.float64), compute_uv=False)
    np.testing.assert_allclose(s[:2], exact[:2], rtol=1e-3)
    assert (s[2:] < 1e-2 * s[0]).all()
    # the captured-energy factored error agrees with the materialized one
    err = pod.pod_relative_error(x, res)
    assert err < 1e-2
