"""Seed-packed mega-kernel (interpret mode) vs the packed scan chunk.

The packed kernel must reproduce ``ensemble.make_ensemble_chunk`` (itself
parity-tested against S independent single-seed trainings) step-for-step:
same per-seed metrics traces, same final stacked params/moments and per-seed
scheduler rows — up to the kernel's documented precision contract (3-pass
bf16 contractions ~5e-6 rel, _fast_sincos ~2e-7 abs). At S=1 the packed
host path must reduce EXACTLY (bitwise) to the standard mega-kernel.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, ensemble, optim, train
from desmo_tpu.io import synthetic
from desmo_tpu.models import desmo
from desmo_tpu.models import fourier as fourier_model
from desmo_tpu.pallas import train_chunk


def problem(S=3, n=96, m=40, r=2, P=2, bt=32, lr_omega=0.1, omega_init=1.0):
    cfg = configs.RunConfig(
        name="ens-mk",
        variant="desmo",
        n=n,
        m=m,
        r=r,
        poly_order=P,
        omega_init=omega_init,
        lr_omega=lr_omega,
        num_epochs=40,
        patience=300,
        sched_every=1,
        log_every=100,
        checkpoint_every=1000,
    )
    spec = desmo.DesmoSpec(n, m, r, P, omega_init=omega_init)
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    from desmo_tpu import pod as pod_mod

    p = pod_mod.pod(x, r)
    params = ensemble.init_params(spec, S, seed=1, phi_sigma=0.1, omega_spread=0.2)
    batch = train_chunk.prepare_batch(x, p.modes, bt=bt)
    return cfg, spec, params, batch


def test_packed_resident_transport_policy():
    """The packed fourier kernel must auto-select the STREAMED transport at
    cylinder scale: Mosaic's 16 MB scoped-stack pool OOMs the resident form
    at ~13.9 MB + 0.94 MB/seed (measured 2026-08-20; the silent eraser of
    BENCH_r04's ensemble_fourier entry). Packed desmo and single-seed
    fourier keep the 30 MB resident budget; tiny CI shapes stay resident."""
    fcfg = configs.get("fourier_cylinder")
    fspec = fourier_model.FourierSpec(
        fcfg.n, fcfg.m, fcfg.r, fcfg.poly_order, fcfg.omega_init,
        fcfg.n_fourier, fcfg.period_init,
    )
    # single-seed resident fits (the shipped 14.7k st/s kernel)...
    assert train_chunk.packed_resident_fits(fspec, fcfg, n_seeds=1)
    # ...but ANY packed fourier at this scale must stream
    assert not train_chunk.packed_resident_fits(fspec, fcfg, n_seeds=2)
    assert not train_chunk.packed_resident_fits(fspec, fcfg, n_seeds=8)
    # packed desmo at cylinder scale stays resident (S=2 compiles, measured)
    dcfg = configs.get("cylinder")
    dspec = desmo.DesmoSpec(dcfg.n, dcfg.m, dcfg.r, dcfg.poly_order)
    assert train_chunk.packed_resident_fits(dspec, dcfg, n_seeds=2)
    # tiny CI shapes: resident for any variant/pack
    tiny = fourier_model.FourierSpec(96, 40, 2, 2, 1.0, 3, 40.0)
    tcfg = dataclasses.replace(fcfg, n=96, m=40)
    assert train_chunk.packed_resident_fits(tiny, tcfg, n_seeds=8)


def test_supports_packed_bounds():
    cfg = configs.get("aneurysm")
    spec = desmo.DesmoSpec(100, 50, 4, 2)  # K=27
    assert train_chunk.supports_packed(spec, cfg, 4)
    assert not train_chunk.supports_packed(spec, cfg, 5)  # 5*27 > 128
    spec3 = desmo.DesmoSpec(100, 50, 4, 3)  # K=47
    assert train_chunk.supports_packed(spec3, cfg, 2)
    assert not train_chunk.supports_packed(spec3, cfg, 3)
    fcfg = configs.get("fourier_cylinder")
    fspec = fourier_model.FourierSpec(100, 50, 2, 2, n_fourier=10)  # K=12
    assert train_chunk.supports_packed(fspec, fcfg, 8)
    # the svec scheduler block has 8 rows — S > 8 must fall back to the
    # packed scan chunk even when the lanes would fit (10*12 <= 128)
    assert not train_chunk.supports_packed(fspec, fcfg, 9)
    big = fourier_model.FourierSpec(100, 50, 2, 2, n_fourier=64)
    assert not train_chunk.supports_packed(big, fcfg, 2)  # nf > 63
    acfg = configs.get("ae_cylinder")
    assert not train_chunk.supports_packed(spec, acfg, 2)  # ae never packs
    # r > 8 is outside the kernel's tested regime, same as supports()
    r9 = desmo.DesmoSpec(100, 50, 9, 1)
    assert not train_chunk.supports_packed(r9, cfg, 2)


def test_large_S_rejected_not_crashed():
    """n_seeds beyond the kernel's 8-row scheduler ceiling must be REFUSED by
    the capability gate (-> packed scan fallback in fit), not crash inside
    the kernel builder (regression: S=9/10 at fourier K=12 used to break the
    (8, 128) svec packing)."""
    cfg, spec, params, batch = fproblem(1)
    assert ensemble.max_seeds_packed(spec) > 8  # K=12 -> 10 lanes-wise
    with pytest.raises(ValueError, match="pack"):
        train_chunk.make_fused_ensemble_chunk(spec, cfg, 9, bt=32, interpret=True)


def test_aug_width():
    assert train_chunk.aug_width(2, 1) == 16
    assert train_chunk.aug_width(4, 1) == 16
    assert train_chunk.aug_width(4, 3) == 16  # 1 + 12
    assert train_chunk.aug_width(4, 4) == 32  # 1 + 16
    assert train_chunk.aug_width(8, 2) == 32


def run_both(cfg, spec, params, batch, S, steps, streamed=False):
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    groups = desmo.param_groups(desmo.init_params(spec))
    ref_chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    s_ref = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=steps)

    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=streamed
    )
    s_k = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_k, m_k = fused(s_k, batch, num_steps=steps)
    return (s_ref, {k: np.asarray(v) for k, v in m_ref.items()}), (
        s_k,
        {k: np.asarray(v) for k, v in m_k.items()},
    )


def test_packed_kernel_matches_packed_scan():
    S = 3
    cfg, spec, params, batch = problem(S)
    (s_ref, m_ref), (s_k, m_k) = run_both(cfg, spec, params, batch, S, steps=30)
    for key in ("rec", "ortho", "l1", "total_s"):
        np.testing.assert_allclose(
            m_k[key], m_ref[key], rtol=3e-4, atol=1e-6, err_msg=key
        )
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]), np.asarray(s_ref.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    # per-seed scheduler rows carried through
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_k.sched.best), np.asarray(s_ref.sched.best), rtol=3e-4
    )
    assert int(s_k.epoch) == int(s_ref.epoch) == 30
    assert m_k["max_arg"].shape == (30,)
    assert np.all(m_k["max_arg"] > 0)


def test_packed_seeds_match_independent_single_kernels():
    """Each packed seed's trajectory == that seed alone through the
    SINGLE-seed mega-kernel (same transport, same in-kernel numerics) —
    the packing itself must not couple seeds at all."""
    S = 3
    cfg, spec, params, batch = problem(S)
    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    s_k = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_k, m_k = fused(s_k, batch, num_steps=25)
    single = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    for s in range(S):
        st = jax.tree.map(
            jnp.array,
            train.init_state(ensemble.extract_seed(params, s), cfg),
        )
        st, ms = single(st, batch, num_steps=25)
        np.testing.assert_allclose(
            np.asarray(m_k["total_s"])[:, s], np.asarray(ms["total"]),
            rtol=2e-5, atol=1e-7, err_msg=f"seed{s} trace",
        )
        for key in st.params:
            np.testing.assert_allclose(
                np.asarray(s_k.params[key][s]), np.asarray(st.params[key]),
                rtol=1e-4, atol=1e-6, err_msg=f"seed{s}:{key}",
            )
        np.testing.assert_allclose(
            np.asarray(s_k.sched.lrs[s]), np.asarray(st.sched.lrs), rtol=1e-6
        )


def test_streamed_emul_matches_resident_packed():
    """The packed kernel through the streamed (emul) transport is bit-exact
    vs the packed resident mode — including the widened augw=16 S*r+1 slots."""
    S = 3
    cfg, spec, params, batch = problem(S)
    res = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=False
    )
    stm = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=True
    )
    s0 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s1 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    a, ma = res(s0, batch, num_steps=9)  # odd: exercises the parity select
    b, mb = stm(s1, batch, num_steps=9)
    for key in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[key]), np.asarray(b.params[key]), err_msg=key
        )
    np.testing.assert_array_equal(
        np.asarray(ma["total_s"]), np.asarray(mb["total_s"])
    )


def test_streamed_wide_augw():
    """S*r + 1 > 16 forces the widened augw=32 streamed transport."""
    S, r = 4, 4  # 1 + 16 = 17 -> augw 32
    cfg, spec, params, batch = problem(S, r=r, P=2)
    assert train_chunk.aug_width(r, S) == 32
    res = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=False
    )
    stm = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=True
    )
    s0 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s1 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    a, _ = res(s0, batch, num_steps=6)
    b, _ = stm(s1, batch, num_steps=6)
    for key in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[key]), np.asarray(b.params[key]), err_msg=key
        )


def test_single_seed_wrapper_bitwise_equals_standard_kernel():
    """n_seeds=1 through the packed host path must be EXACTLY the standard
    mega-kernel (same kernel, same packing) — guards the S=1 fast path."""
    cfg, spec, params, batch = problem(1)
    fused1 = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, 1, bt=32, interpret=True
    )
    s1 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, 1))
    s1, m1 = fused1(s1, batch, num_steps=20)
    std = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    st = jax.tree.map(
        jnp.array, train.init_state(ensemble.extract_seed(params, 0), cfg)
    )
    st, ms = std(st, batch, num_steps=20)
    for key in st.params:
        np.testing.assert_array_equal(
            np.asarray(s1.params[key][0]), np.asarray(st.params[key]),
            err_msg=key,
        )
    np.testing.assert_array_equal(
        np.asarray(m1["total_s"])[:, 0], np.asarray(ms["total"])
    )


def _patch_kernel_select(monkeypatch):
    """Make ensemble.fit's auto-selection return the interpret-mode packed
    kernel on CPU (on hardware select_ensemble_chunk requires the TPU
    backend), so the fit() integration runs the kernel path in CI."""
    real = train_chunk.make_fused_ensemble_chunk

    def fake_select(spec, cfg, n_seeds, bt=32, device_mesh=None,
                    betas=None, lams=None):
        if device_mesh is not None:
            return None
        if not train_chunk.supports_packed(spec, cfg, n_seeds):
            return None
        return real(spec, cfg, n_seeds, bt=32, interpret=True,
                    betas=betas, lams=lams)

    monkeypatch.setattr(train_chunk, "select_ensemble_chunk", fake_select)


def test_fit_runs_kernel_path_end_to_end(monkeypatch):
    """ensemble.fit with the packed kernel auto-selected: multi-chunk run,
    per-seed logging, best-seed extraction, seed-steps accounting."""
    _patch_kernel_select(monkeypatch)
    cfg, spec, params, batch = problem(3)
    cfg = dataclasses.replace(cfg, checkpoint_every=8)
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=3, num_epochs=16,
        phi_sigma=0.1, omega_spread=0.2, log=logs.append,
    )
    assert finals.shape == (3,)
    assert np.isfinite(finals).all()
    assert int(best) == int(np.argmin(finals))
    assert int(result.state.epoch) == 16
    assert result.history["total"].shape == (16,)
    assert np.isfinite(result.history["total"]).all()
    assert not any("fast-sincos" in line for line in logs)
    # the winner resumes on the standard single-seed scanned chunk
    loss = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    cont = train.fit(
        loss, desmo.param_groups(result.state.params), cfg,
        result.state.params, batch, num_epochs=4, chunk_size=4, log=None,
        state=result.state,
    )
    assert int(cont.state.epoch) == 20
    assert np.isfinite(cont.history["total"]).all()


def test_fit_runs_fourier_kernel_path(monkeypatch):
    """ensemble.fit auto-selecting the FOURIER seed-packed kernel: the period
    candidates land as per-seed inits, the winner's periods survive the
    packed round-trip, and the best-seed state resumes standalone."""
    _patch_kernel_select(monkeypatch)
    cfg, spec, params, batch = fproblem(3)
    cfg = dataclasses.replace(cfg, checkpoint_every=8, period_multistart=3)
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=3, num_epochs=16,
        phi_sigma=0.1, log=logs.append,
    )
    assert any("period candidates" in line for line in logs)
    assert finals.shape == (3,) and np.isfinite(finals).all()
    assert int(result.state.epoch) == 16
    assert np.isfinite(result.history["total"]).all()
    assert result.state.params["period"].shape == (spec.num_poly_terms,)
    assert result.state.params["trig_period"].shape == (3, spec.r)


def test_fit_warns_when_candidates_exceed_seeds(monkeypatch):
    """period_multistart > n_seeds: the untrained tail candidates must be
    called out (and truncated), not silently dropped by the s % len cycling."""
    _patch_kernel_select(monkeypatch)
    cfg, spec, params, batch = fproblem(2)
    cfg = dataclasses.replace(cfg, period_multistart=4)
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=2, num_epochs=6, log=logs.append,
    )
    assert any("will not be trained" in line for line in logs), logs
    assert finals.shape == (2,) and np.isfinite(finals).all()


def test_fit_kernel_compile_failure_falls_back(monkeypatch):
    """A packed-kernel compile/runtime failure on the FIRST chunk call (the
    remote Mosaic compiler rejects some shapes opaquely) must degrade to the
    packed scan chunk with a warning, not kill the run."""

    def broken_select(spec, cfg, n_seeds, bt=32, device_mesh=None, **kw):
        def boom(state, batch, num_steps):
            raise RuntimeError("mosaic compile failed (simulated)")

        return boom

    monkeypatch.setattr(train_chunk, "select_ensemble_chunk", broken_select)
    cfg, spec, params, batch = problem(2)
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=2, num_epochs=8, log=logs.append,
    )
    assert any("failed to compile/run" in line for line in logs), logs
    assert np.isfinite(finals).all()
    assert int(result.state.epoch) == 8


def test_fit_sincos_fallback_to_packed_scan(monkeypatch):
    """|omega*latent| beyond SINCOS_DOMAIN inside ensemble.fit: the kernel's
    max_arg telemetry trips the guard, fit warns and finishes the group on
    the packed scan chunk (builtin trig) — epochs, history concatenation and
    best-seed selection all intact across the mid-run chunk swap."""
    _patch_kernel_select(monkeypatch)
    cfg, spec, params, batch = problem(3, omega_init=1e6)
    cfg = dataclasses.replace(cfg, checkpoint_every=6)
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=3, num_epochs=18,
        phi_sigma=0.1, log=logs.append,
    )
    assert any("fast-sincos domain" in line for line in logs)
    assert np.isfinite(finals).all()
    assert int(result.state.epoch) == 18
    assert result.history["total"].shape == (18,)
    assert np.isfinite(result.history["total"]).all()


def fproblem(S=3, n=96, m=40, r=2, P=2, nf=3, bt=32, lr_omega=0.1,
             periods=None):
    """Small Fourier ensemble problem (periodic data, distinct per-seed
    periods when given — exercises the per-row period series in the kernel)."""
    period_init = float(m)
    cfg = configs.RunConfig(
        name="ens-fmk", variant="fourier", n=n, m=m, r=r, poly_order=P,
        n_fourier=nf, period_init=period_init, omega_init=1.0,
        lr_omega=lr_omega, num_epochs=40, patience=300, sched_every=1,
        log_every=100, checkpoint_every=1000,
    )
    spec = fourier_model.FourierSpec(
        n, m, r, P, omega_init=1.0, n_fourier=nf, period_init=period_init
    )
    t = fourier_model.t_points(m)
    s = np.linspace(0, 2 * np.pi, n)
    x = np.outer(np.sin(s), np.sin(2 * np.pi * 2 * t / m)) + 0.5 * np.outer(
        np.cos(s), np.cos(2 * np.pi * 3 * t / m)
    )
    x = (x - x.mean(axis=1, keepdims=True)).astype(np.float32)
    from desmo_tpu import pod as pod_mod

    p = pod_mod.pod(x, r)
    params = ensemble.init_params(
        spec, S, seed=1, phi_sigma=0.1, omega_spread=0.2, periods=periods
    )
    batch = train_chunk.prepare_batch(jnp.asarray(x), p.modes, bt=bt)
    return cfg, spec, params, batch


def test_packed_fourier_kernel_matches_packed_scan():
    """The seed-packed FOURIER kernel (per-seed series coefficients AND
    per-seed periods as extra rows) must reproduce the packed scan chunk —
    per-seed metric traces, final params incl. period/trig_period, per-seed
    scheduler rows."""
    S = 3
    cfg, spec, params, batch = fproblem(
        S, periods=[40.0, 19.2, 30.0]  # distinct periods: per-row series
    )
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    groups = fourier_model.param_groups(fourier_model.init_params(spec))
    ref_chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    s_ref = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=30)

    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    s_k = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_k, m_k = fused(s_k, batch, num_steps=30)
    for key in ("rec", "ortho", "l1", "total_s"):
        # ortho atol: the off-diagonal Gram of NEAR-ORTHOGONAL latents is
        # cancellation-dominated (seed 0 starts exactly POD-orthogonal,
        # ortho ~1e-9), so the 3-pass contraction's ~5e-6-scale absolute
        # noise is the honest floor there
        atol = 5e-6 if key == "ortho" else 1e-6
        np.testing.assert_allclose(
            np.asarray(m_k[key]), np.asarray(m_ref[key]),
            rtol=3e-4, atol=atol, err_msg=key,
        )
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]), np.asarray(s_ref.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )
    assert int(s_k.epoch) == 30


def test_packed_fourier_seeds_match_independent_single_kernels():
    """Each packed fourier seed == that seed alone through the single-seed
    fourier mega-kernel (same series recurrence, same numerics)."""
    S = 3
    cfg, spec, params, batch = fproblem(S, periods=[40.0, 19.2, 30.0])
    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    s_k = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s_k, m_k = fused(s_k, batch, num_steps=25)
    single = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    for s in range(S):
        st = jax.tree.map(
            jnp.array,
            train.init_state(ensemble.extract_seed(params, s), cfg),
        )
        st, ms = single(st, batch, num_steps=25)
        np.testing.assert_allclose(
            np.asarray(m_k["total_s"])[:, s], np.asarray(ms["total"]),
            rtol=2e-5, atol=1e-7, err_msg=f"seed{s} trace",
        )
        for key in st.params:
            np.testing.assert_allclose(
                np.asarray(s_k.params[key][s]), np.asarray(st.params[key]),
                rtol=1e-4, atol=1e-6, err_msg=f"seed{s}:{key}",
            )


def test_packed_fourier_streamed_emul_matches_resident():
    S = 3
    cfg, spec, params, batch = fproblem(S, periods=[40.0, 19.2, 30.0])
    res = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=False
    )
    stm = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=True
    )
    s0 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s1 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    a, ma = res(s0, batch, num_steps=9)
    b, mb = stm(s1, batch, num_steps=9)
    for key in a.params:
        np.testing.assert_array_equal(
            np.asarray(a.params[key]), np.asarray(b.params[key]), err_msg=key
        )
    np.testing.assert_array_equal(
        np.asarray(ma["total_s"]), np.asarray(mb["total_s"])
    )


def test_resume_mid_run():
    """Two packed chunks == one double-length packed chunk (state
    round-trips losslessly through the host repack)."""
    S = 2
    cfg, spec, params, batch = problem(S)
    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    sa = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    sa, _ = fused(sa, batch, num_steps=8)
    sa, ma = fused(sa, batch, num_steps=8)
    sb = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    sb, mb = fused(sb, batch, num_steps=16)
    for key in sa.params:
        np.testing.assert_allclose(
            np.asarray(sa.params[key]), np.asarray(sb.params[key]),
            rtol=1e-6, atol=1e-8, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(ma["total_s"]), np.asarray(mb["total_s"])[8:], rtol=1e-6
    )


def test_packed_kernel_isolates_diverged_seed_metrics():
    """One diverged seed's inf/NaN must not leak into the OTHER seeds'
    per-seed metrics: ga/auga carry non-finite cross-seed entries once a
    seed diverges, and both the zero-masked block products and the one-hot
    SEEDSEL/AUGSEL matmuls would turn them into NaN*0 = NaN for every seed.
    ensemble.fit attributes divergence blame from per-seed finiteness of
    total_s at the FIRST bad step, so this isolation is what makes
    containment work on the kernel path (the scan path extracts block
    diagonals by indexing and is isolated by construction)."""
    S = 3
    cfg, spec, params, batch = problem(S)
    params = dict(params, phi=params["phi"].at[1].set(jnp.nan))
    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    state = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    _, mets = fused(state, batch, num_steps=2)
    for key in ("rec", "ortho", "total_s"):
        row = np.asarray(mets[key])[0]  # step 0: only seed 1 is bad yet
        assert not np.isfinite(row[1]), key
        assert np.isfinite(row[0]) and np.isfinite(row[2]), (key, row)


def test_fit_kernel_path_recovers_from_diverged_seed(monkeypatch):
    """Divergence containment END-TO-END on the packed-kernel path: the
    jittered seeds overflow at init, fit must attribute them from the
    isolated per-seed metrics, freeze exactly those, and let seed 0 (exact
    reference init) finish — not raise 'every seed diverged'."""
    _patch_kernel_select(monkeypatch)
    cfg, spec, params, batch = problem(3)
    cfg = dataclasses.replace(cfg, checkpoint_every=8, log_every=1000)
    msgs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=3, num_epochs=16, seed=0,
        phi_sigma=1e200, omega_spread=0.0, log=msgs.append,
    )
    assert best == 0
    assert np.isfinite(finals[0])
    assert np.isinf(finals[1]) and np.isinf(finals[2])
    assert any("diverged" in m for m in msgs)
    assert result.history["total"].shape == (16,)
    assert np.isfinite(result.history["total"]).all()


# --- hyperparameter multi-start through the packed kernel --------------------


def _hyper_triplet():
    betas = np.array([1e-3, 5e-3, 1e-2], np.float32)
    lams = np.array([1e-4, 1e-5, 1e-3], np.float32)
    scales = np.array([1.0, 0.5, 2.0], np.float32)  # powers of two: exact
    return betas, lams, scales


def test_packed_kernel_hyper_sweep_matches_packed_scan():
    """Per-seed beta/lam ride the svec rows into the kernel (phi gradient,
    coef L1 gradient, per-seed totals) and lr_scales the per-seed LR rows —
    30 steps of the packed kernel under HETEROGENEOUS hypers must match the
    packed scan chunk built with the same per-seed weights. The streamed
    transport must stay bit-exact vs resident under the sweep too."""
    S = 3
    cfg, spec, params, batch = problem(S)
    betas, lams, scales = _hyper_triplet()
    loss = ensemble.build_loss(
        spec, cfg, S, method="factored", betas=betas, lams=lams
    )
    groups = desmo.param_groups(desmo.init_params(spec))
    ref_chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    s_ref = jax.tree.map(
        jnp.array, ensemble.init_state(params, cfg, S, lr_scales=scales)
    )
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=30)

    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, betas=betas, lams=lams
    )
    s_k = jax.tree.map(
        jnp.array, ensemble.init_state(params, cfg, S, lr_scales=scales)
    )
    s_k, m_k = fused(s_k, batch, num_steps=30)
    for key in ("rec", "ortho", "l1", "total_s"):
        np.testing.assert_allclose(
            np.asarray(m_k[key]), np.asarray(m_ref[key]),
            rtol=3e-4, atol=1e-6, err_msg=key,
        )
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]), np.asarray(s_ref.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )

    streamed = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, streamed=True,
        betas=betas, lams=lams,
    )
    s_s = jax.tree.map(
        jnp.array, ensemble.init_state(params, cfg, S, lr_scales=scales)
    )
    s_s, m_s = streamed(s_s, batch, num_steps=30)
    np.testing.assert_array_equal(
        np.asarray(m_s["total_s"]), np.asarray(m_k["total_s"])
    )
    for key in s_k.params:
        np.testing.assert_array_equal(
            np.asarray(s_s.params[key]), np.asarray(s_k.params[key]),
            err_msg=key,
        )


def test_packed_fourier_kernel_hyper_sweep_matches_packed_scan():
    """Fourier variant of the sweep parity: per-seed beta/lam must thread
    through the series-coefficient/period updates unchanged (beta touches
    only phi, lam only the coefficient row — both shared with desmo)."""
    S = 3
    cfg, spec, params, batch = fproblem(S)
    betas, lams, scales = _hyper_triplet()
    loss = ensemble.build_loss(
        spec, cfg, S, method="factored", betas=betas, lams=lams
    )
    from desmo_tpu.models import fourier as fmodel

    groups = fmodel.param_groups(fmodel.init_params(spec))
    ref_chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    s_ref = jax.tree.map(
        jnp.array, ensemble.init_state(params, cfg, S, lr_scales=scales)
    )
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=25)

    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True, betas=betas, lams=lams
    )
    s_k = jax.tree.map(
        jnp.array, ensemble.init_state(params, cfg, S, lr_scales=scales)
    )
    s_k, m_k = fused(s_k, batch, num_steps=25)
    for key in ("rec", "ortho", "l1", "total_s"):
        # same ortho atol rationale as test_packed_fourier_kernel_matches_
        # packed_scan: near-orthogonal latents make the off-diagonal Gram
        # cancellation-dominated, ~5e-6 abs is the 3-pass noise floor
        atol = 5e-6 if key == "ortho" else 1e-6
        np.testing.assert_allclose(
            np.asarray(m_k[key]), np.asarray(m_ref[key]),
            rtol=3e-4, atol=atol, err_msg=key,
        )
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]), np.asarray(s_ref.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )


def test_uniform_hypers_bitwise_equal_no_hypers():
    """betas/lams equal to the cfg scalars must leave the kernel's numerics
    EXACTLY unchanged (the svec-read path is the same float32 values the
    scalar closure would have used)."""
    S = 2
    cfg, spec, params, batch = problem(S)
    plain = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True
    )
    swept = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=32, interpret=True,
        betas=np.full(S, cfg.beta, np.float32),
        lams=np.full(S, cfg.l1_lambda, np.float32),
    )
    s0 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s1 = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    s0, m0 = plain(s0, batch, num_steps=12)
    s1, m1 = swept(s1, batch, num_steps=12)
    np.testing.assert_array_equal(
        np.asarray(m0["total_s"]), np.asarray(m1["total_s"])
    )
    for k in s0.params:
        np.testing.assert_array_equal(
            np.asarray(s0.params[k]), np.asarray(s1.params[k]), err_msg=k
        )


def test_single_seed_remainder_group_honors_hypers():
    """An S=1 packed-kernel group (a sweep's remainder, e.g. 3 seeds at pack
    cap 2) must train under ITS combo, not cfg's scalars — regression for
    the SEEDS==1 kernel branches reading the compile-time closure instead of
    the per-seed values (review finding, reproduced live before the fix)."""
    cfg, spec, params, batch = problem(1)
    betas = np.array([7e-2], np.float32)  # far from cfg.beta = 1e-3
    lams = np.array([3e-2], np.float32)  # far from cfg.l1_lambda = 1e-4
    fused = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, 1, bt=32, interpret=True, betas=betas, lams=lams
    )
    s_k = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, 1))
    s_k, m_k = fused(s_k, batch, num_steps=10)
    loss = ensemble.build_loss(
        spec, cfg, 1, method="factored", betas=betas, lams=lams
    )
    groups = desmo.param_groups(desmo.init_params(spec))
    ref = ensemble.make_ensemble_chunk(loss, groups, cfg, 1)
    s_r = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, 1))
    s_r, m_r = ref(s_r, batch, num_steps=10)
    np.testing.assert_allclose(
        np.asarray(m_k["total_s"]), np.asarray(m_r["total_s"]),
        rtol=3e-4, atol=1e-6,
    )
    for k in s_r.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[k]), np.asarray(s_r.params[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )
