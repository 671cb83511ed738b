"""Mega-kernel training chunk (interpret mode) vs the scanned reference chunk.

The resident kernel must reproduce the factored-loss scan step-for-step:
same metrics trace, same final params/moments/scheduler state (up to the
~1e-5-relative hi/lo-split precision of its 3-pass bf16 contractions).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, pod, train
from desmo_tpu.io import synthetic
from desmo_tpu.models import desmo
from desmo_tpu.pallas import train_chunk


def problem(n=96, m=40, r=2, P=2, patience=300, sched_every=1, omega_init=1.0):
    cfg = configs.RunConfig(
        name="mk",
        variant="desmo",
        n=n,
        m=m,
        r=r,
        poly_order=P,
        omega_init=omega_init,
        lr_omega=1.0,
        num_epochs=40,
        patience=patience,
        sched_every=sched_every,
        log_every=100,
        checkpoint_every=1000,
    )
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    p = pod.pod(x, r)
    spec = desmo.DesmoSpec(n, m, r, P, omega_init)
    params = desmo.init_params(spec)
    batch = train_chunk.prepare_batch(x, p.modes, bt=32)
    return cfg, spec, params, batch


def run_both(cfg, spec, params, batch, steps):
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    ref_chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    s_ref = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=steps)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, m_k = fused(s_k, batch, num_steps=steps)
    return (s_ref, {k: np.asarray(v) for k, v in m_ref.items()}), (
        s_k,
        {k: np.asarray(v) for k, v in m_k.items()},
    )


def test_metrics_trace_matches_reference_chunk():
    cfg, spec, params, batch = problem()
    (s_ref, m_ref), (s_k, m_k) = run_both(cfg, spec, params, batch, steps=30)
    for key in ("rec", "ortho", "l1", "total"):
        np.testing.assert_allclose(m_k[key], m_ref[key], rtol=2e-4, atol=1e-6, err_msg=key)


def test_final_state_matches_reference_chunk():
    """Measured per-param deviation after 30 steps (2026-08-16, this exact
    problem): max rel 1.9e-5 (omega), all others <= 2.5e-6; trace 2.0e-5.
    Bounds are ~20x the measured values so genuine precision regressions in
    the in-kernel contractions cannot hide inside them."""
    cfg, spec, params, batch = problem()
    (s_ref, _), (s_k, _) = run_both(cfg, spec, params, batch, steps=30)
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]),
            np.asarray(s_ref.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )
    for key in s_ref.opt.mu:
        np.testing.assert_allclose(
            np.asarray(s_k.opt.mu[key]),
            np.asarray(s_ref.opt.mu[key]),
            rtol=5e-3,
            atol=1e-5,
            err_msg=f"mu.{key}",
        )
    assert int(s_k.opt.count) == int(s_ref.opt.count) == 30
    assert int(s_k.epoch) == 30
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )


def test_plateau_lr_drops_match():
    """Tiny patience forces LR reductions inside the chunk; the kernel's
    scheduler must fire on the same epochs with the same factors."""
    cfg, spec, params, batch = problem(patience=3, sched_every=2)
    (s_ref, m_ref), (s_k, m_k) = run_both(cfg, spec, params, batch, steps=40)
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )
    assert int(s_k.sched.num_bad) == int(s_ref.sched.num_bad)
    np.testing.assert_allclose(m_k["total"], m_ref["total"], rtol=5e-4, atol=1e-6)


def test_resume_from_mid_chunk_state():
    """Two 15-step kernel chunks == one 30-step reference chunk (state
    round-trips through the packing)."""
    cfg, spec, params, batch = problem()
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    ref_chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    s_ref = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_ref, _ = ref_chunk(s_ref, batch, num_steps=30)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, _ = fused(s_k, batch, num_steps=15)
    s_k, _ = fused(s_k, batch, num_steps=15)
    assert int(s_k.epoch) == 30
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]),
            np.asarray(s_ref.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )


def test_r4_poly3_shape_regime():
    """The cylinder shape regime (r=4, P=3, T=35, K=47) on small n/m."""
    cfg, spec, params, batch = problem(n=64, m=24, r=4, P=3)
    (s_ref, m_ref), (s_k, m_k) = run_both(cfg, spec, params, batch, steps=12)
    np.testing.assert_allclose(m_k["total"], m_ref["total"], rtol=5e-4, atol=1e-6)


def test_r8_max_rank_regime():
    """r=8 (the supports() ceiling): aug state uses lanes 0..8 — guards the
    compact transport's AUGW=16 slot width and the EMAT/gather tables at the
    maximum rank."""
    cfg, spec, params, batch = problem(n=64, m=24, r=8, P=2)
    assert train_chunk.supports(spec, cfg)
    (s_ref, m_ref), (s_k, m_k) = run_both(cfg, spec, params, batch, steps=12)
    np.testing.assert_allclose(m_k["total"], m_ref["total"], rtol=5e-4, atol=1e-6)
    # and through the streamed (emul) transport, bit-exact vs resident
    stf = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=True)
    s_s = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_s, m_s = stf(s_s, batch, num_steps=12)
    res = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=False)
    s_r = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_r, m_r = res(s_r, batch, num_steps=12)
    np.testing.assert_array_equal(np.asarray(m_s["total"]), np.asarray(m_r["total"]))
    for key in s_r.params:
        np.testing.assert_array_equal(
            np.asarray(s_s.params[key]), np.asarray(s_r.params[key]), err_msg=key
        )


def test_streamed_state_variant_matches_resident():
    """The streamed-state mode (state ping-ponged through HBM arrays, for
    spatial sizes whose full-width state exceeds VMEM) must reproduce the
    resident mode exactly — same kernel math, different state transport.

    On CPU this runs the interpret-safe 'emul' transport: identical kernel
    math and _parity_in/_parity_out arithmetic, with both parities carried in
    the output block instead of glued by input_output_aliases (which
    interpret mode cannot honor). On TPU it runs the real aliased transport.
    Measured: BIT-EXACT both ways (TPU 2026-08-16, n=1024/m=200/21 steps, odd
    parity: max |dev| 0.0; CPU emul: exact in CI below).
    """
    cfg, spec, params, batch = problem()
    res = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=False)
    stf = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=True)
    s_r = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_s = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_r, m_r = res(s_r, batch, num_steps=21)  # odd: exercises final parity 1
    s_s, m_s = stf(s_s, batch, num_steps=21)
    for key in ("rec", "ortho", "l1", "total"):
        np.testing.assert_array_equal(
            np.asarray(m_s[key]), np.asarray(m_r[key]), err_msg=key
        )
    for key in s_r.params:
        np.testing.assert_array_equal(
            np.asarray(s_s.params[key]), np.asarray(s_r.params[key]), err_msg=key
        )
    for key in s_r.opt.mu:
        np.testing.assert_array_equal(
            np.asarray(s_s.opt.mu[key]), np.asarray(s_r.opt.mu[key]), err_msg=f"mu.{key}"
        )
        np.testing.assert_array_equal(
            np.asarray(s_s.opt.nu[key]), np.asarray(s_r.opt.nu[key]), err_msg=f"nu.{key}"
        )


def fourier_problem(n=96, m=40, r=2, P=2, nf=3, patience=300, sched_every=1):
    from desmo_tpu.models import fourier

    cfg = configs.RunConfig(
        name="mkf",
        variant="fourier",
        n=n,
        m=m,
        r=r,
        poly_order=P,
        omega_init=1.0,
        lr_omega=1.0,
        n_fourier=nf,
        period_init=float(m),
        num_epochs=40,
        patience=patience,
        sched_every=sched_every,
        log_every=100,
        checkpoint_every=1000,
    )
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    p = pod.pod(x, r)
    spec = fourier.FourierSpec(n, m, r, P, 1.0, nf, cfg.period_init)
    params = fourier.init_params(spec)
    batch = train_chunk.prepare_batch(x, p.modes, bt=32)
    return cfg, spec, params, batch


def run_both_fourier(cfg, spec, params, batch, steps):
    from desmo_tpu.models import fourier

    loss_fn = fourier.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    ref_chunk = train.make_train_chunk(loss_fn, fourier.param_groups(params), cfg)
    s_ref = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_ref, m_ref = ref_chunk(s_ref, batch, num_steps=steps)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, m_k = fused(s_k, batch, num_steps=steps)
    return (s_ref, {k: np.asarray(v) for k, v in m_ref.items()}), (
        s_k,
        {k: np.asarray(v) for k, v in m_k.items()},
    )


def test_fourier_metrics_trace_matches_reference_chunk():
    cfg, spec, params, batch = fourier_problem()
    (s_ref, m_ref), (s_k, m_k) = run_both_fourier(cfg, spec, params, batch, steps=30)
    for key in ("rec", "ortho", "l1", "total"):
        np.testing.assert_allclose(m_k[key], m_ref[key], rtol=2e-4, atol=1e-6, err_msg=key)


def test_fourier_final_state_matches_reference_chunk():
    cfg, spec, params, batch = fourier_problem()
    (s_ref, _), (s_k, _) = run_both_fourier(cfg, spec, params, batch, steps=30)
    assert set(s_k.params) == set(s_ref.params)  # incl. period/trig_period
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]),
            np.asarray(s_ref.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )
    for key in s_ref.opt.mu:
        np.testing.assert_allclose(
            np.asarray(s_k.opt.mu[key]),
            np.asarray(s_ref.opt.mu[key]),
            rtol=5e-3,
            atol=1e-5,
            err_msg=f"mu.{key}",
        )
    assert int(s_k.opt.count) == int(s_ref.opt.count) == 30
    np.testing.assert_allclose(
        np.asarray(s_k.sched.lrs), np.asarray(s_ref.sched.lrs), rtol=1e-6
    )


def test_fourier_aneurysm_shape_regime():
    """The fourier_aneurysm coefficient regime (nF=30, ncoef=61) on small n/m.

    The kernel builds harmonics by recurrence from cos/sin(theta) while the
    scanned path evaluates cos(k*theta) directly — both fp32-faithful, so the
    first step matches tightly and the trajectories drift apart only through
    training dynamics (all-ones series coefficients make |B| ~ 61 here)."""
    cfg, spec, params, batch = fourier_problem(n=64, m=24, nf=30)
    (s_ref, m_ref), (s_k, m_k) = run_both_fourier(cfg, spec, params, batch, steps=10)
    np.testing.assert_allclose(m_k["total"][0], m_ref["total"][0], rtol=1e-6)
    np.testing.assert_allclose(m_k["total"], m_ref["total"], rtol=2e-3, atol=1e-6)


def test_fourier_resume_from_mid_chunk_state():
    cfg, spec, params, batch = fourier_problem()
    (s_ref, _), _ = run_both_fourier(cfg, spec, params, batch, steps=30)
    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, _ = fused(s_k, batch, num_steps=15)
    s_k, _ = fused(s_k, batch, num_steps=15)
    assert int(s_k.epoch) == 30
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k.params[key]),
            np.asarray(s_ref.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )


def test_fourier_streamed_matches_resident():
    """Streamed transport x fourier temporal side (the fourier_aneurysm
    combination): bit-exact vs the resident fourier kernel."""
    cfg, spec, params, batch = fourier_problem()
    res = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=False)
    stf = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=True)
    s_r = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_s = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_r, m_r = res(s_r, batch, num_steps=11)
    s_s, m_s = stf(s_s, batch, num_steps=11)
    np.testing.assert_array_equal(np.asarray(m_s["total"]), np.asarray(m_r["total"]))
    for key in s_r.params:
        np.testing.assert_array_equal(
            np.asarray(s_s.params[key]), np.asarray(s_r.params[key]), err_msg=key
        )


def test_supports_and_mode_selection():
    cfg, spec, params, batch = problem()
    assert train_chunk.supports(spec, cfg)
    assert train_chunk.resident_fits(spec, cfg)
    # aneurysm-scale: supported, but via the streamed mode
    from desmo_tpu import configs
    from desmo_tpu.models import desmo as dm

    acfg = configs.get("aneurysm")
    aspec = dm.DesmoSpec(acfg.n, acfg.m, acfg.r, acfg.poly_order, acfg.omega_init)
    assert train_chunk.supports(aspec, acfg)
    assert not train_chunk.resident_fits(aspec, acfg)
    # fourier is supported when the spec carries the series hyper-structure
    fcfg = configs.get("fourier_cylinder")
    assert not train_chunk.supports(aspec, fcfg)  # DesmoSpec: no n_fourier
    from desmo_tpu.models import fourier as fm

    fspec = fm.FourierSpec(
        fcfg.n, fcfg.m, fcfg.r, fcfg.poly_order, fcfg.omega_init,
        fcfg.n_fourier, fcfg.period_init,
    )
    assert train_chunk.supports(fspec, fcfg)
    facfg = configs.get("fourier_aneurysm")
    faspec = fm.FourierSpec(
        facfg.n, facfg.m, facfg.r, facfg.poly_order, facfg.omega_init,
        facfg.n_fourier, facfg.period_init,
    )
    assert train_chunk.supports(faspec, facfg)
    assert not train_chunk.resident_fits(faspec, facfg)  # streamed at 27000
    # ae stays unsupported
    import dataclasses as _dc

    assert not train_chunk.supports(spec, _dc.replace(cfg, variant="ae"))


def test_select_chunk_policy():
    """select_chunk is the single chunk policy: 'scan' always scans; 'auto'
    scans off-TPU; 'megakernel' forces the kernel (works in interpret on CPU
    for supported shapes) and raises clearly for unsupported ones."""
    import dataclasses

    cfg, spec, params, batch = problem()
    assert train_chunk.select_chunk(spec, dataclasses.replace(cfg, chunk_method="scan")) is None
    if jax.default_backend() != "tpu":
        assert train_chunk.select_chunk(spec, cfg) is None  # auto off-TPU
    forced = train_chunk.select_chunk(
        spec, dataclasses.replace(cfg, chunk_method="megakernel"), bt=32
    )
    assert forced is not None
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state, mets = forced(state, batch, num_steps=3)
    assert np.isfinite(np.asarray(mets["total"])).all()
    bad = dataclasses.replace(cfg, chunk_method="megakernel", variant="fourier")
    with pytest.raises(ValueError, match="megakernel"):
        train_chunk.select_chunk(spec, bad)


def test_ga_single_pass_converges_close_to_exact():
    """cfg.ga_single_pass drops the hi/lo correction passes on the A Gram
    only (cylinder preset default; -3.7 us/step measured, docs/RESULTS.md
    round 5). Contract: (a) the flag actually changes the compiled kernel
    (results differ from the 3-pass kernel beyond its ~1e-5 split
    precision), (b) the training trajectory still tracks the exact scan
    reference at the single-pass bf16 grade (~2e-3), i.e. the precision
    loss is confined to ga and does not destabilize the step."""
    import dataclasses

    cfg, spec, params, batch = problem()
    cfg1 = dataclasses.replace(cfg, ga_single_pass=True)
    (s_ref, m_ref), (s_k3, m_k3) = run_both(cfg, spec, params, batch, steps=30)
    _, (s_k1, m_k1) = run_both(cfg1, spec, params, batch, steps=30)
    # (a) not silently ignored: rec consumes ga through the tr(ga*gb) term
    # of the factored MSE (ortho would NOT work — it reads the aug Gram),
    # so its deviation from the scan reference must exceed the 3-pass
    # kernel's own ~1e-5-grade split precision
    d3 = np.max(np.abs(m_k3["rec"] - m_ref["rec"]))
    d1 = np.max(np.abs(m_k1["rec"] - m_ref["rec"]))
    assert d1 > 10 * max(d3, 1e-12), (d1, d3)
    # (b) still the same training trajectory at single-pass grade
    for key in ("rec", "ortho", "l1", "total"):
        np.testing.assert_allclose(
            m_k1[key], m_ref[key], rtol=5e-3, atol=1e-5, err_msg=key
        )
    for key in s_ref.params:
        np.testing.assert_allclose(
            np.asarray(s_k1.params[key]),
            np.asarray(s_ref.params[key]),
            rtol=1e-2,
            atol=1e-4,
            err_msg=key,
        )


def test_streamed_fourier_matches_resident():
    """The fourier_aneurysm hardware configuration streams its state; the
    compact emul transport must reproduce the resident fourier kernel
    bit-exactly (same in-kernel series recurrence, different state
    transport). Odd step count exercises the final-parity selection."""
    cfg, spec, params, batch = fourier_problem(n=96, m=40)
    res = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=False)
    stf = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, streamed=True)
    s_r = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_s = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_r, m_r = res(s_r, batch, num_steps=11)
    s_s, m_s = stf(s_s, batch, num_steps=11)
    for key in ("rec", "ortho", "l1", "total"):
        np.testing.assert_array_equal(
            np.asarray(m_s[key]), np.asarray(m_r[key]), err_msg=key
        )
    for key in s_r.params:
        np.testing.assert_array_equal(
            np.asarray(s_s.params[key]), np.asarray(s_r.params[key]), err_msg=key
        )


def test_sincos_domain_guard_engages():
    """Drive |omega*latent| beyond SINCOS_DOMAIN (~2.5e4) and assert the guard
    is enforced end-to-end: the kernel reports the breach in its "max_arg"
    metrics lane, and train.fit falls back to the scanned chunk (builtin trig)
    for the remaining epochs with numerics intact (finite trace, correct epoch
    accounting, telemetry surfaced on TrainResult)."""
    from desmo_tpu.models import desmo as desmo_model

    cfg, spec, params, batch = problem(omega_init=1e6)
    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    _, mets = fused(state, batch, num_steps=3)
    maxarg = np.asarray(mets["max_arg"])
    assert maxarg.shape == (3,)
    assert maxarg.max() > train_chunk.SINCOS_DOMAIN

    # telemetry is honest: step-0 value equals the host-side max |arg| over
    # the trig lanes (args = omega * POD-scaled latent)
    aug = np.asarray(batch["pod_modes"] * params["phi"].T)  # (n, r)
    host_max = np.max(np.abs(np.asarray(params["omega"])) * np.max(np.abs(aug), axis=0))
    np.testing.assert_allclose(maxarg[0], host_max, rtol=1e-5)

    logs = []
    loss_fn = desmo_model.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    result = train.fit(
        loss_fn, desmo_model.param_groups(params), cfg, params, batch,
        num_epochs=12, chunk_size=4, log=logs.append, chunk=fused,
    )
    assert any("fast-sincos domain" in line for line in logs)
    assert result.max_abs_trig_arg > train_chunk.SINCOS_DOMAIN
    assert int(result.state.epoch) == 12
    assert np.isfinite(result.history["total"]).all()
    assert len(result.history["total"]) == 12


def test_sincos_guard_quiet_in_domain():
    """A run inside the domain must not fall back (no warning) and must
    report its true (small) max arg."""
    from desmo_tpu.models import desmo as desmo_model

    cfg, spec, params, batch = problem()
    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=32, interpret=True)
    logs = []
    loss_fn = desmo_model.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    result = train.fit(
        loss_fn, desmo_model.param_groups(params), cfg, params, batch,
        num_epochs=8, chunk_size=4, log=logs.append, chunk=fused,
    )
    assert not any("fast-sincos" in line for line in logs)
    assert 0.0 < result.max_abs_trig_arg < train_chunk.SINCOS_DOMAIN
