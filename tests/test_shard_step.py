"""Sharded mega-kernel chunk (shard_map megastep + psum) vs single-device.

Runs on the virtual 8-CPU mesh from conftest; the Pallas megastep runs in
interpret mode per device, the 'space' psum is a real XLA collective."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, pod, train
from desmo_tpu.io import synthetic
from desmo_tpu.models import desmo
from desmo_tpu.pallas import shard_step, train_chunk
from desmo_tpu.parallel import make_mesh


def problem(n_space, n=256, m=40, r=2, P=2, bt=16):
    cfg = configs.RunConfig(
        name="shard",
        variant="desmo",
        n=n,
        m=m,
        r=r,
        poly_order=P,
        omega_init=1.0,
        lr_omega=1.0,
        num_epochs=40,
        patience=300,
        sched_every=1,
        log_every=100,
        checkpoint_every=1000,
    )
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    p = pod.pod(x, r)
    spec = desmo.DesmoSpec(n, m, r, P, 1.0)
    params = desmo.init_params(spec)
    batch = train_chunk.prepare_batch(x, p.modes, bt=bt, n_mult=bt * n_space)
    return cfg, spec, params, batch


def test_sharded_chunk_matches_single_device():
    n_space = 4
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    sharded = shard_step.make_sharded_fused_chunk(spec, cfg, mesh, bt=16)
    s_sh = jax.tree.map(jnp.array, train.init_state(params, cfg))
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = sharded(s_sh, batch, num_steps=25)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=16, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, m_k = fused(s_k, batch, num_steps=25)

    np.testing.assert_allclose(
        np.asarray(m_sh["total"]), np.asarray(m_k["total"]), rtol=5e-4, atol=1e-6
    )
    # fast-sincos telemetry: the pmax-of-device-maxes must agree with the
    # single-chip kernel's global max |omega*latent| per step, so train.fit's
    # domain guard protects mesh runs exactly like single-chip runs
    assert np.isfinite(np.asarray(m_sh["max_arg"])).all()
    np.testing.assert_allclose(
        np.asarray(m_sh["max_arg"]), np.asarray(m_k["max_arg"]),
        rtol=5e-4, atol=1e-6,
    )
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]),
            np.asarray(s_k.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(s_sh.sched.lrs), np.asarray(s_k.sched.lrs), rtol=1e-6
    )
    assert int(s_sh.epoch) == 25 and int(s_sh.opt.count) == 25


def test_sharded_chunk_keeps_phi_distributed():
    n_space = 8
    mesh = make_mesh(n_space=n_space, n_time=1)
    cfg, spec, params, batch = problem(n_space)
    sharded = shard_step.make_sharded_fused_chunk(spec, cfg, mesh, bt=16)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    with jax.sharding.set_mesh(mesh):
        state, mets = sharded(state, batch, num_steps=4)
    assert np.isfinite(np.asarray(mets["total"])).all()
    # the trained phi must come out sharded over 'space' (never gathered)
    shard = next(iter(state.params["phi"].addressable_shards))
    assert shard.data.shape == (cfg.r, cfg.n // n_space), (
        state.params["phi"].sharding
    )
    spec_out = state.params["phi"].sharding.spec
    assert "space" in str(spec_out)


def test_sharded_resume_roundtrip():
    """Two sharded 10-step chunks == one 20-step single-device kernel chunk."""
    n_space = 4
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    sharded = shard_step.make_sharded_fused_chunk(spec, cfg, mesh, bt=16)
    s_sh = jax.tree.map(jnp.array, train.init_state(params, cfg))
    with jax.sharding.set_mesh(mesh):
        s_sh, _ = sharded(s_sh, batch, num_steps=10)
        s_sh, _ = sharded(s_sh, batch, num_steps=10)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=16, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, _ = fused(s_k, batch, num_steps=20)
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]),
            np.asarray(s_k.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )


def test_supports_sharded():
    cfg, spec, params, batch = problem(4)
    assert shard_step.supports_sharded(spec, cfg)
    fcfg = configs.get("fourier_cylinder")
    assert not shard_step.supports_sharded(spec, fcfg)
    import dataclasses

    with pytest.raises(ValueError, match="sharded"):
        shard_step.make_sharded_fused_chunk(
            spec, dataclasses.replace(cfg, variant="ae"), make_mesh(n_space=4, n_time=2)
        )


def fourier_problem(n_space, n=256, m=40, r=2, P=2, nf=3, bt=16):
    from desmo_tpu.models import fourier as fourier_model

    cfg = configs.RunConfig(
        name="shard_f",
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
        patience=300,
        sched_every=1,
        log_every=100,
        checkpoint_every=1000,
    )
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    p = pod.pod(x, r)
    spec = fourier_model.FourierSpec(n, m, r, P, 1.0, nf, float(m))
    params = fourier_model.init_params(spec)
    batch = train_chunk.prepare_batch(x, p.modes, bt=bt, n_mult=bt * n_space)
    return cfg, spec, params, batch


def test_sharded_fourier_chunk_matches_single_device():
    """Fourier sharded chunk (series built per step under jax.vjp) vs the
    single-chip fourier mega-kernel (series built in-kernel by harmonic
    recurrence) — step parity over 25 steps."""
    n_space = 4
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = fourier_problem(n_space)
    sharded = shard_step.make_sharded_fused_chunk(spec, cfg, mesh, bt=16)
    s_sh = jax.tree.map(jnp.array, train.init_state(params, cfg))
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = sharded(s_sh, batch, num_steps=25)

    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=16, interpret=True)
    s_k = jax.tree.map(jnp.array, train.init_state(params, cfg))
    s_k, m_k = fused(s_k, batch, num_steps=25)

    np.testing.assert_allclose(
        np.asarray(m_sh["total"]), np.asarray(m_k["total"]), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_sh["max_arg"]), np.asarray(m_k["max_arg"]),
        rtol=5e-4, atol=1e-6,
    )
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]),
            np.asarray(s_k.params[key]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=key,
        )
    assert int(s_sh.epoch) == 25 and int(s_sh.opt.count) == 25


def test_sharded_sincos_guard_engages():
    """Mesh runs are covered by the fast-sincos domain guard exactly like
    single-chip runs: the sharded kernel reports max |omega*latent| (pmax
    over devices), and train.fit falls back to the scanned chunk for the
    remaining epochs with numerics intact."""
    from desmo_tpu.models import desmo as desmo_model
    from desmo_tpu.pallas import train_chunk as tc

    n_space = 4
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    params = dict(params, omega=params["omega"] * 1e6)  # out of domain
    sharded = shard_step.make_sharded_fused_chunk(spec, cfg, mesh, bt=16)
    loss_fn = desmo_model.build_loss(
        spec, cfg.beta, cfg.l1_lambda, method="factored"
    )
    logs = []
    # runner.run hands the kernel path param_shardings for exactly this
    # fallback: the rebuilt scan chunk must keep phi distributed, not
    # silently replicate it onto every device
    from desmo_tpu import parallel

    shardings = parallel.param_shardings(params, mesh, cfg.m)
    with jax.sharding.set_mesh(mesh):
        result = train.fit(
            loss_fn, desmo_model.param_groups(params), cfg, params, batch,
            num_epochs=12, chunk_size=4, log=logs.append, chunk=sharded,
            param_shardings=shardings,
        )
    assert any("fast-sincos domain" in line for line in logs)
    assert result.max_abs_trig_arg > tc.SINCOS_DOMAIN
    assert int(result.state.epoch) == 12
    assert np.isfinite(np.asarray(result.history["total"])).all()
    assert not result.state.params["phi"].sharding.is_fully_replicated


def test_sharded_ensemble_matches_single_chip_packed_kernel():
    """SEED-PACKED x SPACE-SHARDED: S lane-packed models per device megastep
    must reproduce the single-chip seed-packed mega-kernel per seed (same
    numerics class: 3-pass hi/lo contractions + fast sincos), with phi (and
    moments) left (S, r, n/d)-sharded over 'space'."""
    from desmo_tpu import ensemble

    n_space = 4
    S = 3
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    eparams = ensemble.init_params(spec, S, seed=1, phi_sigma=0.1)
    sharded = shard_step.make_sharded_fused_ensemble_chunk(
        spec, cfg, mesh, S, bt=16
    )
    s_sh = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = sharded(s_sh, batch, num_steps=25)

    single = train_chunk.make_fused_ensemble_chunk(spec, cfg, S, bt=16, interpret=True)
    s_k = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    s_k, m_k = single(s_k, batch, num_steps=25)

    np.testing.assert_allclose(
        np.asarray(m_sh["total_s"]), np.asarray(m_k["total_s"]),
        rtol=5e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m_sh["max_arg"]), np.asarray(m_k["max_arg"]),
        rtol=5e-4, atol=1e-6,
    )
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]), np.asarray(s_k.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(s_sh.sched.lrs), np.asarray(s_k.sched.lrs), rtol=1e-6
    )
    assert int(s_sh.epoch) == 25 and int(s_sh.opt.count) == 25
    for tree in (s_sh.params, s_sh.opt.mu, s_sh.opt.nu):
        shard = next(iter(tree["phi"].addressable_shards))
        assert shard.data.shape == (S, spec.r, cfg.n // n_space), (
            tree["phi"].sharding
        )


def test_sharded_fourier_ensemble_matches_single_chip_packed_kernel():
    """Fourier variant of the sharded seed-packed chunk (per-seed series +
    learnable periods built per step under jax.vjp) vs the single-chip
    packed fourier kernel, at DISTINCT per-seed periods."""
    from desmo_tpu import ensemble

    n_space = 4
    S = 3
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = fourier_problem(n_space)
    eparams = ensemble.init_params(
        spec, S, seed=1, phi_sigma=0.1,
        periods=[float(cfg.m), cfg.m / 2.0, cfg.m / 3.0],
    )
    sharded = shard_step.make_sharded_fused_ensemble_chunk(
        spec, cfg, mesh, S, bt=16
    )
    s_sh = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = sharded(s_sh, batch, num_steps=20)

    single = train_chunk.make_fused_ensemble_chunk(spec, cfg, S, bt=16, interpret=True)
    s_k = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    s_k, m_k = single(s_k, batch, num_steps=20)

    np.testing.assert_allclose(
        np.asarray(m_sh["total_s"]), np.asarray(m_k["total_s"]),
        rtol=5e-4, atol=1e-6,
    )
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]), np.asarray(s_k.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    assert not s_sh.params["phi"].sharding.is_fully_replicated


def test_supports_sharded_packed():
    cfg, spec, params, batch = problem(4)
    assert shard_step.supports_sharded_packed(spec, cfg, 3)
    assert not shard_step.supports_sharded_packed(spec, cfg, 99)  # lanes
    import dataclasses

    acfg = dataclasses.replace(cfg, variant="ae")
    assert not shard_step.supports_sharded_packed(spec, acfg, 2)
    with pytest.raises(ValueError, match="seed-packed"):
        shard_step.make_sharded_fused_ensemble_chunk(
            spec, acfg, make_mesh(n_space=4, n_time=2), 2
        )


def test_seed_lane_geometry_matches_kernel_tables():
    """The sharded megastep's jax-side reductions and build_constants'
    in-kernel tables must share ONE seed-block lane layout (round-4 review
    fix: both now derive from train_chunk.seed_lane_geometry). Pin the
    equivalence of the SEEDSEL/AUGSEL/WMASK sel row-blocks to the geometry
    across the packable (r, P, S) corners."""
    L = train_chunk.LANES
    for r, P, S in [(2, 2, 2), (2, 2, 8), (4, 2, 4), (4, 3, 2)]:
        geo = train_chunk.seed_lane_geometry(r, P, S)
        sel = np.asarray(train_chunk.build_constants(r, P, n_seeds=S).sel,
                         np.float32)
        np.testing.assert_array_equal(sel[3 * L : 4 * L, :S], geo.seedsel)
        np.testing.assert_array_equal(sel[4 * L : 5 * L, :S], geo.augsel)
        np.testing.assert_array_equal(sel[5 * L : 6 * L, :], geo.wmask)
        # the one-hot selectors agree with the block-index vectors
        T = train_chunk.library.num_poly_terms(r, P)
        K = T + 3 * r
        lane = np.arange(L)
        np.testing.assert_array_equal(
            geo.seedsel.argmax(axis=1)[geo.inblk], geo.wide_seed[geo.inblk]
        )
        np.testing.assert_array_equal(geo.inblk, lane < S * K)
        aug = geo.augmask.astype(bool)
        np.testing.assert_array_equal(
            geo.augsel.argmax(axis=1)[aug], geo.aug_seed[aug]
        )


def test_sharded_ensemble_isolates_diverged_seed_metrics():
    """Same divergence isolation contract as the single-chip packed kernel
    (test_ensemble_kernel.py): a NaN seed must not poison the other seeds'
    total_s through the jax-side SEEDSEL/AUGSEL bucketing or the zero-masked
    cross-seed Gram products — ensemble.fit's containment attributes blame
    from per-seed finiteness at the first bad step on mesh runs too."""
    from desmo_tpu import ensemble

    n_space = 4
    S = 3
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    eparams = ensemble.init_params(spec, S, seed=1, phi_sigma=0.1)
    eparams = dict(eparams, phi=eparams["phi"].at[1].set(jnp.nan))
    sharded = shard_step.make_sharded_fused_ensemble_chunk(
        spec, cfg, mesh, S, bt=16
    )
    s_sh = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    with jax.sharding.set_mesh(mesh):
        _, m_sh = sharded(s_sh, batch, num_steps=2)
    for key in ("rec", "ortho", "total_s"):
        row = np.asarray(m_sh[key])[0]  # step 0: only seed 1 is bad yet
        assert not np.isfinite(row[1]), key
        assert np.isfinite(row[0]) and np.isfinite(row[2]), (key, row)


def test_sharded_ensemble_hyper_sweep_matches_single_chip():
    """Hyperparameter multi-start composes with the mesh: the sharded
    seed-packed megastep under HETEROGENEOUS per-seed (beta, lam, lr_scale)
    must reproduce the single-chip packed kernel under the same sweep (the
    per-seed weights ride geometry lane splats jax-side, svec rows in-kernel
    — two independent implementations of the same per-seed contract)."""
    from desmo_tpu import ensemble

    n_space = 4
    S = 3
    mesh = make_mesh(n_space=n_space, n_time=2)
    cfg, spec, params, batch = problem(n_space)
    eparams = ensemble.init_params(spec, S, seed=1, phi_sigma=0.1)
    betas = np.array([1e-3, 5e-3, 1e-2], np.float32)
    lams = np.array([1e-4, 1e-5, 1e-3], np.float32)
    scales = np.array([1.0, 0.5, 2.0], np.float32)  # powers of two: exact
    sharded = shard_step.make_sharded_fused_ensemble_chunk(
        spec, cfg, mesh, S, bt=16, betas=betas, lams=lams
    )
    s_sh = jax.tree.map(
        jnp.array, ensemble.init_state(eparams, cfg, S, lr_scales=scales)
    )
    with jax.sharding.set_mesh(mesh):
        s_sh, m_sh = sharded(s_sh, batch, num_steps=25)

    single = train_chunk.make_fused_ensemble_chunk(
        spec, cfg, S, bt=16, interpret=True, betas=betas, lams=lams
    )
    s_k = jax.tree.map(
        jnp.array, ensemble.init_state(eparams, cfg, S, lr_scales=scales)
    )
    s_k, m_k = single(s_k, batch, num_steps=25)

    np.testing.assert_allclose(
        np.asarray(m_sh["total_s"]), np.asarray(m_k["total_s"]),
        rtol=5e-4, atol=1e-6,
    )
    for key in s_k.params:
        np.testing.assert_allclose(
            np.asarray(s_sh.params[key]), np.asarray(s_k.params[key]),
            rtol=5e-4, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(s_sh.sched.lrs), np.asarray(s_k.sched.lrs), rtol=1e-6
    )
    # the per-seed LR rows start at the scaled values
    np.testing.assert_allclose(
        np.asarray(s_sh.sched.lrs)[:, 0] > 0,
        np.ones(S, bool),
    )
