"""End-to-end training: the compiled loop must converge on synthetic data."""

import numpy as np

import jax.numpy as jnp

from desmo_tpu import configs, losses, pod, train
from desmo_tpu.io import synthetic
from desmo_tpu.models import desmo


def small_cfg(**kw):
    base = dict(
        name="test",
        variant="desmo",
        n=96,
        m=64,
        r=2,
        poly_order=2,
        omega_init=1.0,
        lr_omega=1.0,  # omega_init is O(1) here, unlike the 1e4 presets
        beta=1e-3,
        l1_lambda=1e-5,
        num_epochs=2000,
        patience=500,
        sched_every=10,
        log_every=100,
        checkpoint_every=10_000,
    )
    base.update(kw)
    return configs.RunConfig(**base)


def make_problem(cfg):
    x = synthetic.separable_rank_k(cfg.n, cfg.m, k=cfg.r, seed=0)
    x = x - x.mean(axis=1, keepdims=True)
    p = pod.pod(x, cfg.r)
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    params = desmo.init_params(spec)
    batch = {"x": jnp.asarray(x), "pod_modes": p.modes}
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda)
    return x, spec, params, batch, loss_fn


def test_fit_reduces_loss_and_beats_pod():
    cfg = small_cfg()
    x, spec, params, batch, loss_fn = make_problem(cfg)
    res = train.fit(
        loss_fn, desmo.param_groups(params), cfg, params, batch, log=None, chunk_size=500
    )
    hist = res.history
    assert set(hist) >= {"rec", "ortho", "l1", "total"}
    assert len(hist["rec"]) == cfg.num_epochs
    assert hist["rec"][-1] < hist["rec"][0] * 1e-2
    # reconstruction should approach the (exactly rank-2, library-representable)
    # truth closely
    recon, _, _ = desmo.apply(res.state.params, batch["pod_modes"], spec)
    err = float(losses.relative_frobenius_error(batch["x"], recon))
    assert err < 0.15, err


def test_fit_resume_matches_uninterrupted():
    """Chunked + checkpoint-resumed training is bit-identical to one run."""
    cfg = small_cfg(num_epochs=100, sched_every=1, patience=10)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    groups = desmo.param_groups(params)

    res_full = train.fit(loss_fn, groups, cfg, params, batch, log=None, chunk_size=100)

    res_a = train.fit(
        loss_fn, groups, cfg, params, batch, num_epochs=40, log=None, chunk_size=40
    )
    res_b = train.fit(
        loss_fn,
        groups,
        cfg,
        None,
        batch,
        num_epochs=60,
        log=None,
        chunk_size=60,
        state=res_a.state,
    )
    for k in res_full.state.params:
        np.testing.assert_array_equal(
            np.asarray(res_full.state.params[k]), np.asarray(res_b.state.params[k])
        )
    assert int(res_b.state.epoch) == 100


def test_flat_chunk_matches_pytree_step():
    """The packed-buffer compiled chunk must be numerically equivalent to
    scanning the readable pytree step."""
    import jax

    cfg = small_cfg(num_epochs=50, sched_every=1, patience=5)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    groups = desmo.param_groups(params)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step = train.make_epoch_step(loss_fn, groups, cfg)
    state_ref = train.init_state(params, cfg)
    for _ in range(50):
        state_ref, m_ref = step(state_ref, batch)

    chunk = train.make_train_chunk(loss_fn, groups, cfg)
    state_fast = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state_fast, metrics = chunk(state_fast, batch, num_steps=50)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(state_ref.params[k]),
            np.asarray(state_fast.params[k]),
            rtol=2e-5,
            atol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(
        float(m_ref["total"]), float(np.asarray(metrics["total"])[-1]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_ref.sched.lrs), np.asarray(state_fast.sched.lrs), rtol=1e-6
    )
    assert int(state_fast.epoch) == 50
    assert int(state_fast.opt.count) == 50


def test_scheduler_reduces_lr_during_training():
    cfg = small_cfg(num_epochs=300, patience=5, sched_every=1)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    res = train.fit(
        loss_fn, desmo.param_groups(params), cfg, params, batch, log=None, chunk_size=300
    )
    lrs = np.asarray(res.state.sched.lrs)
    assert (lrs <= np.asarray(cfg.group_lrs, np.float32) * (1 + 1e-6)).all()


def test_graceful_preemption_checkpoints_and_resumes_bit_exact():
    """A preemption request stops fit() at the next chunk boundary, forces an
    off-cadence checkpoint, and flags the result; resuming the saved state
    for the remaining epochs is bit-identical to an uninterrupted run
    (SURVEY §5.3 — the reference dies mid-step under SLURM preemption)."""
    cfg = small_cfg(num_epochs=100, sched_every=1, patience=10)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    groups = desmo.param_groups(params)

    res_full = train.fit(loss_fn, groups, cfg, params, batch, log=None, chunk_size=100)

    saved = {}

    def ckpt(state, epoch):
        saved["state"] = state
        saved["epoch"] = epoch

    # SIGTERM arrives MID-RUN (during the first chunk's log processing);
    # fit stops at that chunk's boundary. A latch already set when fit
    # STARTS stops before the first chunk instead — pinned separately below.
    try:
        res_a = train.fit(
            loss_fn, groups, cfg, params, batch, chunk_size=20,
            checkpoint_fn=ckpt, log=lambda _line: train.request_preemption(),
        )
    finally:
        train.clear_preemption()
    # stopped at the FIRST chunk boundary, with the off-cadence checkpoint
    assert res_a.preempted
    assert int(res_a.state.epoch) == 20
    assert saved["epoch"] == 20  # checkpoint_every is 10_000 — forced save
    assert len(res_a.history["total"]) == 20

    res_b = train.fit(
        loss_fn, groups, cfg, None, batch, num_epochs=80, log=None,
        chunk_size=80, state=saved["state"],
    )
    assert not res_b.preempted
    for k in res_full.state.params:
        np.testing.assert_array_equal(
            np.asarray(res_full.state.params[k]), np.asarray(res_b.state.params[k])
        )


def test_sigterm_installs_and_requests_preemption():
    """install_preemption_handler: SIGTERM sets the preemption flag (and
    chains a previously-installed handler) instead of killing the process."""
    import os
    import signal

    seen = []
    prev = signal.getsignal(signal.SIGTERM)
    try:
        signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
        train.install_preemption_handler()
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for a self-signal on the main thread
        assert train.preemption_requested()
        assert seen == [signal.SIGTERM]  # chained
    finally:
        train.clear_preemption()
        signal.signal(signal.SIGTERM, prev)


def test_preemption_latch_is_consumed_by_the_honoring_fit():
    """One request = one stop: after a fit honors a preemption request, a
    later fit in the same process trains to completion (retry loops / preset
    sweeps must not inherit a sticky latch)."""
    cfg = small_cfg(num_epochs=40, sched_every=1, patience=10)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    groups = desmo.param_groups(params)

    try:
        res_a = train.fit(
            loss_fn, groups, cfg, params, batch, chunk_size=20,
            log=lambda _line: train.request_preemption(),
        )
        assert res_a.preempted and int(res_a.state.epoch) == 20
        assert not train.preemption_requested()  # consumed
        res_b = train.fit(loss_fn, groups, cfg, params, batch, log=None, chunk_size=20)
        assert not res_b.preempted and int(res_b.state.epoch) == 40
    finally:
        train.clear_preemption()


def test_preemption_latch_set_before_fit_stops_before_first_chunk():
    """A latch already raised when fit() STARTS (SIGTERM during an earlier
    warmup/probe phase, re-raised by the runner) must stop before the first
    chunk and still checkpoint the incoming state — the SIGTERM grace window
    must not be spent training a full chunk first."""
    cfg = small_cfg(num_epochs=100, sched_every=1, patience=10)
    _, spec, params, batch, loss_fn = make_problem(cfg)
    groups = desmo.param_groups(params)
    saved = {}

    def ckpt(state, epoch):
        saved["epoch"] = epoch
        saved["params"] = {k: np.asarray(v) for k, v in state.params.items()}

    train.request_preemption()
    try:
        res = train.fit(
            loss_fn, groups, cfg, params, batch, log=None, chunk_size=20,
            checkpoint_fn=ckpt,
        )
    finally:
        train.clear_preemption()
    assert res.preempted
    assert int(res.state.epoch) == 0
    assert res.history == {}
    assert saved["epoch"] == 0  # incoming state saved, off-cadence
    for k, v in params.items():
        np.testing.assert_array_equal(saved["params"][k], np.asarray(v))
    assert not train.preemption_requested()  # consumed
