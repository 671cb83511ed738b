"""AE mega-kernel (`pallas.ae_chunk`) parity vs the scanned trainer.

The kernel runs the ENTIRE AE chunk (encoder/decoder funnel fwd+bwd, the
desmo dictionary block on the latent, factored AE-MSE, Adamax, plateau
scheduler) inside one pallas_call; here it is checked in interpret mode
against `train.make_train_chunk` on the factored AE loss — same optimizer,
same scheduler, same metric definitions (reference semantics:
DESMO_AE/DESMO_Cylinder_AE-Final.py:629-768,859-871).

Parity uses a tame omega_init: at the preset's omega_init=1e4 the trig
arguments are ~1e4 so a 1-ulp latent difference flips sin() signs — any
fp-association difference amplifies chaotically and NO reassociated
implementation can match bitwise (verified: decoder grads match exactly;
encoder mismatches appear only through the trig chain). With omega ~ 1 the
two paths track to ~1e-5 over 25 steps.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, train
from desmo_tpu.io import synthetic
from desmo_tpu.models import autoencoder as ae
from desmo_tpu.pallas import ae_chunk, train_chunk


def _tiny_cfg(**kw):
    return dataclasses.replace(
        configs.get("ae_cylinder"),
        n=64,
        m=40,
        num_epochs=25,
        patience=5,
        sched_every=1,
        log_every=100,
        checkpoint_every=1000,
        omega_init=1.0,
        lr_coef=1e-3,
        lr_z=1e-3,
        lr_omega=1e-2,
        **kw,
    )


def _run_both(cfg, steps, bt=16):
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = jnp.asarray(synthetic.cylinder_wake(cfg.n, cfg.m, seed=0))
    params = ae.init_params_live(spec)

    batch = train_chunk.prepare_batch(x, np.zeros((cfg.r, cfg.n)), bt=bt)
    chunk = ae_chunk.make_ae_fused_chunk(spec, cfg, bt=bt, interpret=True)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state_k, mets_k = chunk(state, batch, num_steps=steps)

    loss = ae.build_loss(
        spec, cfg.beta, cfg.l1_lambda, cfg.ae_beta, method="factored"
    )
    sc = train.make_train_chunk(loss, ae.param_groups(params), cfg)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state_s, mets_s = sc(
        state,
        {"x": x, "x_sq": jnp.sum(x**2)},
        num_steps=steps,
    )
    return (state_k, mets_k), (state_s, mets_s)


class TestAEChunkParity:
    @pytest.fixture(scope="class")
    def runs(self):
        return _run_both(_tiny_cfg(), steps=25)

    def test_metrics_track_scan(self, runs):
        (_, mets_k), (_, mets_s) = runs
        for k in ("rec", "ortho", "l1", "ae", "total"):
            a = np.asarray(mets_k[k])
            b = np.asarray(mets_s[k])
            np.testing.assert_allclose(
                a, b, rtol=5e-4, atol=1e-7, err_msg=f"metric {k!r}"
            )

    def test_params_track_scan(self, runs):
        # Two-tier bound: ReLU-kink flips (a 1-ulp pre-activation difference
        # flips one unit's gradient for one step) can nudge isolated decoder
        # bias elements to ~8e-3 over 25 steps; the bulk tracks to <5e-3.
        (state_k, _), (state_s, _) = runs
        for key in sorted(state_s.params):
            a = np.asarray(state_k.params[key])
            b = np.asarray(state_s.params[key])
            scale = np.max(np.abs(b)) + 1e-12
            d = np.abs(a - b) / scale
            assert d.max() < 2e-2, f"param {key!r}: max rel-to-max {d.max():.3e}"
            assert (d < 5e-3).mean() >= 0.95, (
                f"param {key!r}: {(d >= 5e-3).mean():.1%} of elements above 5e-3"
            )

    def test_optimizer_and_scheduler_state(self, runs):
        (state_k, _), (state_s, _) = runs
        assert int(state_k.epoch) == int(state_s.epoch)
        assert int(state_k.opt.count) == int(state_s.opt.count)
        np.testing.assert_allclose(
            np.asarray(state_k.sched.lrs),
            np.asarray(state_s.sched.lrs),
            rtol=1e-6,
        )
        assert int(state_k.sched.num_bad) == int(state_s.sched.num_bad)

    def test_max_arg_metric_present(self, runs):
        (_, mets_k), _ = runs
        # omega ~ 1, latents O(1): the telemetry lane must be small + finite
        ma = np.asarray(mets_k["max_arg"])
        assert np.all(np.isfinite(ma)) and ma.max() < 100.0


def test_ae_supports_gate():
    cfg = configs.get("ae_cylinder")
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    assert ae_chunk.ae_supports(spec, cfg, bt=512)
    # non-AE variants are the desmo mega-kernel's domain
    dcfg = configs.get("cylinder")
    from desmo_tpu.models.desmo import DesmoSpec

    dspec = DesmoSpec(dcfg.n, dcfg.m, dcfg.r, dcfg.poly_order)
    assert not ae_chunk.ae_supports(dspec, dcfg, bt=512)
    # shrunken VMEM budget rejects
    assert not ae_chunk.ae_supports(spec, cfg, bt=512, vmem_budget_mb=10.0)


def test_select_chunk_megakernel_routes_ae():
    cfg = dataclasses.replace(_tiny_cfg(), chunk_method="megakernel")
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    chunk = train_chunk.select_chunk(spec, cfg, bt=16)
    assert chunk is not None


def test_multiblock_funnel_matches_single_block():
    """bs < n_pad: the REAL ae_cylinder shape streams the funnel in 4 row
    blocks (n_pad=4096, bs=1024), but the class parity above runs with
    n_pad == bs == 64 — a single block per step. Pin the cross-block
    accumulation (gbias/gmid/gsq) and the shared 'big' buffer
    read-then-overwrite discipline: 4 blocks must reproduce the single-block
    step numerics (same data, same steps; only fp association of the
    block-sum order differs)."""
    cfg = _tiny_cfg()
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = jnp.asarray(synthetic.cylinder_wake(cfg.n, cfg.m, seed=0))
    params = ae.init_params_live(spec)
    batch = train_chunk.prepare_batch(x, np.zeros((cfg.r, cfg.n)), bt=16)

    outs = {}
    for bs in (None, 16):  # None -> single 64-row block; 16 -> 4 blocks
        chunk = ae_chunk.make_ae_fused_chunk(
            spec, cfg, bt=16, interpret=True, bs=bs
        )
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        outs[bs] = chunk(state, batch, num_steps=10)
    (s1, m1), (s4, m4) = outs[None], outs[16]
    for k in ("rec", "ortho", "l1", "ae", "total"):
        np.testing.assert_allclose(
            np.asarray(m4[k]), np.asarray(m1[k]), rtol=1e-5, atol=1e-8,
            err_msg=f"metric {k!r}",
        )
    for key in sorted(s1.params):
        a, b = np.asarray(s4.params[key]), np.asarray(s1.params[key])
        scale = np.max(np.abs(b)) + 1e-12
        # block-sum association feeds Adamax's sign-sensitive mu/nu ratio:
        # isolated elements drift ~1e-4 rel over 10 steps (same mechanism as
        # the 5e-3 vs-scan bound above, an order tighter here)
        assert np.max(np.abs(a - b)) / scale < 2e-3, key


def test_call_time_tiling_revalidated():
    """A batch padded with a different n_mult than ae_supports assumed must
    be REJECTED, not silently stream-truncated: the init/out row stacks are
    tiled by n_tiles = n_pad // bt with exact division required."""
    cfg = _tiny_cfg()
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = jnp.asarray(synthetic.cylinder_wake(cfg.n, cfg.m, seed=0))
    params = ae.init_params_live(spec)
    # n=64 padded to n_mult=80 -> n_tiles=5: 768 % 5 != 0
    batch = train_chunk.prepare_batch(x, np.zeros((cfg.r, cfg.n)), bt=16, n_mult=80)
    chunk = ae_chunk.make_ae_fused_chunk(spec, cfg, bt=16, interpret=True)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    with pytest.raises(ValueError, match="tiled"):
        chunk(state, batch, num_steps=2)
