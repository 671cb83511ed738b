"""Space-sharded mega-kernel training chunk: the fused tile kernel under
``shard_map``, one optimizer step per kernel launch.

The resident/streamed mega-kernel (``train_chunk``) runs a whole chunk in one
``pallas_call`` — single-chip by construction, since the temporal (B) update
needs the Gram/cross reductions of ALL spatial rows every step. This module
provides the multi-chip form of the same math (SURVEY §5.7 — new capability,
the reference is strictly single-GPU):

* each device owns ``n/d`` row-tiles of x_hi/x_lo/pod/phi and runs ONE
  Pallas "megastep" kernel per optimizer step — exactly the mega-kernel's
  per-tile forward/gradient math (lane gathers, 3-pass hi/lo contractions),
  accumulating its local partials (ax, ga, auga, acc);
* the (K, m) / (K, K) / (8, 128) partials are ``psum``'d over the ``'space'``
  mesh axis — small, riding ICI;
* the replicated temporal/coefficient/omega/scheduler updates and the
  row-local phi Adamax update run as plain fused XLA ops between launches,
  with the same hi/lo bf16 split arithmetic as the kernel.

Semantics match the single-chip mega-kernel step-for-step: the kernel's
"delayed" phi sweep (applied at the next visit of each tile) is equivalent to
updating phi at the END of each step — nothing reads phi in between — which
is what this module does, so no terminal sweep is needed.

Per-step cost = one pallas launch (~45 us) + one psum + 1/d of the compute,
so sharding pays off at aneurysm scale (n=27000), not on the small cylinder.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from desmo_tpu import library
from desmo_tpu.pallas.train_chunk import (
    LANES,
    _BT_DEFAULT,
    _AXD,
    _B1,
    _B2,
    _EPS,
    _STD,
    _XBD,
    _d,
    _dot2,
    _dot3,
    _fast_sincos,
    _pack_aug,
    _pack_b,
    _pack_b_seeds,
    _pack_wide_row,
    _pack_wide_row_seeds,
    _round_up,
    seed_lane_geometry,
    _split,
    _unpack_aug,
    _unpack_b,
    _unpack_b_seeds,
    _unpack_wide_row,
    _unpack_wide_row_seeds,
    build_constants,
    supports,
    supports_packed,
)


def _make_step_kernel(r, P_, T, n, m, n_tiles, bt):
    """One optimizer step's forward + gradient partials over the LOCAL tiles.

    Mirrors the mega-kernel's tile block (train_chunk._make_kernel): same
    gathers, same 3-pass hi/lo contractions, same dl assembly. Outputs are
    the local dl rows plus the (ax, ga, auga, acc) partial reductions this
    device contributes."""
    nm = float(n * m)

    def kernel(
        sel_ref, gidx_ref, mrow_ref, pod_ref, xhi_ref, xlo_ref,
        phi_ref, bhs_ref, bls_ref, gb_ref, crow_ref,
        dl_ref, ax_ref, ga_ref, auga_ref, acc_ref,
    ):
        t = pl.program_id(0)

        def SEL(i):
            return sel_ref[i * LANES : (i + 1) * LANES, :]

        polymask = mrow_ref[0:1, :]
        trigmask = mrow_ref[1:2, :]
        msin = mrow_ref[2:3, :]
        mcos = mrow_ref[3:4, :]
        mtanh = mrow_ref[4:5, :]

        def gather(x, row):
            idx = jnp.broadcast_to(gidx_ref[row : row + 1, :], x.shape)
            return jnp.take_along_axis(x, idx, axis=1)

        @pl.when(t == 0)
        def _():
            ax_ref[:] = jnp.zeros_like(ax_ref)
            ga_ref[:] = jnp.zeros_like(ga_ref)
            auga_ref[:] = jnp.zeros_like(auga_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        crow = crow_ref[0:1, :]
        omrow = crow_ref[3:4, :]
        xh = xhi_ref[:]
        xl = xlo_ref[:]
        xb = _d(xh, bhs_ref[:], _XBD) + _d(xh, bls_ref[:], _XBD) + _d(xl, bhs_ref[:], _XBD)
        pod = pod_ref[:]
        aug = pod * phi_ref[:]
        ah, al = _split(aug)

        prod = gather(aug, 0)
        for p in range(1, P_):
            prod = prod * gather(aug, p)
        theta = prod * polymask
        args = prod * (omrow * trigmask)
        Sn, Cs = _fast_sincos(args)
        Th = jnp.tanh(args)
        maskb = aug[:, 0:1]
        basis = (Sn * msin + Cs * mcos + Th * mtanh) * maskb
        D = theta + basis
        A = D * crow
        Ah, Al = _split(A)

        m_pad = xh.shape[1]
        rhs_h = jnp.concatenate([xh, Ah], axis=1)
        rhs_l = jnp.concatenate([xl, Al], axis=1)
        axga = _d(Ah, rhs_h, _AXD) + _d(Ah, rhs_l, _AXD) + _d(Al, rhs_h, _AXD)
        ax_ref[:] = ax_ref[:] + axga[:, :m_pad]
        ga_ref[:] = ga_ref[:] + axga[:, m_pad:]
        auga_ref[:] = auga_ref[:] + (
            _d(ah, ah, _AXD) + _d(ah, al, _AXD) + _d(al, ah, _AXD)
        )
        dA = (2.0 / nm) * (_dot3(A, gb_ref[:], _STD) - xb)
        dD = dA * crow
        dtheta = dD * polymask
        deriv = Cs * msin - Sn * mcos + (1.0 - Th * Th) * mtanh
        darg = dD * trigmask * deriv

        acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(dA * D, axis=0, keepdims=True)
        latrep = prod * trigmask
        acc_ref[1:2, :] = acc_ref[1:2, :] + jnp.sum(darg * latrep, axis=0, keepdims=True)
        # fast-sincos domain telemetry (same contract as the single-chip
        # mega-kernel's metrics lane 4): running max |omega*latent| over this
        # device's tiles — row 2 is max-combined, NOT summed, downstream
        acc_ref[2:3, :] = jnp.maximum(
            acc_ref[2:3, :], jnp.max(jnp.abs(args), axis=0, keepdims=True)
        )

        dl = _dot2(darg * omrow, SEL(0))
        # poly backward: one EMAT matmul + guarded division (see train_chunk)
        s_poly = _dot2(dtheta * theta, SEL(2))
        augmask = mrow_ref[6:7, :]
        denom = jnp.where(aug == 0.0, 1.0, aug)
        dl_ref[:] = dl + jnp.where(aug == 0.0, 0.0, s_poly / denom) * augmask

    return kernel


@functools.lru_cache(maxsize=8)
def _build_step_call(r, P_, n, m, n_loc, m_pad, bt, interpret, n_seeds=1):
    """The per-device megastep pallas_call. The kernel body is LANE-BLIND:
    with ``n_seeds > 1`` the seed-blocked constants (``build_constants``)
    make the same gathers/masks/contractions process S packed models —
    exactly the single-chip ensemble kernel's packing (ensemble.py)."""
    T = library.num_poly_terms(r, P_)
    n_tiles = n_loc // bt
    consts = build_constants(r, P_, n_seeds=n_seeds)
    kernel = _make_step_kernel(r, P_, T, n, m, n_tiles, bt)

    def tmap(t):
        return (t, 0)

    def cmap(t):
        return (0, 0)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((consts.n_sel * LANES, LANES), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, LANES), tmap, memory_space=pltpu.VMEM),  # pod
            pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),  # x hi
            pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),  # x lo
            pl.BlockSpec((bt, LANES), tmap, memory_space=pltpu.VMEM),  # phi
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # b hi
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # b lo
            pl.BlockSpec((LANES, LANES), cmap, memory_space=pltpu.VMEM),  # gb
            pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # crow
        ],
        out_specs=[
            pl.BlockSpec((bt, LANES), tmap, memory_space=pltpu.VMEM),  # dl
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # ax
            pl.BlockSpec((LANES, LANES), cmap, memory_space=pltpu.VMEM),  # ga
            pl.BlockSpec((LANES, LANES), cmap, memory_space=pltpu.VMEM),  # auga
            pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_loc, LANES), jnp.float32),
            jax.ShapeDtypeStruct((LANES, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
        ),
        interpret=interpret,
    )
    return call, consts


def supports_sharded(spec, cfg) -> bool:
    """The sharded chunk covers exactly the variants the single-chip
    mega-kernel does (desmo + fourier, same lane bounds) — one predicate,
    no duplicated variant logic."""
    return supports(spec, cfg)


def make_sharded_fused_chunk(
    spec, cfg, mesh, bt: int = _BT_DEFAULT, interpret: Optional[bool] = None,
):
    """Build ``chunk(state, batch, num_steps) -> (state, metrics)`` running
    each step as one per-device Pallas megastep + a 'space' psum.

    Same contract as ``train.make_train_chunk`` / the single-chip mega-kernel.
    ``batch`` must come from ``prepare_batch(x, pod, bt, n_mult=bt*d)`` so
    every device owns whole (bt, m_pad) tiles. Parameters: phi and its Adamax
    moments stay row-sharded over 'space' for the entire chunk; B/coef/omega/
    scheduler state is replicated (identical update computed on every device
    from the psummed reductions).

    Fourier variant: the series parameters (z/z_trig coefficients + learnable
    periods) are carried natively and the packed temporal matrix B is
    materialized per step via ``fourier_model.fourier_series_batch`` under
    ``jax.vjp`` — the analytic dL/dB from the psummed reductions chains
    through the exact same series construction as the scanned path, so
    numerics stay in the same class as the desmo branch.
    """
    if not supports_sharded(spec, cfg):
        raise ValueError(f"sharded mega-kernel does not support preset {cfg.name!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape["space"]
    r, P_ = spec.r, spec.poly_order
    T = spec.num_poly_terms
    n, m = spec.n, spec.m
    beta = float(cfg.beta)
    lam = float(cfg.l1_lambda)
    b1, b2, eps = _B1, _B2, _EPS
    fourier = getattr(cfg, "variant", "desmo") == "fourier"
    if fourier:
        from desmo_tpu.models import fourier as fourier_model

        tgrid = jnp.asarray(fourier_model.t_points(m))
        _SKEYS = ("z", "z_trig", "period", "trig_period")

    from desmo_tpu import optim, train

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def chunk(state, batch, num_steps: int):
        x_hi, x_lo = batch["x_hi"], batch["x_lo"]
        n_pad, m_pad = x_hi.shape
        if n_pad % (bt * d):
            raise ValueError(
                f"x padding {n_pad} not a multiple of bt*d={bt * d}; build the "
                "batch with prepare_batch(..., n_mult=bt*n_space)"
            )
        call, consts = _build_step_call(r, P_, n, m, n_pad // d, m_pad, bt, interpret)
        x_sq = batch["x_sq"]
        rowmask = (jnp.arange(n_pad) < n).astype(jnp.float32)
        pod_fw = _pack_aug(batch["pod_modes"].T, n_pad, lane0=rowmask)
        params, opt, sched0 = state.params, state.opt, state.sched
        phi0 = _pack_aug(params["phi"], n_pad, lane0=jnp.ones((n_pad,), jnp.float32))
        mu0 = _pack_aug(opt.mu["phi"], n_pad)
        nu0 = _pack_aug(opt.nu["phi"], n_pad)
        if fourier:
            b0 = {k: params[k] for k in _SKEYS}
            bmu0 = {k: opt.mu[k] for k in _SKEYS}
            bnu0 = {k: opt.nu[k] for k in _SKEYS}
        else:
            b0 = _pack_b(params["z"], params["z_trig"], T, m_pad)
            bmu0 = _pack_b(opt.mu["z"], opt.mu["z_trig"], T, m_pad)
            bnu0 = _pack_b(opt.nu["z"], opt.nu["z_trig"], T, m_pad)
        crow0 = jnp.stack(
            [
                _pack_wide_row(params["c"], params["c_trig"], T, r),
                _pack_wide_row(opt.mu["c"], opt.mu["c_trig"], T, r),
                _pack_wide_row(opt.nu["c"], opt.nu["c_trig"], T, r),
                _pack_wide_row(jnp.zeros((T,)), params["omega"], T, r),
                _pack_wide_row(jnp.zeros((T,)), opt.mu["omega"], T, r),
                _pack_wide_row(jnp.zeros((T,)), opt.nu["omega"], T, r),
            ]
        )
        sel = jnp.asarray(consts.sel)
        gidx = jnp.asarray(consts.gidx)
        mrow = jnp.asarray(consts.mrow)
        offdiag = sel[LANES : 2 * LANES, :].astype(jnp.float32)
        coefmask = jnp.asarray(
            (np.arange(LANES) < T + 3 * r).astype(np.float32)
        )[None, :]

        def body(
            xhi, xlo, pod, phi, mu, nu, b, bmu, bnu, crow,
            lrs0, best0, num_bad0, count0, epoch0, x_sq,
        ):
            sched = optim.PlateauState(lrs=lrs0, best=best0, num_bad=num_bad0)

            def step(carry, _):
                phi, mu, nu, b, bmu, bnu, crow, count, sched, epoch = carry
                if fourier:
                    def build_b(sp):
                        zv = fourier_model.fourier_series_batch(
                            sp["z"], sp["period"], tgrid
                        )
                        ztv = fourier_model.fourier_series_batch(
                            sp["z_trig"], sp["trig_period"], tgrid
                        )
                        return _pack_b(zv, ztv, T, m_pad)

                    bser, build_vjp = jax.vjp(build_b, b)
                else:
                    bser = b
                bh, bl = _split(bser)
                gb = _d(bh, bh, _XBD) + _d(bh, bl, _XBD) + _d(bl, bh, _XBD)
                dl, ax, ga, auga, acc = call(
                    sel, gidx, mrow, pod, xhi, xlo, phi, bh, bl, gb, crow,
                )
                # acc row 2 is a per-device MAX (|trig arg| telemetry) — read
                # it with pmax BEFORE the additive psum renders it meaningless
                marg = jax.lax.pmax(jnp.max(acc[2:3, :]), "space")
                ax, ga, auga, acc = jax.lax.psum((ax, ga, auga, acc), "space")

                rec = (jnp.sum(ga * gb) - 2.0 * jnp.sum(ax * bser) + x_sq) / (n * m)
                orthov = 0.5 * jnp.sum(jnp.abs(auga * offdiag))
                l1v = jnp.sum(jnp.abs(crow[0:1, :]) * coefmask)
                total = rec + beta * orthov + lam * l1v
                sign = jnp.sign(auga) * offdiag

                count = count + 1
                bias = 1.0 - b1 ** count.astype(jnp.float32)
                lr_coef, lr_phi, lr_z, lr_om = (
                    sched.lrs[0], sched.lrs[1], sched.lrs[2], sched.lrs[3],
                )

                gB = (2.0 / (n * m)) * (_dot3(ga, bser, _STD) - ax)
                if fourier:
                    (gsp,) = build_vjp(gB)
                    lr_of = {
                        "z": lr_z, "z_trig": lr_z,
                        "period": sched.lrs[4], "trig_period": sched.lrs[4],
                    }
                    bmu_n = {
                        k: b1 * bmu[k] + (1.0 - b1) * gsp[k] for k in b
                    }
                    bnu_n = {
                        k: jnp.maximum(b2 * bnu[k], jnp.abs(gsp[k]) + eps)
                        for k in b
                    }
                    b_n = {
                        k: b[k] - (lr_of[k] / bias) * bmu_n[k] / bnu_n[k]
                        for k in b
                    }
                else:
                    bmu_n = b1 * bmu + (1.0 - b1) * gB
                    bnu_n = jnp.maximum(b2 * bnu, jnp.abs(gB) + eps)
                    b_n = b - (lr_z / bias) * bmu_n / bnu_n

                gC = acc[0:1, :] + lam * jnp.sign(crow[0:1, :]) * coefmask
                cmu = b1 * crow[1:2, :] + (1.0 - b1) * gC
                cnu = jnp.maximum(b2 * crow[2:3, :], jnp.abs(gC) + eps)
                c_n = crow[0:1, :] - (lr_coef / bias) * cmu / cnu
                gO = acc[1:2, :]
                omu = b1 * crow[4:5, :] + (1.0 - b1) * gO
                onu = jnp.maximum(b2 * crow[5:6, :], jnp.abs(gO) + eps)
                om_n = crow[3:4, :] - (lr_om / bias) * omu / onu
                crow_n = jnp.concatenate([c_n, cmu, cnu, om_n, omu, onu], axis=0)

                # row-local phi update from THIS step's grads (equivalent to
                # the mega-kernel's delayed next-visit sweep: nothing reads
                # phi in between)
                aug_old = pod * phi
                dlo = _dot2(aug_old, sign.astype(jnp.bfloat16))
                g = (dl + beta * dlo) * pod
                mu_n = b1 * mu + (1.0 - b1) * g
                nu_n = jnp.maximum(b2 * nu, jnp.abs(g) + eps)
                phi_n = phi - (lr_phi / bias) * mu_n / nu_n

                sched_n = train._sched_update(sched, total, epoch, cfg)
                mets = jnp.stack([rec, orthov, l1v, total, marg])
                return (
                    phi_n, mu_n, nu_n, b_n, bmu_n, bnu_n, crow_n, count,
                    sched_n, epoch + 1,
                ), mets

            carry = (phi, mu, nu, b, bmu, bnu, crow, count0, sched, epoch0)
            (phi, mu, nu, b, bmu, bnu, crow, count, sched, epoch), mets = jax.lax.scan(
                step, carry, None, length=num_steps
            )
            return phi, mu, nu, b, bmu, bnu, crow, sched.lrs, sched.best, sched.num_bad, count, epoch, mets

        shmap = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("space", None), P("space", None), P("space", None),
                P("space", None), P("space", None), P("space", None),
                P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(
                P("space", None), P("space", None), P("space", None),
                P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
            ),
            check_vma=False,
        )
        (phio, muo, nuo, bfw, bmufw, bnufw, crow_o, lrs, best, num_bad,
         count, epoch, mets) = shmap(
            x_hi, x_lo, pod_fw, phi0, mu0, nu0, b0, bmu0, bnu0, crow0,
            sched0.lrs, sched0.best, sched0.num_bad, opt.count, state.epoch,
            x_sq,
        )

        c, c_trig = _unpack_wide_row(crow_o[0], T, r)
        mc, mct = _unpack_wide_row(crow_o[1], T, r)
        nc, nct = _unpack_wide_row(crow_o[2], T, r)
        _, omega = _unpack_wide_row(crow_o[3], T, r)
        _, momega = _unpack_wide_row(crow_o[4], T, r)
        _, nomega = _unpack_wide_row(crow_o[5], T, r)
        new_params = {"phi": _unpack_aug(phio, r, n), "c": c, "c_trig": c_trig, "omega": omega}
        new_mu = {"phi": _unpack_aug(muo, r, n), "c": mc, "c_trig": mct, "omega": momega}
        new_nu = {"phi": _unpack_aug(nuo, r, n), "c": nc, "c_trig": nct, "omega": nomega}
        if fourier:
            new_params.update(bfw)
            new_mu.update(bmufw)
            new_nu.update(bnufw)
        else:
            for tree, packed in ((new_params, bfw), (new_mu, bmufw), (new_nu, bnufw)):
                zv, ztv = _unpack_b(packed, T, r, m)
                tree["z"], tree["z_trig"] = zv, ztv
        new_state = train.TrainState(
            params={k: new_params[k] for k in state.params},
            opt=optim.AdamaxState(
                count=count,
                mu={k: new_mu[k] for k in state.params},
                nu={k: new_nu[k] for k in state.params},
            ),
            sched=optim.PlateauState(lrs=lrs, best=best, num_bad=num_bad),
            epoch=epoch,
        )
        metrics = {
            "rec": mets[:, 0], "ortho": mets[:, 1],
            "l1": mets[:, 2], "total": mets[:, 3],
            # max |omega*latent| per step: train.fit's fast-sincos domain
            # guard consumes this exactly as it does the single-chip kernel's
            "max_arg": mets[:, 4],
        }
        return new_state, metrics

    return chunk


def supports_sharded_packed(spec, cfg, n_seeds: int) -> bool:
    """Sharded seed-packed coverage = the sharded single-seed kernel's
    variants x the single-chip packed kernel's lane/seed bounds (one shared
    predicate each — no re-rolled policy)."""
    return supports_sharded(spec, cfg) and supports_packed(spec, cfg, n_seeds)


def make_sharded_fused_ensemble_chunk(
    spec, cfg, mesh, n_seeds: int, bt: int = _BT_DEFAULT,
    interpret: Optional[bool] = None, betas=None, lams=None,
):
    """SEED-PACKED x SPACE-SHARDED: S lane-packed models per device megastep.

    The two padding dimensions multiply — seeds occupy the MXU lanes the
    hardware pads anyway (``ensemble.py``), while each seed's spatial rows
    shard over the 'space' mesh axis (``make_sharded_fused_chunk``). The
    per-device Pallas kernel is IDENTICAL to the single-seed megastep: the
    seed-blocked constants (``train_chunk.build_constants(n_seeds=S)``) make
    the same lane-blind gathers/masks/contractions process S packed models;
    only the jax-side reductions/updates become per-seed (block-diagonal
    Gram sums via the SEEDSEL/AUGSEL tables, per-seed LR rows, a vmapped
    per-seed ReduceLROnPlateau).

    Drop-in replacement for ``ensemble.make_ensemble_chunk``: ``state`` is
    the stacked TrainState of ``ensemble.init_state`` ((S, ...) leaves,
    (S, G) scheduler rows); metrics carry per-seed ``rec/ortho/l1/total_s``
    (num_steps, S), summed ``total`` and the global ``max_arg`` telemetry.
    Per-seed trajectories match the packed scan chunk (and therefore S
    independent single-seed runs) — asserted in
    ``tests/test_shard_step.py::test_sharded_ensemble_*``.
    """
    from desmo_tpu import optim, train
    from desmo_tpu.configs import GROUP_ORDER

    S = int(n_seeds)
    if not supports_sharded_packed(spec, cfg, S):
        raise ValueError(
            f"sharded seed-packed kernel does not support preset "
            f"{cfg.name!r} at S={S} (see supports_sharded_packed)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape["space"]
    r, P_ = spec.r, spec.poly_order
    T = spec.num_poly_terms
    K = T + 3 * r
    n, m = spec.n, spec.m
    beta = float(cfg.beta)
    lam = float(cfg.l1_lambda)
    # per-seed loss weights (hyperparameter multi-start, ensemble.resolve_
    # hypers): seed vectors + their lane splats over the shared geometry.
    # With uniform weights every splat equals the scalar constant on each
    # lane where the other factor is nonzero (dlo is zero off aug lanes,
    # sign(crow)*inblk zero off seed blocks), so the arithmetic stays
    # bit-identical to the scalar form.
    betas_v = np.full((S,), beta, np.float32) if betas is None else np.asarray(betas, np.float32)
    lams_v = np.full((S,), lam, np.float32) if lams is None else np.asarray(lams, np.float32)
    if betas_v.shape != (S,) or lams_v.shape != (S,):
        raise ValueError(
            f"betas/lams must have shape ({S},), got {betas_v.shape}/{lams_v.shape}"
        )
    b1, b2, eps = _B1, _B2, _EPS
    fourier = getattr(cfg, "variant", "desmo") == "fourier"
    if fourier:
        from desmo_tpu.models import fourier as fourier_model

        tgrid = jnp.asarray(fourier_model.t_points(m))
        _SKEYS = ("z", "z_trig", "period", "trig_period")

    # static lane geometry — shared with build_constants' in-kernel tables
    # (ONE layout definition; see train_chunk.seed_lane_geometry)
    geo = seed_lane_geometry(r, P_, S)
    wide_seed = geo.wide_seed
    inblk = geo.inblk.astype(np.float32)
    aug_seed = geo.aug_seed
    augmask = geo.augmask
    seedsel = geo.seedsel
    augsel = geo.augsel
    wmask = geo.wmask

    vplateau = jax.vmap(
        lambda st, t: optim.plateau_step(
            st, t, patience=cfg.patience, factor=cfg.sched_factor,
            min_lr=cfg.sched_min_lr,
        )
    )

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def chunk(state, batch, num_steps: int):
        x_hi, x_lo = batch["x_hi"], batch["x_lo"]
        n_pad, m_pad = x_hi.shape
        if n_pad % (bt * d):
            raise ValueError(
                f"x padding {n_pad} not a multiple of bt*d={bt * d}; build "
                "the batch with prepare_batch(..., n_mult=bt*n_space)"
            )
        call, consts = _build_step_call(
            r, P_, n, m, n_pad // d, m_pad, bt, interpret, S
        )
        x_sq = batch["x_sq"]
        rowmask = (jnp.arange(n_pad) < n).astype(jnp.float32)
        pod_rep = jnp.tile(batch["pod_modes"].T, (S, 1))  # (S*r, n), shared
        pod_fw = _pack_aug(pod_rep, n_pad, lane0=rowmask)
        params, opt, sched0 = state.params, state.opt, state.sched
        phi0 = _pack_aug(
            params["phi"].reshape(S * r, n), n_pad,
            lane0=jnp.ones((n_pad,), jnp.float32),
        )
        mu0 = _pack_aug(opt.mu["phi"].reshape(S * r, n), n_pad)
        nu0 = _pack_aug(opt.nu["phi"].reshape(S * r, n), n_pad)
        if fourier:
            b0 = {k: params[k] for k in _SKEYS}
            bmu0 = {k: opt.mu[k] for k in _SKEYS}
            bnu0 = {k: opt.nu[k] for k in _SKEYS}
        else:
            b0 = _pack_b_seeds(params["z"], params["z_trig"], T, K, m_pad)
            bmu0 = _pack_b_seeds(opt.mu["z"], opt.mu["z_trig"], T, K, m_pad)
            bnu0 = _pack_b_seeds(opt.nu["z"], opt.nu["z_trig"], T, K, m_pad)
        zt = jnp.zeros((S, T))
        crow0 = jnp.stack(
            [
                _pack_wide_row_seeds(params["c"], params["c_trig"], T, K, r),
                _pack_wide_row_seeds(opt.mu["c"], opt.mu["c_trig"], T, K, r),
                _pack_wide_row_seeds(opt.nu["c"], opt.nu["c_trig"], T, K, r),
                _pack_wide_row_seeds(zt, params["omega"], T, K, r),
                _pack_wide_row_seeds(zt, opt.mu["omega"], T, K, r),
                _pack_wide_row_seeds(zt, opt.nu["omega"], T, K, r),
            ]
        )
        sel = jnp.asarray(consts.sel)
        gidx = jnp.asarray(consts.gidx)
        mrow = jnp.asarray(consts.mrow)
        offdiag = sel[LANES : 2 * LANES, :].astype(jnp.float32)
        seedsel_j = jnp.asarray(seedsel)
        augsel_j = jnp.asarray(augsel)
        wmask_j = jnp.asarray(wmask)
        inblk_j = jnp.asarray(inblk)
        wide_seed_j = jnp.asarray(wide_seed)
        aug_seed_j = jnp.asarray(aug_seed)
        augmask_j = jnp.asarray(augmask)
        betas_j = jnp.asarray(betas_v)
        lams_j = jnp.asarray(lams_v)
        beta_aug_l = jnp.asarray(betas_v[aug_seed] * augmask)  # (LANES,)
        lam_wide_l = jnp.asarray(lams_v[wide_seed] * inblk)  # (LANES,)

        def body(
            xhi, xlo, pod, phi, mu, nu, b, bmu, bnu, crow,
            lrs0, best0, num_bad0, count0, epoch0, x_sq,
        ):
            sched = optim.PlateauState(lrs=lrs0, best=best0, num_bad=num_bad0)

            def step(carry, _):
                phi, mu, nu, b, bmu, bnu, crow, count, sched, epoch = carry
                if fourier:
                    def build_b(sp):
                        zv = fourier_model.fourier_series_batch(
                            sp["z"], sp["period"], tgrid
                        )
                        ztv = fourier_model.fourier_series_batch(
                            sp["z_trig"], sp["trig_period"], tgrid
                        )
                        return _pack_b_seeds(zv, ztv, T, K, m_pad)

                    bser, build_vjp = jax.vjp(build_b, b)
                else:
                    bser = b
                bh, bl = _split(bser)
                gb_full = _d(bh, bh, _XBD) + _d(bh, bl, _XBD) + _d(bl, bh, _XBD)
                # block-diagonal Gram: cross-seed B correlations must not
                # leak into gradients (per-seed objectives stay independent)
                gb = gb_full * wmask_j
                dl, ax, ga, auga, acc = call(
                    sel, gidx, mrow, pod, xhi, xlo, phi, bh, bl, gb, crow,
                )
                marg = jax.lax.pmax(jnp.max(acc[2:3, :]), "space")
                ax, ga, auga, acc = jax.lax.psum((ax, ga, auga, acc), "space")

                # per-seed losses: gb is block-masked, so ga*gb is already
                # block-diagonal — row-sums bucket by seed via SEEDSEL.
                # Divergence isolation (same scheme as the single-chip
                # kernel's _seed_reduce): a diverged seed's inf/NaN must not
                # leak into other seeds' metrics through NaN*0, neither in
                # the zero-masked cross-seed products nor in the one-hot
                # selection matmuls — ensemble.fit attributes blame from
                # per-seed finiteness of total_s at the first bad step
                def _bucket(rows, selmat):
                    fin = jnp.abs(rows) < jnp.inf
                    clean = jnp.where(fin, rows, 0.0) @ selmat
                    bad = jnp.where(fin, 0.0, 1.0) @ selmat
                    return jnp.where(bad > 0.0, float("nan"), clean)

                gg_rows = jnp.sum(jnp.where(gb == 0.0, 0.0, ga * gb), axis=1)
                cross_rows = jnp.sum(ax * bser, axis=1)
                rec_s = (
                    _bucket(gg_rows, seedsel_j)
                    - 2.0 * _bucket(cross_rows, seedsel_j) + x_sq
                ) / (n * m)
                od_rows = jnp.sum(
                    jnp.where(offdiag == 0.0, 0.0, jnp.abs(auga * offdiag)),
                    axis=1,
                )
                ortho_s = 0.5 * _bucket(od_rows, augsel_j)
                l1_s = _bucket(jnp.abs(crow[0, :]) * inblk_j, seedsel_j)
                total_s = rec_s + betas_j * ortho_s + lams_j * l1_s
                total = jnp.sum(total_s)
                sign = jnp.sign(auga) * offdiag

                count = count + 1
                bias = 1.0 - b1 ** count.astype(jnp.float32)
                # per-seed LR rows splat onto their lanes (GROUP_ORDER:
                # 0=coef, 1=phi, 2=z, 3=omega, 4=period)
                lr_coef_l = sched.lrs[:, 0][wide_seed_j] * inblk_j
                lr_phi_l = sched.lrs[:, 1][aug_seed_j] * augmask_j
                lr_z_l = sched.lrs[:, 2][wide_seed_j] * inblk_j
                lr_om_l = sched.lrs[:, 3][wide_seed_j] * inblk_j

                gB = (2.0 / (n * m)) * (_dot3(ga * wmask_j, bser, _STD) - ax)
                if fourier:
                    (gsp,) = build_vjp(gB)
                    lr_col = {
                        "z": sched.lrs[:, 2], "z_trig": sched.lrs[:, 2],
                        "period": sched.lrs[:, 4],
                        "trig_period": sched.lrs[:, 4],
                    }
                    bmu_n = {k: b1 * bmu[k] + (1.0 - b1) * gsp[k] for k in b}
                    bnu_n = {
                        k: jnp.maximum(b2 * bnu[k], jnp.abs(gsp[k]) + eps)
                        for k in b
                    }
                    b_n = {
                        k: b[k]
                        - (
                            lr_col[k].reshape((-1,) + (1,) * (b[k].ndim - 1))
                            / bias
                        )
                        * bmu_n[k] / bnu_n[k]
                        for k in b
                    }
                else:
                    bmu_n = b1 * bmu + (1.0 - b1) * gB
                    bnu_n = jnp.maximum(b2 * bnu, jnp.abs(gB) + eps)
                    b_n = b - (lr_z_l[:, None] / bias) * bmu_n / bnu_n

                gC = acc[0:1, :] + lam_wide_l[None, :] * jnp.sign(crow[0:1, :])
                cmu = b1 * crow[1:2, :] + (1.0 - b1) * gC
                cnu = jnp.maximum(b2 * crow[2:3, :], jnp.abs(gC) + eps)
                c_n = crow[0:1, :] - (lr_coef_l[None, :] / bias) * cmu / cnu
                gO = acc[1:2, :]
                omu = b1 * crow[4:5, :] + (1.0 - b1) * gO
                onu = jnp.maximum(b2 * crow[5:6, :], jnp.abs(gO) + eps)
                om_n = crow[3:4, :] - (lr_om_l[None, :] / bias) * omu / onu
                crow_n = jnp.concatenate([c_n, cmu, cnu, om_n, omu, onu], axis=0)

                aug_old = pod * phi
                dlo = _dot2(aug_old, sign.astype(jnp.bfloat16))
                # dlo is zero off aug lanes (within-seed offdiag sign matrix),
                # so the per-seed beta lane splat is exact
                g = (dl + beta_aug_l[None, :] * dlo) * pod
                mu_n = b1 * mu + (1.0 - b1) * g
                nu_n = jnp.maximum(b2 * nu, jnp.abs(g) + eps)
                phi_n = phi - (lr_phi_l[None, :] / bias) * mu_n / nu_n

                stepped = vplateau(sched, total_s)
                do_sched = epoch % cfg.sched_every == 0
                sched_n = jax.tree.map(
                    lambda a, bb: jnp.where(do_sched, a, bb), stepped, sched
                )
                mets4 = jnp.stack([rec_s, ortho_s, l1_s, total_s])
                return (
                    phi_n, mu_n, nu_n, b_n, bmu_n, bnu_n, crow_n, count,
                    sched_n, epoch + 1,
                ), (mets4, marg)

            carry = (phi, mu, nu, b, bmu, bnu, crow, count0, sched, epoch0)
            (phi, mu, nu, b, bmu, bnu, crow, count, sched, epoch), (mets4, marg) = (
                jax.lax.scan(step, carry, None, length=num_steps)
            )
            return (
                phi, mu, nu, b, bmu, bnu, crow,
                sched.lrs, sched.best, sched.num_bad, count, epoch,
                mets4, marg,
            )

        b_spec = jax.tree.map(lambda _: P(), b0)
        shmap = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("space", None), P("space", None), P("space", None),
                P("space", None), P("space", None), P("space", None),
                b_spec, b_spec, b_spec,
                P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(
                P("space", None), P("space", None), P("space", None),
                b_spec, b_spec, b_spec, P(),
                P(), P(), P(), P(), P(), P(), P(),
            ),
            check_vma=False,
        )
        (phio, muo, nuo, bfw, bmufw, bnufw, crow_o, lrs, best, num_bad,
         count, epoch, mets4, marg) = shmap(
            x_hi, x_lo, pod_fw, phi0, mu0, nu0, b0, bmu0, bnu0, crow0,
            sched0.lrs, sched0.best, sched0.num_bad, opt.count, state.epoch,
            x_sq,
        )

        def unaug(fw):
            return _unpack_aug(fw, S * r, n).reshape(S, r, n)

        c, c_trig = _unpack_wide_row_seeds(crow_o[0], S, T, K, r)
        mc, mct = _unpack_wide_row_seeds(crow_o[1], S, T, K, r)
        nc, nct = _unpack_wide_row_seeds(crow_o[2], S, T, K, r)
        _, omega = _unpack_wide_row_seeds(crow_o[3], S, T, K, r)
        _, momega = _unpack_wide_row_seeds(crow_o[4], S, T, K, r)
        _, nomega = _unpack_wide_row_seeds(crow_o[5], S, T, K, r)
        new_params = {"phi": unaug(phio), "c": c, "c_trig": c_trig, "omega": omega}
        new_mu = {"phi": unaug(muo), "c": mc, "c_trig": mct, "omega": momega}
        new_nu = {"phi": unaug(nuo), "c": nc, "c_trig": nct, "omega": nomega}
        if fourier:
            new_params.update(bfw)
            new_mu.update(bmufw)
            new_nu.update(bnufw)
        else:
            for tree, packed in (
                (new_params, bfw), (new_mu, bmufw), (new_nu, bnufw),
            ):
                zv, ztv = _unpack_b_seeds(packed, S, T, K, r, m)
                tree["z"], tree["z_trig"] = zv, ztv
        new_state = train.TrainState(
            params={k: new_params[k] for k in state.params},
            opt=optim.AdamaxState(
                count=count,
                mu={k: new_mu[k] for k in state.params},
                nu={k: new_nu[k] for k in state.params},
            ),
            sched=optim.PlateauState(lrs=lrs, best=best, num_bad=num_bad),
            epoch=epoch,
        )
        metrics = {
            "rec": mets4[:, 0], "ortho": mets4[:, 1], "l1": mets4[:, 2],
            "total_s": mets4[:, 3],
            "total": jnp.sum(mets4[:, 3], axis=1),
            "max_arg": marg,
        }
        return new_state, metrics

    return chunk
