"""The AE-variant mega-kernel: an ENTIRE SINDy-autoencoder training chunk in
ONE ``pallas_call``.

STATUS (round 4): built, parity-tested (``tests/test_ae_chunk.py``), and
measured SLOWER than the scanned path on hardware — 1,035-1,109 us/step vs
451 us (ae_cylinder, bt=512). Root cause (isolated microbenchmarks,
docs/RESULTS.md "AE mega-kernel"): Mosaic executes a serial chain of narrow
(128-lane) dependent dots at ~11 us per (4096,128)x(128,128) layer+relu —
~2.5x the pure-MXU floor — and neither row-blocking (bs 128..4096 flat),
single-pass bf16 dots, nor lane-packing 4 row-blocks into block-diagonal
(512,512) layers (measured 118 us vs 99 us for 9 layers) changes it; the
funnel must be traversed 3x per step (forward, backward recompute, backward)
so the in-kernel MLP floor (~400 us) alone exceeds XLA's entire 297 us MLP
side. ``select_chunk`` therefore keeps the scanned chunk for AE in 'auto';
``chunk_method='megakernel'`` opts in explicitly. The kernel remains the
ablation harness that produced those numbers (``ablate(**switches)`` below —
same ``_ABLATE`` pattern as ``train_chunk``, plus the cache clear the lru'd
builder needs) and a working proof of the factored in-kernel AE design:

Design rationale (what one kernel buys IF the funnel were free): the scanned
AE step costs ~451 us, of which ~97 us is the per-step op-graph overhead of
the XLA runtime (measured irreducible: a near-empty loss still pays it, and
``lax.scan``'s ``unroll`` does not amortize it on this runtime), ~57 us the
dictionary-side op soup, and ~297 us the MLP — whose two dominant GEMM sites
(the m->256 encoder layer and the 256->m decoder layer) run at ~74% of the
3-pass MXU peak but drag an ~89 us funnel + per-op overhead tail. Running
the whole chunk inside one kernel removes the op-graph floor and lets the
AE-MSE be computed in FACTORED form so only FOUR (n x m x 256)-class GEMMs
remain per step:

    X @ W0          (encoder forward)
    D6^T @ X        (factored decoder-MSE cross term)
    X @ V6^T        (decoder-gradient cross term)
    X^T @ dpre1     (encoder weight gradient)

where D6 is the 256-wide last hidden decoder activation. The (n, m) decode is
NEVER materialized: with S_dd = D6^T D6, S_dX = D6^T X, VV = V6 V6^T,
s_d = 1^T D6 and xcol = 1^T X,

    ||D6 V6 + 1 c6 - X||^2 = <S_dd, VV> - 2 <S_dX, V6> + 2 (s_d V6) . c6
                             - 2 xcol . c6 + n ||c6||^2 + ||X||^2
    dV6 = k (S_dd V6 + s_d^T (x) c6 - S_dX),   k = 2 ae_beta / (n m)
    dD6 = k (D6 VV + 1 (x) (c6 V6^T) - X V6^T)

— algebraically exact (fp association differs), the same trick
``losses.factored_mse`` applies to the dictionary product. The reference
computes the same objective by materializing the decode
(``DESMO_AE/DESMO_Cylinder_AE-Final.py:629-768,859-871``).

Structure: grid ``(num_steps + 2, 3, n_tiles)`` — major step 0 loads the
initial state (tiled init streams fill the VMEM-resident weight stacks; a
plain s==0-compute design would read W0 before all its tiles landed), steps
1..num_steps each run THREE sweeps over the X row-tiles (X is streamed as
pre-split bf16 hi/lo planes three times per step; ~48 MB/step for the
cylinder, hidden under ~150 us of MXU), and step num_steps+1 streams the
final state out:

* phase 0 — per tile: ``h1[tile] = relu(X_t @ W0 + b0)``. At the last tile
  the WHOLE MLP funnel runs at full height in row sub-blocks (per-op overhead
  makes per-tile funnel layers ~8x more expensive than full-height ones):
  encoder funnel -> latent, masked aug layout, full-height latent Gram
  (-> s1, s2 for the EXACT ortho gradient — the two-sweep structure is what
  makes the full-batch ortho term computable without a delayed-gradient
  approximation), decoder funnel -> D6 (stashed), S_dd, s_d.
* phase 1 — per tile: the desmo dictionary block on the stashed latent
  (gathers, fast sincos, 3-pass ax/ga contractions, dA -> dlat rows) plus the
  AE cross GEMMs (S_dX accumulation, the dD6 tile). At the last tile, the
  full-height funnel BACKWARD: decoder chain from dD6, ortho + dictionary
  latent gradients injected at the latent, encoder chain down to dpre1
  (stored over dD6's buffer — their live ranges are disjoint), producing
  every funnel weight/bias gradient as single full-height GEMMs.
* phase 2 — per tile: ``gW0 += X_t^T @ dpre1[tile]``. At the last tile, ALL
  Adamax updates (W0/funnel/V6/c6 from the accumulated gradients; B, coef
  row, omega row, plateau scheduler — verbatim the desmo mega-kernel
  finalize), and the metrics row (rec, ortho, l1, total, max|omega*latent|,
  ae).

Numerics match the scanned path's class: every X/Gram contraction is the
hi/lo-split 3-pass bf16 scheme (``dual_gemm._dot3``; XLA ``Precision.HIGH``),
trig via ``_fast_sincos`` (builtin tanh), ReLU gradients zero at 0. AE
reference quirks preserved: the tanh channel is computed but EXCLUDED from
the dictionary sum, the L1, and therefore all tanh-parameter gradients
(``...py:761,867-869``); the ortho term is s1*s2/n^2 (the collapsed (n, n)
outer MSE, ``...py:861``). Parity with ``train.make_train_chunk`` on the
same loss is asserted in ``tests/test_ae_chunk.py`` (interpret mode, CPU CI).

Supported: resident-state only (the ae_cylinder scale; ``ae_supports``
checks the VMEM budget), r == 2, the reference funnel widths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desmo_tpu import library
from desmo_tpu.models.autoencoder import ENCODER_WIDTHS
from desmo_tpu.configs import GROUP_ORDER
from desmo_tpu.pallas.train_chunk import (
    LANES,
    _B1,
    _B2,
    _BT_DEFAULT,
    _EPS,
    _L_BEST,
    _L_BIAS_USED,
    _L_COUNT,
    _L_EPOCH,
    _L_LRPHI_USED,
    _L_NUMBAD,
    _L_POW,
    _LR0,
    _SCHED_THRESHOLD,
    _STD,
    _AXD,
    _XBD,
    _d,
    _dot2,
    _dot3,
    _fast_sincos,
    _lane,
    _pack_wide_row,
    _round_up,
    _split,
    _unpack_wide_row,
    build_constants,
)

AUGW = 16  # aug-space stash width (latent occupies lanes 1..r, r == 2)
H1W = 256  # first-hidden width (reference funnel: m -> 256 -> ... -> 2)
_NSQ = 10  # (128,128) weight slots: enc layers 2..6 then dec layers 0..4
_NL = len(ENCODER_WIDTHS) + 1  # 7 layers per side

_IG_COEF = GROUP_ORDER.index("coef")
_IG_Z = GROUP_ORDER.index("z")
_IG_OMEGA = GROUP_ORDER.index("omega")

# Trace-time ablation switches: timing is data-independent, so stubbing a
# block with cheap fills isolates its cost. Set keys here AND call
# _build_ae_call.cache_clear() before rebuilding the chunk (the call is
# lru_cached on shapes, not on this dict) — see ablate() below for the safe
# entry point. The measured attribution tables live in docs/RESULTS.md
# ("AE mega-kernel"); the shipped-path AE ablation (XLA scanned step, stub
# differencing) is scripts/ae_ablate.py.
_ABLATE: dict = {}


def ablate(**switches):
    """Enable ablation switches for the NEXT chunk build (stubs a kernel
    block with cheap fills to isolate its cost; numerics become meaningless).
    Call with no arguments to restore the real kernel. Clears the shape cache
    so a rebuilt chunk actually picks the switches up."""
    _ABLATE.clear()
    _ABLATE.update(switches)
    _build_ae_call.cache_clear()


def _xdot3(xh, xl, w32, dims=_STD):
    """3-pass product of pre-split bf16 X planes against an f32 operand —
    identical decomposition to ``_dot3`` (XLA ``Precision.HIGH``)."""
    wh, wl = _split(w32)
    return _d(xh, wh, dims) + _d(xh, wl, dims) + _d(xl, wh, dims)


def _make_ae_kernel(r, P, T, n, m, num_steps, n_tiles, bt, bs, beta, lam,
                    ae_beta, cfg):
    nm = float(n * m)
    nreal = float(n)
    kae = 2.0 * ae_beta / nm
    korth = 2.0 * beta / (nreal * nreal)
    patience = float(cfg.patience)
    sched_factor = float(cfg.sched_factor)
    sched_min_lr = float(cfg.sched_min_lr)
    sched_every = float(cfg.sched_every)
    S = num_steps

    def kernel(
        # inputs
        sel_ref, gidx_ref, mrow_ref, xhi_ref, xlo_ref,
        w0i_ref, v6i_ref, midi_ref, sqi_ref, biasi_ref, wrowi_ref,
        b0_ref, bmu0_ref, bnu0_ref, crow0_ref, svec0_ref,
        # outputs
        met_ref, w0o_ref, v6o_ref, mido_ref, sqo_ref,
        bias_ref, wrow_ref, b_ref, bmu_ref, bnu_ref, crow_ref, svec_ref,
        # scratch
        w0s, v6s, mids, sqs, gw0, gmid, gsq, gbias,
        h1s, d6s, big, lats, dlats,
        bfull, bhs, bls, ax_s, ga_s, auga_s, gb_s, acc_s,
        sdd_s, sdx_s, vv_s, srow_s, scol_s,
    ):
        s = pl.program_id(0)
        ph = pl.program_id(1)
        t = pl.program_id(2)
        tile = pl.ds(t * bt, bt)
        n_pad = n_tiles * bt
        m_pad = xhi_ref.shape[1]
        computing = jnp.logical_and(s >= 1, s <= S)

        def SEL(i):
            return sel_ref[i * LANES : (i + 1) * LANES, :]

        polymask = mrow_ref[0:1, :]
        trigmask = mrow_ref[1:2, :]
        msin = mrow_ref[2:3, :]
        mcos = mrow_ref[3:4, :]
        mtanh = mrow_ref[4:5, :]
        x_sq = _lane(mrow_ref[5:6, :], 0)
        augmask = mrow_ref[6:7, :]
        aerow = polymask + msin + mcos  # tanh channel excluded (ref :761,:867)

        def gather(x, row):
            idx = jnp.broadcast_to(gidx_ref[row : row + 1, :], x.shape)
            return jnp.take_along_axis(x, idx, axis=1)

        # ---- weight accessors (p/mu/nu stacked along rows in each scratch)
        def w0_p():
            return w0s[0:m_pad, :]

        def v6_p():
            return v6s[0:256, :]

        def mid_w1():
            return mids[0:256, :]

        def mid_v5t():
            return mids[256:512, :]

        def sq(slot):
            return sqs[slot * 128 : (slot + 1) * 128, :]

        def enc_b(i):  # (1, 256); layers >= 1 use lanes [:128]
            return bias_ref[i : i + 1, :]

        def dec_b(i):  # decoder biases c0..c5 (c5 uses all 256 lanes)
            return bias_ref[8 + i : 9 + i, :]

        def rowmask_for(rows0, nrows):
            row_i = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) + rows0
            return (row_i < n).astype(jnp.float32)

        def lanes_lt(width, w=LANES):
            li = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
            return (li < width).astype(jnp.float32)

        def lanes_eq(k, w=LANES):
            li = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
            return (li == k).astype(jnp.float32)

        def widen_aug(v16):
            return jnp.concatenate(
                [v16, jnp.zeros((v16.shape[0], LANES - AUGW), jnp.float32)],
                axis=1,
            )

        def _fdot(a, b, dims=_STD):
            # narrow-funnel contraction: in-kernel dot_general defaults to
            # single-pass bf16 (~2e-3 rel) — no splits, no f32 adds, 1/3 the
            # statements. Ablation-gated while the precision choice is open.
            if _ABLATE.get("funnel1pass"):
                return _d(a, b, dims)
            return _dot3(a, b, dims)

        # ---- funnel forward (row sub-block views) -------------------------
        def enc_funnel(h1):
            """h1 (rows, 256) -> ([h2..h6] post-relu (., 128), latent
            (rows, 128; lanes 0..1)). No relu on the last layer."""
            acts = []
            h = jnp.maximum(_fdot(h1, mid_w1(), _STD) + enc_b(1)[:, :128], 0.0)
            acts.append(h)  # h2
            for i in range(2, _NL - 1):  # layers 2..5 (relu)
                h = jnp.maximum(
                    _fdot(h, sq(i - 2), _STD) + enc_b(i)[:, :128], 0.0
                )
                acts.append(h)  # h3..h6
            lat = _fdot(acts[-1], sq(_NL - 3), _STD) + enc_b(_NL - 1)[:, :128]
            return acts, lat

        def dec_funnel(latm):
            """latm (rows, 128; lanes 0..1) -> ([d1..d5] post-relu (., 128),
            d6 (rows, 256) post-relu)."""
            acts = []
            d = latm
            nlayers = _ABLATE.get("declayers", 5)
            for i in range(0, 5):  # dec layers 0..4 (128-lane, relu)
                if i < nlayers:
                    d = jnp.maximum(
                        _fdot(d, sq(5 + i), _STD) + dec_b(i)[:, :128], 0.0
                    )
                acts.append(d)  # d1..d5
            if _ABLATE.get("nod6mm"):
                d6 = jnp.concatenate([acts[-1], acts[-1]], axis=1)
            else:
                d6 = jnp.maximum(
                    _fdot(acts[-1], mid_v5t(), _XBD) + dec_b(5), 0.0
                )
            return acts, d6

        def build_aug(latm, rmask):
            # aug layout: lane 0 = row mask, lanes 1..r = latent
            return gather(latm, 6) * (1.0 - lanes_eq(0)) + rmask * lanes_eq(0)

        # ---- the step finalize (phase 2, last tile) -----------------------
        def _finalize():
            bv = bfull[:]
            rec = (
                jnp.sum(ga_s[:] * gb_s[:]) - 2.0 * jnp.sum(ax_s[:] * bv) + x_sq
            ) / nm
            s1 = auga_s[1, 1]
            s2 = auga_s[2, 2]
            orthov = s1 * s2 / (nreal * nreal)
            crow_v = crow_ref[0:1, :]
            l1v = jnp.sum(jnp.abs(crow_v) * aerow)
            v6 = v6_p()
            c6 = wrow_ref[0:1, :]
            s_d = srow_s[0:1, :]
            sdv6 = _dot3(s_d, v6, _STD)  # (1, m_pad) = s_d @ V6
            xcol = wrow_ref[3:4, :]
            ae_sq = (
                jnp.sum(sdd_s[:] * vv_s[:])
                - 2.0 * jnp.sum(sdx_s[:] * v6)
                + 2.0 * jnp.sum(sdv6 * c6)
                - 2.0 * jnp.sum(xcol * c6)
                + nreal * jnp.sum(c6 * c6)
                + x_sq
            )
            aev = ae_sq / nm
            total = rec + beta * orthov + lam * l1v + ae_beta * aev

            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            maxarg = jnp.max(acc_s[2:3, :])
            met_row = jnp.where(lane_i == 0, rec, 0.0)
            met_row = jnp.where(lane_i == 1, orthov, met_row)
            met_row = jnp.where(lane_i == 2, l1v, met_row)
            met_row = jnp.where(lane_i == 3, total, met_row)
            met_row = jnp.where(lane_i == 4, maxarg, met_row)
            met_row = jnp.where(lane_i == 5, aev, met_row)
            met_ref[pl.ds(jnp.remainder(s - 1, 8), 1), :] = met_row

            sv = svec_ref[0:1, :]
            count = _lane(sv, _L_COUNT) + 1.0
            powb = _lane(sv, _L_POW) * _B1
            bias = 1.0 - powb
            lr_coef = _lane(sv, _LR0 + _IG_COEF)
            lr_z = _lane(sv, _LR0 + _IG_Z)
            lr_om = _lane(sv, _LR0 + _IG_OMEGA)

            def adamax(p, mu, nu, g, lr):
                mu_n = _B1 * mu + (1.0 - _B1) * g
                nu_n = jnp.maximum(_B2 * nu, jnp.abs(g) + _EPS)
                return p - (lr / bias) * mu_n / nu_n, mu_n, nu_n

            # ---- B rows (z / z_trig), group 'z' (compact AUGW-row state)
            gB = (2.0 / nm) * (_dot3(ga_s[:], bv, _STD) - ax_s[:])[:AUGW, :]
            bn, bmun, bnun = adamax(b_ref[:], bmu_ref[:], bnu_ref[:], gB, lr_z)
            b_ref[:] = bn
            bmu_ref[:] = bmun
            bnu_ref[:] = bnun

            # ---- coefficient row (tanh lanes: zero grad, zero L1)
            gC = (acc_s[0:1, :] + lam * jnp.sign(crow_v)) * aerow
            c_n, cmu, cnu = adamax(
                crow_v, crow_ref[1:2, :], crow_ref[2:3, :], gC, lr_coef
            )
            om_v = crow_ref[3:4, :]
            gO = acc_s[1:2, :]
            om_n, omu, onu = adamax(
                om_v, crow_ref[4:5, :], crow_ref[5:6, :], gO, lr_om
            )
            crow_ref[0:1, :] = c_n
            crow_ref[1:2, :] = cmu
            crow_ref[2:3, :] = cnu
            crow_ref[3:4, :] = om_n
            crow_ref[4:5, :] = omu
            crow_ref[5:6, :] = onu

            # ---- MLP weights, group 'z'
            pn, mun, nun = adamax(
                w0s[0:m_pad, :], w0s[m_pad : 2 * m_pad, :],
                w0s[2 * m_pad :, :], gw0[:], lr_z,
            )
            w0s[0:m_pad, :] = pn
            w0s[m_pad : 2 * m_pad, :] = mun
            w0s[2 * m_pad :, :] = nun

            gv6 = kae * (
                _dot3(sdd_s[:], v6, _STD) + scol_s[:, 0:1] * c6 - sdx_s[:]
            )
            pn, mun, nun = adamax(v6, v6s[256:512, :], v6s[512:768, :], gv6, lr_z)
            v6s[0:256, :] = pn
            v6s[256:512, :] = mun
            v6s[512:768, :] = nun

            pn, mun, nun = adamax(
                mids[0:512, :], mids[512:1024, :], mids[1024:1536, :],
                gmid[:], lr_z,
            )
            mids[0:512, :] = pn
            mids[512:1024, :] = mun
            mids[1024:1536, :] = nun

            nq = _NSQ * 128
            pn, mun, nun = adamax(
                sqs[0:nq, :], sqs[nq : 2 * nq, :], sqs[2 * nq :, :],
                gsq[:], lr_z,
            )
            sqs[0:nq, :] = pn
            sqs[nq : 2 * nq, :] = mun
            sqs[2 * nq :, :] = nun

            pn, mun, nun = adamax(
                bias_ref[0:16, :], bias_ref[16:32, :], bias_ref[32:48, :],
                gbias[:], lr_z,
            )
            bias_ref[0:16, :] = pn
            bias_ref[16:32, :] = mun
            bias_ref[32:48, :] = nun

            gc6 = kae * (sdv6 + nreal * c6 - xcol)
            pn, mun, nun = adamax(c6, wrow_ref[1:2, :], wrow_ref[2:3, :], gc6, lr_z)
            wrow_ref[0:1, :] = pn
            wrow_ref[1:2, :] = mun
            wrow_ref[2:3, :] = nun

            # ---- plateau scheduler (verbatim desmo finalize semantics)
            best = _lane(sv, _L_BEST)
            num_bad = _lane(sv, _L_NUMBAD)
            epoch = _lane(sv, _L_EPOCH)
            improved = total < best * (1.0 - _SCHED_THRESHOLD)
            best_n = jnp.where(improved, total, best)
            nb = jnp.where(improved, 0.0, num_bad + 1.0)
            red = nb > patience
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            is_lr = lanes < 5
            lrs = sv * jnp.where(is_lr, 1.0, 0.0)
            stepped = jnp.where(
                red, jnp.maximum(lrs * sched_factor, sched_min_lr), lrs
            )
            nb = jnp.where(red, 0.0, nb)
            do_sched = jnp.mod(epoch, sched_every) == 0.0
            lrs_n = jnp.where(do_sched, stepped, lrs)
            best_n = jnp.where(do_sched, best_n, best)
            nb_n = jnp.where(do_sched, nb, num_bad)
            new_sv = jnp.where(is_lr, lrs_n, 0.0)

            def put(vec, k, val):
                return jnp.where(lanes == k, val, vec)

            new_sv = put(new_sv, _L_BEST, best_n)
            new_sv = put(new_sv, _L_POW, powb)
            new_sv = put(new_sv, _L_COUNT, count)
            new_sv = put(new_sv, _L_NUMBAD, nb_n)
            new_sv = put(new_sv, _L_LRPHI_USED, 0.0)
            new_sv = put(new_sv, _L_BIAS_USED, bias)
            new_sv = put(new_sv, _L_EPOCH, epoch + 1.0)
            svec_ref[0:1, :] = new_sv

        # ------------------------------------------------ init (s == 0)
        @pl.when(jnp.logical_and(s == 0, ph == 0))
        def _():
            w0rows = 3 * m_pad // n_tiles
            w0s[pl.ds(t * w0rows, w0rows), :] = w0i_ref[:]
            v6rows = 768 // n_tiles
            v6s[pl.ds(t * v6rows, v6rows), :] = v6i_ref[:]
            midrows = 1536 // n_tiles
            mids[pl.ds(t * midrows, midrows), :] = midi_ref[:]
            sqrows = 3 * _NSQ * 128 // n_tiles
            sqs[pl.ds(t * sqrows, sqrows), :] = sqi_ref[:]

            @pl.when(t == 0)
            def _():
                bias_ref[:] = biasi_ref[:]
                wrow_ref[:] = wrowi_ref[:]
                b_ref[:] = b0_ref[:]
                bmu_ref[:] = bmu0_ref[:]
                bnu_ref[:] = bnu0_ref[:]
                crow_ref[:] = crow0_ref[:]
                svec_ref[:] = svec0_ref[:]

        # ------------------------------------ terminal write-out (s == S+1)
        @pl.when(jnp.logical_and(s == S + 1, ph == 0))
        def _():
            w0rows = 3 * m_pad // n_tiles
            w0o_ref[:] = w0s[pl.ds(t * w0rows, w0rows), :]
            v6rows = 768 // n_tiles
            v6o_ref[:] = v6s[pl.ds(t * v6rows, v6rows), :]
            midrows = 1536 // n_tiles
            mido_ref[:] = mids[pl.ds(t * midrows, midrows), :]
            sqrows = 3 * _NSQ * 128 // n_tiles
            sqo_ref[:] = sqs[pl.ds(t * sqrows, sqrows), :]

        # ================================================= phase 0: encoder
        @pl.when(jnp.logical_and(computing, ph == 0))
        def _():
            @pl.when(t == 0)
            def _():
                bfull[:] = jnp.concatenate(
                    [b_ref[:], jnp.zeros((LANES - AUGW, m_pad), jnp.float32)],
                    axis=0,
                )
                bh, bl = _split(bfull[:])
                bhs[:] = bh
                bls[:] = bl
                gb_s[:] = _d(bh, bh, _XBD) + _d(bh, bl, _XBD) + _d(bl, bh, _XBD)
                ax_s[:] = jnp.zeros_like(ax_s)
                ga_s[:] = jnp.zeros_like(ga_s)
                auga_s[:] = jnp.zeros_like(auga_s)
                acc_s[:] = jnp.zeros_like(acc_s)
                sdd_s[:] = jnp.zeros_like(sdd_s)
                sdx_s[:] = jnp.zeros_like(sdx_s)
                srow_s[:] = jnp.zeros_like(srow_s)
                scol_s[:] = jnp.zeros_like(scol_s)

            xh = xhi_ref[:]
            xl = xlo_ref[:]
            if _ABLATE.get("noh1"):
                h1s[tile, :] = xh[:, :H1W].astype(jnp.float32)
            else:
                h1s[tile, :] = jnp.maximum(
                    _xdot3(xh, xl, w0_p()) + enc_b(0), 0.0
                )

            @pl.when(jnp.logical_and(t == n_tiles - 1,
                                     not _ABLATE.get("nofwd")))
            def _():
                for blk in range(n_pad // bs):
                    rows = pl.ds(blk * bs, bs)
                    rmask = rowmask_for(blk * bs, bs)
                    if _ABLATE.get("fwd_noenc"):
                        latm = h1s[rows, :][:, :LANES] * rmask
                    else:
                        _, lat = enc_funnel(h1s[rows, :])
                        latm = lat * rmask
                    aug = build_aug(latm, rmask)
                    if not _ABLATE.get("fwd_nostores"):
                        lats[rows, :] = aug[:, :AUGW]
                    if not _ABLATE.get("fwd_nograms"):
                        ah, al = _split(aug)
                        auga_s[:] = auga_s[:] + (
                            _d(ah, ah, _AXD) + _d(ah, al, _AXD)
                            + _d(al, ah, _AXD)
                        )
                    if _ABLATE.get("fwd_nodec"):
                        continue
                    _, d6 = dec_funnel(latm)
                    d6m = d6 * rmask
                    if not _ABLATE.get("fwd_nostores"):
                        d6s[rows, :] = d6m
                    if not _ABLATE.get("fwd_nograms"):
                        d6h, d6l = _split(d6m)
                        sdd_s[:] = sdd_s[:] + (
                            _d(d6h, d6h, _AXD) + _d(d6h, d6l, _AXD)
                            + _d(d6l, d6h, _AXD)
                        )
                        srow_s[0:1, :] = srow_s[0:1, :] + jnp.sum(
                            d6m, axis=0, keepdims=True
                        )
                        onecol = jnp.broadcast_to(
                            lanes_eq(0, 128), (bs, 128)
                        ).astype(jnp.bfloat16)
                        scol_s[:] = scol_s[:] + (
                            _d(d6h, onecol, _AXD) + _d(d6l, onecol, _AXD)
                        )
                v6 = v6_p()
                v6h, v6l = _split(v6)
                vv_s[:] = (
                    _d(v6h, v6h, _XBD) + _d(v6h, v6l, _XBD) + _d(v6l, v6h, _XBD)
                )
                # c6 @ V6^T row, for the dD6 bias term
                srow_s[1:2, :] = _dot3(wrow_ref[0:1, :], v6, _XBD)

        # ============================== phase 1: dictionary + AE cross terms
        @pl.when(jnp.logical_and(computing, ph == 1))
        def _():
            crow_eff = crow_ref[0:1, :] * aerow
            omrow = crow_ref[3:4, :]
            xh = xhi_ref[:]
            xl = xlo_ref[:]
            aug = widen_aug(lats[tile, :])
            maskb = aug[:, 0:1]

            if not _ABLATE.get("nodict"):
                # --- dictionary forward (desmo block on the encoder latent)
                prod = gather(aug, 0)
                for p in range(1, P):
                    prod = prod * gather(aug, p)
                theta = prod * polymask
                args = prod * (omrow * trigmask)
                acc_s[2:3, :] = jnp.maximum(
                    acc_s[2:3, :],
                    jnp.max(jnp.abs(args), axis=0, keepdims=True),
                )
                Sn, Cs = _fast_sincos(args)
                Th = jnp.tanh(args)
                basis = (Sn * msin + Cs * mcos + Th * mtanh) * maskb
                D = theta + basis
                A = D * crow_eff
                Ah, Al = _split(A)
                rhs_h = jnp.concatenate([xh, Ah], axis=1)
                rhs_l = jnp.concatenate([xl, Al], axis=1)
                axga = (
                    _d(Ah, rhs_h, _AXD) + _d(Ah, rhs_l, _AXD)
                    + _d(Al, rhs_h, _AXD)
                )
                ax_s[:] = ax_s[:] + axga[:, :m_pad]
                ga_s[:] = ga_s[:] + axga[:, m_pad:]

                xb = (
                    _d(xh, bhs[:], _XBD) + _d(xh, bls[:], _XBD)
                    + _d(xl, bhs[:], _XBD)
                )
                dA = (2.0 / nm) * (_dot3(A, gb_s[:], _STD) - xb)
                dD = dA * crow_eff
                dtheta = dD * polymask
                deriv = Cs * msin - Sn * mcos + (1.0 - Th * Th) * mtanh
                darg = dD * trigmask * deriv
                acc_s[0:1, :] = acc_s[0:1, :] + jnp.sum(
                    dA * D, axis=0, keepdims=True
                )
                latrep = prod * trigmask
                acc_s[1:2, :] = acc_s[1:2, :] + jnp.sum(
                    darg * latrep, axis=0, keepdims=True
                )
                dl = _dot2(darg * omrow, SEL(0))
                s_poly = _dot2(dtheta * theta, SEL(2))
                denom = jnp.where(aug == 0.0, 1.0, aug)
                dl = dl + jnp.where(aug == 0.0, 0.0, s_poly / denom) * augmask
                dlats[tile, :] = dl[:, :AUGW]

            if not _ABLATE.get("nocross"):
                # --- AE cross terms of this tile
                d6m = d6s[tile, :]
                d6h, d6l = _split(d6m)
                sdx_s[:] = sdx_s[:] + (
                    _d(d6h, xh, _AXD) + _d(d6h, xl, _AXD) + _d(d6l, xh, _AXD)
                )
                xv6 = _xdot3(xh, xl, v6_p(), _XBD)  # X_t @ V6^T  (bt, 256)
                big[tile, :] = (
                    kae
                    * (_dot3(d6m, vv_s[:], _STD) + srow_s[1:2, :] - xv6)
                    * maskb
                )

            # ---------------- full-height funnel backward (last tile)
            @pl.when(jnp.logical_and(t == n_tiles - 1,
                                     not _ABLATE.get("nobwd")))
            def _():
                s1 = auga_s[1, 1]
                s2 = auga_s[2, 2]
                gbias[:] = jnp.zeros_like(gbias)
                gmid[:] = jnp.zeros_like(gmid)
                gsq[:] = jnp.zeros_like(gsq)
                for blk in range(n_pad // bs):
                    rows = pl.ds(blk * bs, bs)
                    rmask = rowmask_for(blk * bs, bs)
                    h1 = h1s[rows, :]
                    acts, lat = enc_funnel(h1)  # [h2..h6], latent
                    latm = lat * rmask
                    dacts, d6 = dec_funnel(latm)  # [d1..d5], d6

                    # decoder backward from the stashed dD6
                    dpre = big[rows, :] * (d6 > 0.0).astype(jnp.float32)
                    gmid[256:512, :] = gmid[256:512, :] + _fdot(
                        dpre, dacts[4], _AXD
                    )
                    gbias[13:14, :] = gbias[13:14, :] + jnp.sum(
                        dpre, axis=0, keepdims=True
                    )
                    dd = _fdot(dpre, mid_v5t(), _STD)  # grad wrt d5 (., 128)
                    for i in range(4, -1, -1):  # dec layers 4..0
                        dpre = dd * (dacts[i] > 0.0).astype(jnp.float32)
                        below = dacts[i - 1] if i > 0 else latm
                        slot = 5 + i
                        gsq[slot * 128 : (slot + 1) * 128, :] = (
                            gsq[slot * 128 : (slot + 1) * 128, :]
                            + _fdot(below, dpre, _AXD)
                        )
                        gbias[8 + i : 9 + i, 0:128] = (
                            gbias[8 + i : 9 + i, 0:128]
                            + jnp.sum(dpre, axis=0, keepdims=True)
                        )
                        dd = _fdot(dpre, sq(slot), _XBD)
                    dlat_dec = dd  # (., 128), funnel lanes 0..1

                    # latent gradient: dictionary + exact ortho + decoder
                    dl_aug = widen_aug(dlats[rows, :])
                    aug = build_aug(latm, rmask)
                    orow = korth * (s2 * lanes_eq(1) + s1 * lanes_eq(2))
                    dl_aug = dl_aug + aug * orow
                    dd = gather(dl_aug, 7) + dlat_dec  # funnel lanes 0..1

                    # encoder backward; layer 6 (4 -> 2) has no output relu
                    gsq[4 * 128 : 5 * 128, :] = gsq[4 * 128 : 5 * 128, :] + _fdot(
                        acts[4], dd, _AXD
                    )
                    gbias[6:7, 0:128] = gbias[6:7, 0:128] + jnp.sum(
                        dd, axis=0, keepdims=True
                    )
                    dd = _fdot(dd, sq(4), _XBD)
                    for i in range(5, 1, -1):  # enc layers 5..2
                        dpre = dd * (acts[i - 1] > 0.0).astype(jnp.float32)
                        below = acts[i - 2]
                        slot = i - 2
                        gsq[slot * 128 : (slot + 1) * 128, :] = (
                            gsq[slot * 128 : (slot + 1) * 128, :]
                            + _fdot(below, dpre, _AXD)
                        )
                        gbias[i : i + 1, 0:128] = (
                            gbias[i : i + 1, 0:128]
                            + jnp.sum(dpre, axis=0, keepdims=True)
                        )
                        dd = _fdot(dpre, sq(slot), _XBD)
                    # enc layer 1 (256 -> 128)
                    dpre = dd * (acts[0] > 0.0).astype(jnp.float32)
                    gmid[0:256, :] = gmid[0:256, :] + _fdot(h1, dpre, _AXD)
                    gbias[1:2, 0:128] = gbias[1:2, 0:128] + jnp.sum(
                        dpre, axis=0, keepdims=True
                    )
                    dd = _fdot(dpre, mid_w1(), _XBD)  # (., 256)
                    # enc layer 0 relu mask; dpre1 overwrites the dD6 buffer
                    dpre1 = dd * (h1 > 0.0).astype(jnp.float32)
                    big[rows, :] = dpre1
                    gbias[0:1, :] = gbias[0:1, :] + jnp.sum(
                        dpre1, axis=0, keepdims=True
                    )

        # ===================================== phase 2: gW0 + all updates
        @pl.when(jnp.logical_and(computing, ph == 2))
        def _():
            @pl.when(t == 0)
            def _():
                gw0[:] = jnp.zeros_like(gw0)

            if not _ABLATE.get("nogw0"):
                xh = xhi_ref[:]
                xl = xlo_ref[:]
                dh, dlo = _split(big[tile, :])
                gw0[:] = gw0[:] + (
                    _d(xh, dh, _AXD) + _d(xh, dlo, _AXD) + _d(xl, dh, _AXD)
                )

            @pl.when(jnp.logical_and(t == n_tiles - 1,
                                     not _ABLATE.get("nofin")))
            def _():
                _finalize()

    return kernel


# ---------------------------------------------------------------------------
# call builder
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _build_ae_call(r, P, n, m, n_pad, m_pad, num_steps, bt, bs, beta, lam,
                   ae_beta, cfg, interpret):
    T = library.num_poly_terms(r, P)
    n_tiles = n_pad // bt
    # re-validate the init/out stream tiling against the CALL-TIME n_pad:
    # ae_supports checked spec.n-derived padding, but a batch prepared with a
    # different n_mult (e.g. a mesh multiple) can reach here with an n_tiles
    # that doesn't divide the packed stacks — truncating division would then
    # silently skip tail rows of p/mu/nu at init (garbage optimizer moments)
    for rows in (3 * m_pad, 768, 1536, 3 * _NSQ * 128):
        if rows % n_tiles or (rows // n_tiles) % 8:
            raise ValueError(
                f"AE mega-kernel init/out streams need {rows} rows tiled "
                f"evenly over n_tiles={n_tiles} (n_pad={n_pad}, bt={bt}) in "
                "8-row multiples; re-pad x (train_chunk.prepare_batch) or "
                "use the scanned chunk"
            )
    consts = build_constants(r, P)
    kernel = _make_ae_kernel(
        r, P, T, n, m, num_steps, n_tiles, bt, bs, beta, lam, ae_beta, cfg
    )
    S = num_steps

    def cmap(s, ph, t):
        return (0, 0)

    def tmap(s, ph, t):
        return (t, 0)

    def initmap(s, ph, t):
        return (jnp.where(s < 1, t, n_tiles - 1), 0)

    def finalmap(s, ph, t):
        return (jnp.where(s < S + 1, 0, t), 0)

    def metmap(s, ph, t):
        return (jnp.clip(s - 1, 0, S - 1) // 8, 0)

    w0rows = 3 * m_pad // n_tiles
    v6rows = 768 // n_tiles
    midrows = 1536 // n_tiles
    sqrows = 3 * _NSQ * 128 // n_tiles

    in_specs = [
        pl.BlockSpec((consts.n_sel * LANES, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),  # x hi
        pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),  # x lo
        pl.BlockSpec((w0rows, 256), initmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((v6rows, m_pad), initmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((midrows, 128), initmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((sqrows, 128), initmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((48, 256), cmap, memory_space=pltpu.VMEM),  # bias init
        pl.BlockSpec((8, m_pad), cmap, memory_space=pltpu.VMEM),  # wrow init
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # b0
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # bmu0
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # bnu0
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # crow0
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # svec0
    ]
    out_specs = [
        pl.BlockSpec((8, LANES), metmap, memory_space=pltpu.VMEM),  # met
        pl.BlockSpec((w0rows, 256), finalmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((v6rows, m_pad), finalmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((midrows, 128), finalmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((sqrows, 128), finalmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((48, 256), cmap, memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec((8, m_pad), cmap, memory_space=pltpu.VMEM),  # wrow
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # b
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # bmu
        pl.BlockSpec((AUGW, m_pad), cmap, memory_space=pltpu.VMEM),  # bnu
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # crow
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),  # svec
    ]
    out_shape = [
        jax.ShapeDtypeStruct((_round_up(num_steps, 8), LANES), jnp.float32),
        jax.ShapeDtypeStruct((3 * m_pad, 256), jnp.float32),
        jax.ShapeDtypeStruct((768, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((1536, 128), jnp.float32),
        jax.ShapeDtypeStruct((3 * _NSQ * 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((48, 256), jnp.float32),
        jax.ShapeDtypeStruct((8, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((AUGW, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((AUGW, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((AUGW, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((3 * m_pad, 256), jnp.float32),  # w0s
        pltpu.VMEM((768, m_pad), jnp.float32),  # v6s
        pltpu.VMEM((1536, 128), jnp.float32),  # mids
        pltpu.VMEM((3 * _NSQ * 128, 128), jnp.float32),  # sqs
        pltpu.VMEM((m_pad, 256), jnp.float32),  # gw0
        pltpu.VMEM((512, 128), jnp.float32),  # gmid
        pltpu.VMEM((_NSQ * 128, 128), jnp.float32),  # gsq
        pltpu.VMEM((16, 256), jnp.float32),  # gbias
        pltpu.VMEM((n_pad, H1W), jnp.float32),  # h1s
        pltpu.VMEM((n_pad, H1W), jnp.float32),  # d6s
        pltpu.VMEM((n_pad, H1W), jnp.float32),  # big (dD6 then dpre1)
        pltpu.VMEM((n_pad, AUGW), jnp.float32),  # lats
        pltpu.VMEM((n_pad, AUGW), jnp.float32),  # dlats
        pltpu.VMEM((LANES, m_pad), jnp.float32),  # bfull
        pltpu.VMEM((LANES, m_pad), jnp.bfloat16),  # b hi
        pltpu.VMEM((LANES, m_pad), jnp.bfloat16),  # b lo
        pltpu.VMEM((LANES, m_pad), jnp.float32),  # ax
        pltpu.VMEM((LANES, LANES), jnp.float32),  # ga
        pltpu.VMEM((LANES, LANES), jnp.float32),  # auga
        pltpu.VMEM((LANES, LANES), jnp.float32),  # gb
        pltpu.VMEM((8, LANES), jnp.float32),  # acc rows
        pltpu.VMEM((256, 256), jnp.float32),  # sdd
        pltpu.VMEM((256, m_pad), jnp.float32),  # sdx
        pltpu.VMEM((256, 256), jnp.float32),  # vv
        pltpu.VMEM((8, 256), jnp.float32),  # srow (s_d, c6@V6^T)
        pltpu.VMEM((256, 128), jnp.float32),  # scol (s_d as a column)
    ]
    grid = (num_steps + 2, 3, n_pad // bt)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,
                pltpu.GridDimensionSemantics.ARBITRARY,
                pltpu.GridDimensionSemantics.ARBITRARY,
            ),
            # The VMEM-resident weight stacks + activation stashes are ~30 MB
            # of scratch — past the default 16 MB scoped-vmem stack limit but
            # within the chip's 64 MB less the streamed X blocks (measured to
            # compile and run; ae_supports budgets the total).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call, consts


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------


def _pad2(a, rows, cols):
    a = jnp.asarray(a, jnp.float32)
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pack_w0(tree, m_pad):
    return _pad2(tree["ae_enc_w0"], m_pad, 256)


def _pack_v6(tree, m_pad):
    return _pad2(tree["ae_dec_w6"], 256, m_pad)


def _pack_mid(tree):
    return jnp.concatenate(
        [_pad2(tree["ae_enc_w1"], 256, 128), _pad2(tree["ae_dec_w5"].T, 256, 128)]
    )


def _pack_sq(tree):
    slots = [_pad2(tree[f"ae_enc_w{i}"], 128, 128) for i in range(2, _NL)]
    slots += [_pad2(tree[f"ae_dec_w{i}"], 128, 128) for i in range(0, 5)]
    return jnp.concatenate(slots)


def _pack_bias(tree):
    out = jnp.zeros((16, 256), jnp.float32)
    for i in range(_NL):
        b = jnp.asarray(tree[f"ae_enc_b{i}"], jnp.float32)
        out = out.at[i, : b.shape[0]].set(b)
    for i in range(6):
        b = jnp.asarray(tree[f"ae_dec_b{i}"], jnp.float32)
        out = out.at[8 + i, : b.shape[0]].set(b)
    return out


def _unpack_mlp(w0, v6, mid, sq, biasb, c6row, m):
    """Rebuild the flat MLP param dict (one generation: p, mu or nu)."""
    widths = (m, *ENCODER_WIDTHS, 2)
    out = {}
    out["ae_enc_w0"] = w0[:m, :]
    out["ae_enc_w1"] = mid[0:256, :]
    for i in range(2, _NL):
        out[f"ae_enc_w{i}"] = sq[(i - 2) * 128 : (i - 2) * 128 + widths[i], : widths[i + 1]]
    dwidths = widths[::-1]
    for i in range(0, 5):
        out[f"ae_dec_w{i}"] = sq[
            (5 + i) * 128 : (5 + i) * 128 + dwidths[i], : dwidths[i + 1]
        ]
    out["ae_dec_w5"] = mid[256:512, :].T[: dwidths[5], :]
    out["ae_dec_w6"] = v6[:, :m]
    for i in range(_NL):
        out[f"ae_enc_b{i}"] = biasb[i, : widths[i + 1]]
    for i in range(6):
        out[f"ae_dec_b{i}"] = biasb[8 + i, : dwidths[i + 1]]
    out["ae_dec_b6"] = c6row[:m]
    return out


def _pack_b16(z, z_trig, T, m_pad):
    """z (T, m) + z_trig (3, r, m) -> compact (AUGW, m_pad) WIDE rows."""
    m = z.shape[1]
    zt = z_trig.reshape(-1, m)
    out = jnp.zeros((AUGW, m_pad), jnp.float32)
    out = out.at[:T, :m].set(z.astype(jnp.float32))
    out = out.at[T : T + zt.shape[0], :m].set(zt.astype(jnp.float32))
    return out


def _unpack_b16(bfw, T, r, m):
    return bfw[:T, :m], bfw[T : T + 3 * r, :m].reshape(3, r, m)


def ae_supports(spec, cfg, bt: int = _BT_DEFAULT, vmem_budget_mb: float = 40.0) -> bool:
    """Whether the AE mega-kernel covers this configuration: the AE variant at
    the reference funnel widths (r == 2), all K dictionary terms within one
    lane register, tiled init/out streams dividing evenly, and the resident
    VMEM working set within budget."""
    if getattr(cfg, "variant", "desmo") != "ae":
        return False
    if spec.r != 2 or ENCODER_WIDTHS != (256, 128, 64, 16, 8, 4):
        return False
    T = library.num_poly_terms(spec.r, spec.poly_order)
    if T + 3 * spec.r > AUGW or spec.poly_order > 8:
        return False
    n_pad = _round_up(spec.n, bt)
    m_pad = _round_up(spec.m, LANES)
    # make_ae_fused_chunk streams the init/out tensors in bs-row slabs and
    # rejects n_pad % bs at the first call — gate it here so supports() and
    # the chunk constructor agree (e.g. n=1400 -> n_pad=1536, bs=1024 fails)
    if n_pad % min(n_pad, 1024):
        return False
    n_tiles = n_pad // bt
    for rows in (3 * m_pad, 768, 1536, 3 * _NSQ * 128):
        if rows % n_tiles or (rows // n_tiles) % 8:
            return False
    mb = 1.0 / (1024 * 1024)
    vmem = (
        (3 * m_pad * 256 + 768 * m_pad + 1536 * 128 + 3 * _NSQ * 128 * 128) * 4
        + (m_pad * 256 + 512 * 128 + _NSQ * 128 * 128) * 4  # grads
        + 3 * n_pad * H1W * 4  # h1/d6/big stashes
        + 2 * n_pad * AUGW * 4
        + (2 * LANES * m_pad + 256 * m_pad + LANES * m_pad) * 4  # bfull/ax/sdx
        + 2 * LANES * m_pad * 2  # b hi/lo
        + 4 * bt * m_pad * 2 * 2  # double-buffered X planes
        + 4 * 1024 * 1024  # transients + small blocks headroom
    ) * mb
    return vmem < vmem_budget_mb


def make_ae_fused_chunk(spec, cfg, bt: int = _BT_DEFAULT,
                        interpret: bool | None = None, bs: int | None = None):
    """Build ``chunk(state, batch, num_steps) -> (state, metrics)`` running the
    ENTIRE AE chunk inside one pallas_call. Drop-in replacement for
    ``train.make_train_chunk`` on the AE variant; ``batch`` must carry ``x``,
    pre-split ``x_hi``/``x_lo`` and ``x_sq`` (``train_chunk.prepare_batch``)."""
    from desmo_tpu import optim, train

    if not ae_supports(spec, cfg, bt):
        raise ValueError(f"AE mega-kernel does not support preset {cfg.name!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, P = spec.r, spec.poly_order
    T = spec.num_poly_terms
    n, m = spec.n, spec.m
    beta = float(cfg.beta)
    lam = float(cfg.l1_lambda)
    ae_beta = float(cfg.ae_beta)

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def chunk(state, batch, num_steps: int):
        if num_steps < 1:
            raise ValueError(f"AE mega-kernel chunk needs num_steps >= 1")
        x_hi, x_lo = batch["x_hi"], batch["x_lo"]
        n_pad, m_pad = x_hi.shape
        if n_pad % bt:
            raise ValueError(f"x padding {n_pad} not a multiple of bt={bt}")
        bs_ = bs or min(n_pad, 1024)
        if n_pad % bs_:
            raise ValueError(f"x padding {n_pad} not a multiple of bs={bs_}")
        call, consts = _build_ae_call(
            r, P, n, m, n_pad, m_pad, int(num_steps), bt, bs_, beta, lam,
            ae_beta, cfg, interpret,
        )
        params, opt, sched = state.params, state.opt, state.sched

        def pack_gen(tree):
            w0 = _pack_w0(tree, m_pad)
            v6 = _pack_v6(tree, m_pad)
            mid = _pack_mid(tree)
            sqv = _pack_sq(tree)
            biasb = _pack_bias(tree)
            wrow = jnp.zeros((8, m_pad), jnp.float32)
            wrow = wrow.at[0, :m].set(jnp.asarray(tree["ae_dec_b6"], jnp.float32))
            return w0, v6, mid, sqv, biasb, wrow

        w0p, v6p, midp, sqp, biasp, wrowp = pack_gen(params)
        w0m, v6m, midm, sqm, biasm, wrowm = pack_gen(opt.mu)
        w0n, v6n, midn, sqn, biasn, wrown = pack_gen(opt.nu)
        w0i = jnp.concatenate([w0p, w0m, w0n])
        v6i = jnp.concatenate([v6p, v6m, v6n])
        midi = jnp.concatenate([midp, midm, midn])
        sqi = jnp.concatenate([sqp, sqm, sqn])
        biasi = jnp.concatenate([biasp, biasm, biasn])
        wrowi = wrowp.at[1].set(wrowm[0]).at[2].set(wrown[0])
        xcol = jnp.sum(jnp.asarray(batch["x"], jnp.float32), axis=0)
        wrowi = wrowi.at[3, :m].set(xcol)

        b0 = _pack_b16(params["z"], params["z_trig"], T, m_pad)
        bmu0 = _pack_b16(opt.mu["z"], opt.mu["z_trig"], T, m_pad)
        bnu0 = _pack_b16(opt.nu["z"], opt.nu["z_trig"], T, m_pad)
        crow0 = jnp.stack(
            [
                _pack_wide_row(params["c"], params["c_trig"], T, r),
                _pack_wide_row(opt.mu["c"], opt.mu["c_trig"], T, r),
                _pack_wide_row(opt.nu["c"], opt.nu["c_trig"], T, r),
                _pack_wide_row(jnp.zeros((T,)), params["omega"], T, r),
                _pack_wide_row(jnp.zeros((T,)), opt.mu["omega"], T, r),
                _pack_wide_row(jnp.zeros((T,)), opt.nu["omega"], T, r),
                jnp.zeros((LANES,), jnp.float32),
                jnp.zeros((LANES,), jnp.float32),
            ]
        )
        count_f = opt.count.astype(jnp.float32)
        svec0 = jnp.zeros((8, LANES), jnp.float32)
        svec0 = svec0.at[0, _LR0 : _LR0 + sched.lrs.shape[0]].set(sched.lrs)
        svec0 = svec0.at[0, _L_BEST].set(sched.best)
        svec0 = svec0.at[0, _L_POW].set(_B1**count_f)
        svec0 = svec0.at[0, _L_COUNT].set(count_f)
        svec0 = svec0.at[0, _L_NUMBAD].set(sched.num_bad.astype(jnp.float32))
        svec0 = svec0.at[0, _L_EPOCH].set(state.epoch.astype(jnp.float32))
        mrow = jnp.asarray(consts.mrow).at[5, 0].set(batch["x_sq"])
        # gather rows 6/7: funnel <-> aug lane shifts (lane 127 of the funnel
        # latent and lane 0 of the aug dl row are structurally zero)
        gidx = np.asarray(consts.gidx).copy()
        gidx[6, :] = LANES - 1
        gidx[6, 1 : r + 1] = np.arange(r)
        gidx[7, :] = LANES - 1
        gidx[7, :r] = np.arange(1, r + 1)

        (met, w0o, v6o, mido, sqo, biaso, wrowo, bfw, bmufw, bnufw,
         crow_o, svec_o) = call(
            jnp.asarray(consts.sel), jnp.asarray(gidx), mrow, x_hi, x_lo,
            w0i, v6i, midi, sqi, biasi, wrowi,
            b0, bmu0, bnu0, crow0, svec0,
        )

        m_pad_ = m_pad

        def gen(k):  # k = 0 (p), 1 (mu), 2 (nu)
            return _unpack_mlp(
                w0o[k * m_pad_ : (k + 1) * m_pad_, :],
                v6o[k * 256 : (k + 1) * 256, :],
                mido[k * 512 : (k + 1) * 512, :],
                sqo[k * _NSQ * 128 : (k + 1) * _NSQ * 128, :],
                biaso[k * 16 : (k + 1) * 16, :],
                wrowo[k, :],
                m,
            )

        new_params, new_mu, new_nu = gen(0), gen(1), gen(2)
        for tree, bpk in ((new_params, bfw), (new_mu, bmufw), (new_nu, bnufw)):
            tree["z"], tree["z_trig"] = _unpack_b16(bpk, T, r, m)
        c, c_trig = _unpack_wide_row(crow_o[0], T, r)
        mc, mct = _unpack_wide_row(crow_o[1], T, r)
        nc, nct = _unpack_wide_row(crow_o[2], T, r)
        _, omega = _unpack_wide_row(crow_o[3], T, r)
        _, momega = _unpack_wide_row(crow_o[4], T, r)
        _, nomega = _unpack_wide_row(crow_o[5], T, r)
        new_params.update(c=c, c_trig=c_trig, omega=omega)
        new_mu.update(c=mc, c_trig=mct, omega=momega)
        new_nu.update(c=nc, c_trig=nct, omega=nomega)

        nlr = sched.lrs.shape[0]
        new_state = train.TrainState(
            params={k: new_params[k] for k in state.params},
            opt=optim.AdamaxState(
                count=svec_o[0, _L_COUNT].astype(jnp.int32),
                mu={k: new_mu[k] for k in state.params},
                nu={k: new_nu[k] for k in state.params},
            ),
            sched=optim.PlateauState(
                lrs=svec_o[0, _LR0 : _LR0 + nlr],
                best=svec_o[0, _L_BEST],
                num_bad=svec_o[0, _L_NUMBAD].astype(jnp.int32),
            ),
            epoch=svec_o[0, _L_EPOCH].astype(jnp.int32),
        )
        metrics = {
            "rec": met[:num_steps, 0],
            "ortho": met[:num_steps, 1],
            "l1": met[:num_steps, 2],
            "total": met[:num_steps, 3],
            "max_arg": met[:num_steps, 4],
            "ae": met[:num_steps, 5],
        }
        return new_state, metrics

    return chunk
