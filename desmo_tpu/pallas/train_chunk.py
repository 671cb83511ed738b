"""The resident mega-kernel: an ENTIRE DESMO training chunk in ONE pallas_call.

Why: on this TPU runtime a pallas_call costs ~12 us empty and ~45 us loaded
(scripts/pallas_overhead.py), and even plain-XLA steps pay ~20 us of per-scan-
iteration while-loop overhead — at ~50 us of useful math per optimizer step
those fixed costs cap throughput well below the MXU roofline. Amortization:
run the WHOLE chunk (hundreds of optimizer epochs) inside one kernel over a
sequential grid ``(num_steps + 1, n_tiles)``. Two state transports, same math:

* RESIDENT (default where it fits): params, Adamax moments and the plateau
  scheduler live in VMEM scratch for the duration; per-step HBM traffic is
  just the streamed bf16 X planes (hidden under the MXU work) + metrics row.
* STREAMED (spatial sizes whose full-width state exceeds VMEM, e.g. the
  aneurysm's 27000 points): state ping-pongs through COMPACT HBM arrays —
  phi/mu/nu as three AUGW-lane slots of one (2, n_pad, 3*AUGW) array plus a
  (2, n_pad, AUGW) dlat array (AUG state only populates lanes 0..r, so
  full-width transport would ship ~8x dead lanes; the in-kernel math stays
  128-wide at identical vreg cost). Output parity ``s % 2`` is the next
  step's input parity ``(s-1) % 2``. On hardware the parities are glued by
  ``input_output_aliases`` (in-place HBM, 'aliased' transport); under
  interpret the same kernel runs in 'emul' transport (both parities in the
  output block, parity indexed in-kernel) so CI asserts bit-equality with
  the resident mode on CPU. Verified BIT-EXACT against the resident mode
  both on TPU (compact transport, odd and even step counts) and in CI.
  Note the large presets are MXU-bound, not DMA-bound: the compaction
  measured only ~+2% (aneurysm) — the full-width state DMA was already
  mostly hidden under the dot passes.

The math is the same composite objective as ``models/desmo.py`` +
``losses.py`` + ``optim.py`` (reference ``DESMO/cylinder_flow/
DESMO-Cylinder.py:500-786``), expressed in a lane-packed layout:

* AUG space (lanes): 0 = row-validity mask, 1..r = POD/phi/latent modes.
* WIDE space (lanes): 0..T-1 = polynomial terms, T + k*r + i = trig term of
  kind k (sin,cos,tanh) and mode i — exactly the column order of the spatial
  dictionary / row order of the temporal matrix B.
* The polynomial library and its derivative tables are EXACT f32 lane
  gathers (``take_along_axis`` against constant index rows — Mosaic lowers
  static lane gathers on the VPU); the remaining gradient lane-reductions
  (poly -> mode, trig -> mode, ortho sign) are selection matmuls against
  constant 0/1 bf16 matrices. Dictionary products and gradients are
  full-width VPU ops. No per-column ops.
* All X-touching and Gram contractions use the hi/lo-split 3-pass bf16 scheme
  of ``dual_gemm._dot3`` (~5e-6 relative, fp32-grade); selections use 2-pass
  (~2e-18-relative representation error of the operand split).

Per-step semantics match ``train.make_train_chunk`` step-for-step (tested in
``tests/test_train_chunk_kernel.py``): forward loss of generation-s params ->
metrics row s -> Adamax update with bias correction 1-b1^(s+1) -> plateau
scheduler stepped with this step's pre-update total on the ``sched_every``
cadence. phi updates are applied one MAJOR grid step later, tile by tile,
immediately before each tile's forward — so every forward still sees fully
generation-consistent parameters (B/coef/omega update at the last tile of the
same step; phi at the next visit of each tile, before it is read).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desmo_tpu import library

LANES = 128
# AUG-space state (phi/mu/nu/dlat) only ever populates lanes 0..r (r <= 8),
# so the STREAMED transport ships it through HBM at AUGW lanes instead of
# 128 — the ping-pong traffic of the large presets (aneurysm: 113 MB/step of
# state + 14 MB of pod at full width) shrinks ~8x. In-kernel VPU cost is
# unchanged (narrow f32 arrays occupy the same (8, 128)-tiled vregs); only
# the DMA shrinks. The resident transport keeps full-width VMEM scratch.
AUGW = 16
_B1, _B2, _EPS = 0.9, 0.999, 1e-8
# Timing-attribution ablations (scripts/ablate_megakernel.py). Timing on TPU
# is data-independent, so numerics-breaking stubs still measure real cost.
# Keys: notrig, noxb, noaxga, noconcat, nodlo, nopoly. Callers must
# _build_call.cache_clear() after mutating.
_ABLATE: dict = {}
_SCHED_THRESHOLD = 1e-4

# svec row-0 lane roles (scheduler / optimizer scalar state, kept as a vector)
_LR0 = 0  # lanes 0..4: group LRs in configs.GROUP_ORDER order
_L_BEST = 5
_L_POW = 6  # b1**count (bias-correction accumulator)
_L_COUNT = 7
_L_NUMBAD = 8
_L_LRPHI_USED = 9  # saved at the end of step s for the delayed phi sweep
_L_BIAS_USED = 10
_L_EPOCH = 11
# Per-seed loss weights (hyperparameter multi-start, ensemble.resolve_hypers):
# the packed kernel reads beta/lambda from each seed's svec row instead of the
# compile-time scalar, so S lane-packed models can train under S different
# (beta, l1_lambda) settings for the cost of one. SEEDS == 1 keeps the scalar
# closure constants (bit-identical to the pre-sweep kernel).
_L_BETA = 12
_L_LAM = 13


class ChunkConstants(NamedTuple):
    sel: np.ndarray  # (3*128, 128) bf16: [COLLAPSE; OFFDIAG; EMAT] stack
    mrow: np.ndarray  # (8, 128) f32 mask rows
    gidx: np.ndarray  # (8, 128) i32 gather rows: 0..P-1 factor lanes
    n_sel: int


class SeedLaneGeometry(NamedTuple):
    wide_seed: np.ndarray  # (128,) i32: seed block of each WIDE lane
    off: np.ndarray  # (128,) i64: offset within the seed's WIDE block
    inblk: np.ndarray  # (128,) bool: lane belongs to some seed's WIDE block
    aug_seed: np.ndarray  # (128,) i32: seed block of each AUG lane
    augmask: np.ndarray  # (128,) f32: lane is some seed's AUG mode lane
    seedsel: np.ndarray  # (128, S) f32: WIDE lane -> seed one-hot
    augsel: np.ndarray  # (128, S) f32: AUG lane -> seed one-hot
    wmask: np.ndarray  # (128, 128) f32: WIDE block-diagonal 0/1


def seed_lane_geometry(r: int, P: int, n_seeds: int) -> SeedLaneGeometry:
    """SINGLE source of truth for the seed-packed lane layout, shared by
    ``build_constants`` (the in-kernel tables) and the sharded megastep's
    jax-side reductions (``shard_step``): seed s's WIDE block occupies lanes
    ``[s*K, (s+1)*K)`` ([T poly, 3r trig] inside) and its AUG modes live at
    lanes ``1 + s*r + i``. The two consumers must stay bit-consistent —
    mixing layouts would silently blend packed seeds' losses/LRs — so any
    layout change lands here, once."""
    T = library.num_poly_terms(r, P)
    K = T + 3 * r
    S = n_seeds
    lane = np.arange(LANES)
    wide_seed = np.minimum(lane // K, S - 1).astype(np.int32)
    off = lane - wide_seed.astype(np.int64) * K
    inblk = lane < S * K
    aug_seed = np.clip((lane - 1) // max(r, 1), 0, S - 1).astype(np.int32)
    augmask = ((lane >= 1) & (lane < 1 + S * r)).astype(np.float32)
    seedsel = np.zeros((LANES, S), np.float32)
    seedsel[np.arange(S * K), np.repeat(np.arange(S), K)] = 1.0
    augsel = np.zeros((LANES, S), np.float32)
    for s in range(S):
        augsel[1 + s * r : 1 + (s + 1) * r, s] = 1.0
    wmask = np.zeros((LANES, LANES), np.float32)
    wmask[: S * K, : S * K] = np.kron(np.eye(S), np.ones((K, K)))
    return SeedLaneGeometry(
        wide_seed, off, inblk, aug_seed, augmask, seedsel, augsel, wmask
    )


def build_constants(r: int, P: int, n_seeds: int = 1) -> ChunkConstants:
    """Selection matrices + lane masks for a given (r, poly_order).

    ``n_seeds > 1`` seed-blocks every table for the lane-packed multi-seed
    mega-kernel (see ``ensemble.py``): seed s's WIDE block occupies lanes
    [s*K, (s+1)*K) with the standard [T poly, 3r trig] order inside, and its
    AUG modes live at lanes 1 + s*r + i (lane 0 stays the SHARED row-validity
    mask, which doubles as the constant-one factor for every seed). With
    ``n_seeds == 1`` the tables are bit-identical to the single-seed ones.
    """
    T = library.num_poly_terms(r, P)
    K = T + 3 * r
    S = n_seeds
    if S * K > LANES:
        raise ValueError(f"{S} seeds x K={K} terms exceed {LANES} lanes")
    if 1 + S * r > LANES:
        raise ValueError(f"{S} seeds x r={r} aug lanes exceed {LANES}")
    F = library.factor_table(r, P)  # (T, P), 0 = const, i+1 = mode i
    E = library.monomial_exponents(r, P)

    mats = []
    # COLLAPSE: WIDE -> AUG: trig lane (s,k,i) -> aug lane 1 + s*r + i
    C = np.zeros((LANES, LANES), np.float32)
    for s in range(S):
        for i in range(r):
            for k in range(3):
                C[s * K + T + k * r + i, 1 + s * r + i] = 1.0
    mats.append(C)
    # OFFDIAG over AUG lanes (for the ortho sign matrix), within-seed only
    D = np.zeros((LANES, LANES), np.float32)
    for s in range(S):
        for i in range(r):
            for j in range(r):
                if i != j:
                    D[1 + s * r + i, 1 + s * r + j] = 1.0
    mats.append(D)
    # EMAT: poly lane (s,t) -> aug lane 1 + s*r + i with weight E[t, i]
    # (exact small ints in bf16). The poly backward then is ONE matmul + a
    # guarded division: d theta_t / d lat_i = E[t,i] * theta_t / lat_i, so
    # dl_i = (sum_t dtheta_t * theta_t * E[t,i]) / lat_i.
    EM = np.zeros((LANES, LANES), np.float32)
    for s in range(S):
        for i in range(r):
            EM[s * K : s * K + T, 1 + s * r + i] = E[:, i].astype(np.float32)
    mats.append(EM)
    geo = seed_lane_geometry(r, P, S)
    if S > 1:
        # SEEDSEL: wide lane -> seed lane (per-seed metric reductions)
        SS = np.zeros((LANES, LANES), np.float32)
        SS[:, :S] = geo.seedsel
        mats.append(SS)
        # AUGSEL: aug lane -> seed lane (per-seed ortho reductions)
        AS = np.zeros((LANES, LANES), np.float32)
        AS[:, :S] = geo.augsel
        mats.append(AS)
        # WMASK: wide block-diagonal 0/1 (keeps the packed Grams per-seed —
        # cross-seed B/A correlations must not leak into gradients)
        mats.append(geo.wmask)
    sel = np.concatenate(mats, axis=0).astype(jnp.bfloat16)

    off = geo.off  # offset within the seed block
    inblk = geo.inblk
    polymask = (inblk & (off < T)).astype(np.float32)
    trigmask = (inblk & (off >= T) & (off < K)).astype(np.float32)
    kind = (off - T) // max(r, 1)
    msin = (trigmask * (kind == 0)).astype(np.float32)
    mcos = (trigmask * (kind == 1)).astype(np.float32)
    mtanh = (trigmask * (kind == 2)).astype(np.float32)
    mrow = np.zeros((8, LANES), np.float32)
    mrow[0] = polymask
    mrow[1] = trigmask
    mrow[2] = msin
    mrow[3] = mcos
    mrow[4] = mtanh
    # mrow[5, 0] = x_sq is filled at call time
    mrow[6, 1 : 1 + S * r] = 1.0  # aug-lane mask (poly-backward division)

    # gather index rows (exact VPU selections instead of MXU matmuls):
    # rows 0..P-1: AUG-lane of factor p per WIDE lane (trig lanes get the
    # latent for p==0 and the row mask for p>0, exactly like SEL_p).
    gidx = np.zeros((8, LANES), np.int32)
    for p in range(P):
        for s in range(S):
            for t in range(T):
                f = F[t, p]
                gidx[p, s * K + t] = f + s * r if f > 0 else 0
            for i in range(r):
                for k in range(3):
                    gidx[p, s * K + T + k * r + i] = 1 + s * r + i if p == 0 else 0
    return ChunkConstants(
        sel=np.asarray(sel),
        mrow=mrow,
        gidx=gidx,
        n_sel=len(mats),
    )


# ONE canonical hi/lo split + 3-pass scheme, shared with the dual-GEMM loss
# kernel — a precision-scheme change edited in one module must not silently
# diverge the other (the parity tests assume identical numerics)
from desmo_tpu.pallas.dual_gemm import _BN as _BT_DEFAULT  # noqa: E402
from desmo_tpu.pallas.dual_gemm import _round_up  # noqa: E402, F401
from desmo_tpu.pallas.dual_gemm import _split_bf16 as _split  # noqa: E402


def _d(u, v, dims):
    return jax.lax.dot_general(u, v, dimension_numbers=dims, preferred_element_type=jnp.float32)


_STD = (((1,), (0,)), ((), ()))  # (a, b) -> a @ b
_AXD = (((0,), (0,)), ((), ()))  # contract rows: a^T @ b
_XBD = (((1,), (1,)), ((), ()))  # contract lanes: a @ b^T


def _dot2(x, M, dims=_STD):
    """hi/lo 2-pass product against an exact bf16 matrix (selections)."""
    h, l = _split(x)
    return _d(h, M, dims) + _d(l, M, dims)


def _seed_reduce(v, M, dims=_STD):
    """NaN-isolated ``_dot2(v, M, dims)`` for one-hot seed bucketing: a
    non-finite entry of ``v`` poisons ONLY the output lanes its one-hot
    column selects. A plain selection matmul leaks one diverged seed's
    inf/NaN into EVERY seed's metric (IEEE NaN*0 = NaN), which would defeat
    ensemble.fit's divergence containment — it attributes blame from
    per-seed finiteness of total_s at the first bad step."""
    fin = jnp.abs(v) < jnp.float32(jnp.inf)  # False for NaN and +-inf
    clean = _dot2(jnp.where(fin, v, 0.0), M, dims)
    bad = _d(jnp.where(fin, 0.0, 1.0).astype(jnp.bfloat16), M, dims)
    return jnp.where(bad > 0.0, float("nan"), clean)


from desmo_tpu.pallas.dual_gemm import _dot3  # noqa: E402, F401  (same scheme)


# fast in-kernel sin/cos: one shared Cody-Waite reduction mod pi (4-term pi
# split) + near-minimax polys in y^2 (sin deg-11 odd / cos deg-12 even,
# <= 1.1e-10 abs err on |y| <= 1.02*pi/2; ~2e-7 end-to-end in f32 incl.
# reduction). Domain: k*P1 is EXACT for k < 2^13 (|arg| < ~2.5e4 — cylinder
# args are omega*latent ~ O(1e3)); beyond that the reduction degrades
# GRACEFULLY, not catastrophically: the k*P1/k*P2 rounding errors scale like
# arg * 1.3e-11, i.e. still ~ulp(arg)-level (the f32 argument itself
# quantizes at arg * 6e-8, the binding limit for ANY f32 sin at large args).
# A run whose omega*latent leaves f32-sane territory can force the scanned
# chunk (XLA builtin sin) with cfg.chunk_method='scan'. Motivation: builtin
# sin+cos are two full-width VPU transcendental passes, measured ~9 us/step
# of the cylinder mega-kernel (scripts/ablate_megakernel.py) for 24
# meaningful lanes of 384.
_SINP = (1.0, -1.66666666e-01, 8.33333109e-03, -1.98408729e-04,
         2.75257291e-06, -2.38950307e-08)
_COSP = (1.0, -0.5, 4.16666664e-02, -1.38888834e-03, 2.48009721e-05,
         -2.75220345e-07, 1.98694157e-09)
_PI_SPLIT = (3.140625, 9.670257568359375e-04, 6.2771141e-07, 1.2154201e-10)

# |omega * latent| bound for exact _fast_sincos Cody-Waite reduction (k*P1
# exact for k < 2^13). ENFORCED, not advisory: every step tracks the max
# |trig arg| into metrics lane 4 ("max_arg"), and train.fit falls back to the
# scanned chunk (XLA builtin sin/cos) when a chunk exceeds it.
SINCOS_DOMAIN = 2.5e4


def _fast_sincos(x):
    k = jnp.round(x * (1.0 / np.pi))
    y = x
    for p in _PI_SPLIT:
        y = y - k * p
    y2 = y * y
    s = _SINP[-1]
    for c in _SINP[-2::-1]:
        s = s * y2 + c
    s = s * y
    cs = _COSP[-1]
    for c in _COSP[-2::-1]:
        cs = cs * y2 + c
    sgn = 1.0 - 2.0 * jnp.mod(k, 2.0)
    return s * sgn, cs * sgn


def _lane(row, k):
    """0-d scalar from a (1,128) vector row (Mosaic splats scalars fine;
    (1,1) vectors cannot broadcast to both sublanes and lanes)."""
    return row[0, k]


def _parity_in(s):
    """Ping-pong parity holding the state written LAST major step."""
    return jax.lax.rem(s + 1, 2)


def _parity_out(s):
    """Ping-pong parity this major step writes."""
    return jax.lax.rem(s, 2)


def aug_width(r: int, n_seeds: int = 1) -> int:
    """Streamed-transport aug width: smallest AUGW multiple holding the
    shared mask lane + n_seeds*r mode lanes."""
    need = 1 + n_seeds * r
    w = AUGW
    while w < need:
        w *= 2
    return w


def _make_kernel(
    spec_r, spec_P, T, K, n, m, num_steps, n_tiles, bt, beta, lam, cfg,
    transport: str, nf: int = 0, kp: int = 0, n_seeds: int = 1,
):
    nm = float(n * m)
    P = spec_P
    r = spec_r
    SEEDS = n_seeds
    augw = aug_width(r, SEEDS)
    patience = float(cfg.patience)
    sched_factor = float(cfg.sched_factor)
    sched_min_lr = float(cfg.sched_min_lr)
    sched_every = float(cfg.sched_every)
    fourier = nf > 0
    streamed = transport != "resident"
    aliased = transport == "aliased"

    def kernel(*refs):
        it = iter(refs)

        def take(k):
            return tuple(next(it) for _ in range(k))

        (sel_ref, gidx_ref, mrow_ref, pod_ref, xhi_ref, xlo_ref,
         init0_ref) = take(7)
        if fourier:
            zc0_ref, zcmu0_ref, zcnu0_ref, per0_ref, trow_ref = take(5)
        else:
            b0_ref, bmu0_ref, bnu0_ref = take(3)
        crow0_ref, svec0_ref = take(2)
        if aliased:
            stin_ref, dlin_ref = take(2)
        (met_ref,) = take(1)
        if not streamed:
            phio_ref, muo_ref, nuo_ref = take(3)
        if fourier:
            zc_ref, zcmu_ref, zcnu_ref, per_ref = take(4)
        else:
            b_ref, bmu_ref, bnu_ref = take(3)
        crow_ref, svec_ref = take(2)
        if streamed:
            stout_ref, dlout_ref = take(2)
            (cur_ref,) = take(1)
        else:
            phis, mus, nus, dlat = take(4)
        ax_s, ga_s, auga_s, gb_s, bhs, bls, acc_s, sign_s = take(8)
        if fourier:
            bfull_s, th_s, c1_s, s1_s, gzc_s = take(5)
        assert next(it, None) is None, "ref count mismatch"
        s = pl.program_id(0)
        t = pl.program_id(1)
        tile = pl.ds(t * bt, bt)

        def SEL(i):
            return sel_ref[i * LANES : (i + 1) * LANES, :]

        polymask = mrow_ref[0:1, :]
        trigmask = mrow_ref[1:2, :]
        msin = mrow_ref[2:3, :]
        mcos = mrow_ref[3:4, :]
        mtanh = mrow_ref[4:5, :]
        x_sq = _lane(mrow_ref[5:6, :], 0)

        def gather(x, row):
            idx = jnp.broadcast_to(gidx_ref[row : row + 1, :], x.shape)
            return jnp.take_along_axis(x, idx, axis=1)

        # --- per-tile state access: resident mode slices full-VMEM scratch
        # (128-lane); streamed modes ping-pong COMPACT HBM arrays through
        # blocks — phi/mu/nu packed as three AUGW-lane slots of one
        # (2, n_pad, 3*AUGW) array plus a (2, n_pad, AUGW) dlat array (dlat is
        # separate because it is written at a later program point than the
        # write-through; combining would need lane-sliced ref stores). Input
        # parity (s-1) % 2, output parity s % 2 (_parity_in/_parity_out,
        # shared by the index maps, the in-kernel emul indexing and the host
        # final-parity selection). 'aliased' (hardware) glues write->read via
        # input_output_aliases on (1, bt, w) blocks; 'emul' (interpret-safe
        # CI equivalent) reads and writes both parities of the OUTPUT block
        # (2, bt, w) directly, no aliasing. The intra-visit carrier (updated
        # phi/mu/nu for this visit's forward) is a (bt, 3*AUGW) scratch.
        def _slot(v, k):
            return v[:, augw * k : augw * (k + 1)]

        def pod_tile():
            return pod_ref[:] if streamed else pod_ref[tile, :]

        def state_read():
            if aliased:
                st = stin_ref[0]
                return _slot(st, 0), _slot(st, 1), _slot(st, 2), dlin_ref[0]
            if streamed:
                pi = _parity_in(s)
                st = stout_ref[pi]
                return _slot(st, 0), _slot(st, 1), _slot(st, 2), dlout_ref[pi]
            return phis[tile, :], mus[tile, :], nus[tile, :], dlat[tile, :]

        def state_write(phi_t, mu_t, nu_t):
            if streamed:
                cur_ref[:] = jnp.concatenate([phi_t, mu_t, nu_t], axis=1)
            else:
                phis[tile, :] = phi_t
                mus[tile, :] = mu_t
                nus[tile, :] = nu_t

        def cur_state():
            if streamed:
                return _slot(cur_ref[:], 0)
            return phis[tile, :]

        def _widen(v):
            # augw-lane aug-space value -> 128-lane (zero lanes >= augw)
            return jnp.concatenate(
                [v, jnp.zeros((v.shape[0], LANES - augw), v.dtype)], axis=1
            )

        # ------------------------------------------------ init (s == 0)
        @pl.when(s == 0)
        def _():
            i0 = init0_ref[:]
            p0, m0, n0 = _slot(i0, 0), _slot(i0, 1), _slot(i0, 2)
            if streamed:
                state_write(p0, m0, n0)
            else:
                state_write(_widen(p0), _widen(m0), _widen(n0))

        @pl.when(jnp.logical_and(s == 0, t == 0))
        def _():
            if fourier:
                zc_ref[:] = zc0_ref[:]
                zcmu_ref[:] = zcmu0_ref[:]
                zcnu_ref[:] = zcnu0_ref[:]
                per_ref[:] = per0_ref[:]
                bfull_s[:] = jnp.zeros_like(bfull_s)  # rows >= kp stay zero
                gzc_s[:] = jnp.zeros_like(gzc_s)  # lanes >= 2nf+1 stay zero
            else:
                b_ref[:] = b0_ref[:]
                bmu_ref[:] = bmu0_ref[:]
                bnu_ref[:] = bnu0_ref[:]
            crow_ref[:] = crow0_ref[:]
            svec_ref[:] = svec0_ref[:]
            sign_s[:] = jnp.zeros_like(sign_s)

        # -------------------------- delayed phi update (generation s-1 grads)
        @pl.when(s > 0)
        def _():
            sv = svec_ref[0:1, :]
            if SEEDS > 1:
                # per-seed saved lr_phi AND ortho weight beta, splat onto each
                # seed's aug lanes (dlo is zero outside aug lanes — the ortho
                # sign matrix is within-seed — so the masked splat is exact)
                w = augw if streamed else LANES
                li = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
                lr_phi = jnp.zeros((1, w), jnp.float32)
                beta_phi = jnp.zeros((1, w), jnp.float32)
                for si in range(SEEDS):
                    svs = svec_ref[si : si + 1, :]
                    lr_s = _lane(svs, _L_LRPHI_USED)
                    inb = jnp.logical_and(li >= 1 + si * r, li < 1 + (si + 1) * r)
                    lr_phi = jnp.where(inb, lr_s, lr_phi)
                    beta_phi = jnp.where(inb, _lane(svs, _L_BETA), beta_phi)
            else:
                lr_phi = _lane(sv, _L_LRPHI_USED)
                beta_phi = beta
            bias = _lane(sv, _L_BIAS_USED)
            pod = pod_tile()
            phi_t, mu_p, nu_p, dl_prev = state_read()
            aug_old = pod * phi_t
            if _ABLATE.get("nodlo"):
                dlo = aug_old * 0.19
            elif streamed:
                # compact state: contract the augw-lane aug against the top
                # augw sign rows, keep the augw output lanes
                dlo = _dot2(aug_old, sign_s[0:augw, :].astype(jnp.bfloat16))[
                    :, :augw
                ]
            else:
                dlo = _dot2(aug_old, sign_s[:].astype(jnp.bfloat16))
            g = (dl_prev + beta_phi * dlo) * pod
            mu_t = _B1 * mu_p + (1.0 - _B1) * g
            nu_t = jnp.maximum(_B2 * nu_p, jnp.abs(g) + _EPS)
            state_write(phi_t - (lr_phi / bias) * mu_t / nu_t, mu_t, nu_t)

        if streamed:
            # persist this visit's state at output parity s % 2 (write-through)
            po = 0 if aliased else _parity_out(s)
            stout_ref[po] = cur_ref[:]
        else:
            # final-state streams, written only in the terminal update sweep
            @pl.when(s == num_steps)
            def _():
                phio_ref[:] = phis[tile, :]
                muo_ref[:] = mus[tile, :]
                nuo_ref[:] = nus[tile, :]

        # ------------------------------------------------ forward + grads
        @pl.when(s < num_steps)
        def _():
            @pl.when(t == 0)
            def _():
                if fourier:
                    # materialize B rows from the truncated Fourier series of
                    # generation-s coefficients/periods: one cos/sin pass of
                    # the base angle theta = 2 pi t / period per channel, then
                    # a harmonic recurrence cos((k+1)th) = ck*c1 - sk*s1 (VPU
                    # muls instead of nf transcendental passes). Reference
                    # series: DESMO_Fourier/cylinder_flow/DESMO-Cylinder.py:
                    # 485-506 (a0 + sum a_k cos + b_k sin on t_points).
                    trow = trow_ref[0:1, :]
                    tmask = trow_ref[1:2, :]
                    rp = 1.0 / per_ref[:, 0:1]  # (kp, 1)
                    th = jnp.broadcast_to(
                        (2.0 * np.pi) * trow, (kp, trow.shape[1])
                    ) * rp
                    c1 = jnp.cos(th)
                    s1 = jnp.sin(th)
                    th_s[:] = th
                    c1_s[:] = c1
                    s1_s[:] = s1
                    acc = (
                        zc_ref[:, 0:1]
                        + zc_ref[:, 1:2] * c1
                        + zc_ref[:, 2:3] * s1
                    )
                    ck, sk = c1, s1
                    for k in range(2, nf + 1):
                        ckn = ck * c1 - sk * s1
                        skn = sk * c1 + ck * s1
                        acc = (
                            acc
                            + zc_ref[:, 2 * k - 1 : 2 * k] * ckn
                            + zc_ref[:, 2 * k : 2 * k + 1] * skn
                        )
                        ck, sk = ckn, skn
                    bfull_s[0:kp, :] = acc * tmask
                    bv = bfull_s[:]
                else:
                    bv = b_ref[:]
                bh, bl = _split(bv)
                bhs[:] = bh
                bls[:] = bl
                gb_raw = _d(bh, bh, _XBD) + _d(bh, bl, _XBD) + _d(bl, bh, _XBD)
                if SEEDS > 1:
                    # keep only within-seed B correlations: dA = A @ gb and
                    # the rec Gram product must not couple packed seeds
                    gb_raw = gb_raw * SEL(5).astype(jnp.float32)
                gb_s[:] = gb_raw
                ax_s[:] = jnp.zeros_like(ax_s)
                ga_s[:] = jnp.zeros_like(ga_s)
                auga_s[:] = jnp.zeros_like(auga_s)
                acc_s[:] = jnp.zeros_like(acc_s)

            crow = crow_ref[0:1, :]
            omrow = crow_ref[3:4, :]
            xh = xhi_ref[:]
            xl = xlo_ref[:]
            if _ABLATE.get("noxb"):
                xb = _d(xh, bhs[:], _XBD)
            else:
                xb = _d(xh, bhs[:], _XBD) + _d(xh, bls[:], _XBD) + _d(xl, bhs[:], _XBD)
            pod = pod_tile()
            if streamed:
                aug = _widen(pod * cur_state())
            else:
                aug = pod * cur_state()
            ah, al = _split(aug)

            # factor selections as EXACT f32 lane gathers (no MXU, no hi/lo)
            if _ABLATE.get("nogather"):
                prod = aug * 0.7
            else:
                prod = gather(aug, 0)
                for p in range(1, P):
                    prod = prod * gather(aug, p)
            theta = prod * polymask
            args = prod * (omrow * trigmask)
            # track max |trig arg| for the _fast_sincos domain guard
            # (SINCOS_DOMAIN); one lane-row max per tile, ~free on the VPU
            acc_s[2:3, :] = jnp.maximum(
                acc_s[2:3, :], jnp.max(jnp.abs(args), axis=0, keepdims=True)
            )
            if _ABLATE.get("notrig"):
                Sn = args * 0.11
                Cs = args * 0.13
                Th = args * 0.17
            elif _ABLATE.get("libtrig"):
                Sn = jnp.sin(args)
                Cs = jnp.cos(args)
                Th = jnp.tanh(args)
            else:
                # builtin tanh stays: an Eigen-style deg-13/6 rational was
                # measured +2.5 us/step (the VPU divide costs more than the
                # builtin's polynomial path)
                Sn, Cs = _fast_sincos(args)
                Th = jnp.tanh(args)
            maskb = aug[:, 0:1]
            basis = (Sn * msin + Cs * mcos + Th * mtanh) * maskb
            D = theta + basis
            A = D * crow
            Ah, Al = _split(A)

            # ax and ga share the LHS 3-pass structure: contract A^T against
            # [X | A] once (the hi/lo cross terms line up exactly)
            m_pad = xh.shape[1]
            if _ABLATE.get("noaxga"):
                ax_s[:] = ax_s[:] + _d(Ah, xh, _AXD)
                ga_s[:] = ga_s[:] + _d(Ah, Ah, _AXD)
            elif _ABLATE.get("ga1pass") or getattr(cfg, "ga_single_pass", False):
                # keep the full 3-pass contraction for ax (its X-cancellation
                # terms need the ~5e-6 contract) but drop the hi/lo
                # correction passes on the A Gram only (~2e-3 single-pass
                # bf16). Splits the shared [X|A] concat, so the win is 2
                # passes of the ga half minus the lost fusion: measured -3.7
                # us/step on cylinder with full-length convergence unchanged
                # (configs.RunConfig.ga_single_pass; A/B + convergence
                # evidence in docs/RESULTS.md round 5).
                ax_s[:] = ax_s[:] + (
                    _d(Ah, xh, _AXD) + _d(Ah, xl, _AXD) + _d(Al, xh, _AXD)
                )
                ga_s[:] = ga_s[:] + _d(Ah, Ah, _AXD)
            elif _ABLATE.get("noconcat"):
                ax_s[:] = ax_s[:] + (
                    _d(Ah, xh, _AXD) + _d(Ah, xl, _AXD) + _d(Al, xh, _AXD)
                )
                ga_s[:] = ga_s[:] + (
                    _d(Ah, Ah, _AXD) + _d(Ah, Al, _AXD) + _d(Al, Ah, _AXD)
                )
            else:
                rhs_h = jnp.concatenate([xh, Ah], axis=1)
                rhs_l = jnp.concatenate([xl, Al], axis=1)
                axga = _d(Ah, rhs_h, _AXD) + _d(Ah, rhs_l, _AXD) + _d(Al, rhs_h, _AXD)
                ax_s[:] = ax_s[:] + axga[:, :m_pad]
                ga_s[:] = ga_s[:] + axga[:, m_pad:]
            auga_s[:] = auga_s[:] + (
                _d(ah, ah, _AXD) + _d(ah, al, _AXD) + _d(al, ah, _AXD)
            )
            dA = (2.0 / nm) * (_dot3(A, gb_s[:], _STD) - xb)
            dD = dA * crow
            dtheta = dD * polymask
            if _ABLATE.get("noderiv"):
                deriv = Th
            else:
                deriv = Cs * msin - Sn * mcos + (1.0 - Th * Th) * mtanh
            darg = dD * trigmask * deriv

            if not _ABLATE.get("noacc"):
                acc_s[0:1, :] = acc_s[0:1, :] + jnp.sum(dA * D, axis=0, keepdims=True)
                latrep = prod * trigmask
                acc_s[1:2, :] = acc_s[1:2, :] + jnp.sum(darg * latrep, axis=0, keepdims=True)

            dl = _dot2(darg * omrow, SEL(0))  # trig -> aug lanes
            # poly backward: d theta_t / d lat_i = E[t,i] * theta_t / lat_i —
            # one matmul against the exact-int EMAT + a guarded division
            # (lat == 0 only on padded/masked rows, where the phi gradient is
            # multiplied by pod == 0 anyway; the fallback 0 also covers a
            # live phi crossing exactly 0.0, a measure-zero single-row event)
            if not _ABLATE.get("nopoly"):
                s_poly = _dot2(dtheta * theta, SEL(2))
                augmask = mrow_ref[6:7, :]
                denom = jnp.where(aug == 0.0, 1.0, aug)
                dl = dl + jnp.where(aug == 0.0, 0.0, s_poly / denom) * augmask
            if streamed:
                dlout_ref[0 if aliased else _parity_out(s)] = dl[:, :augw]
            else:
                dlat[tile, :] = dl

            # ---------------- step finalize (last tile)
            @pl.when(t == n_tiles - 1)
            def _():
                offdiag = SEL(1).astype(jnp.float32)
                bv = bfull_s[:] if fourier else b_ref[:]
                coefmask = polymask + trigmask
                lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                maxarg = jnp.max(acc_s[2:3, :])
                if SEEDS == 1:
                    rec = (
                        jnp.sum(ga_s[:] * gb_s[:])
                        - 2.0 * jnp.sum(ax_s[:] * bv)
                        + x_sq
                    ) / nm
                    orthov = 0.5 * jnp.sum(jnp.abs(auga_s[:] * offdiag))
                    l1v = jnp.sum(jnp.abs(crow_ref[0:1, :]) * coefmask)
                    total = rec + beta * orthov + lam * l1v
                    met_row = jnp.where(
                        lane_i == 0,
                        rec,
                        jnp.where(
                            lane_i == 1,
                            orthov,
                            jnp.where(
                                lane_i == 2,
                                l1v,
                                jnp.where(
                                    lane_i == 3,
                                    total,
                                    jnp.where(lane_i == 4, maxarg, 0.0),
                                ),
                            ),
                        ),
                    )
                else:
                    # per-seed metrics: block sums via the SEEDSEL / AUGSEL
                    # selection matmuls (gb is block-masked, so ga*gb and the
                    # cross term group cleanly by seed block). Lane si of
                    # each *_row holds seed si's value.
                    # divergence isolation: ga/auga carry non-finite CROSS-
                    # seed entries once one seed diverges; the zero masks
                    # (block-diagonal gb, within-seed offdiag) turn them into
                    # NaN*0 = NaN, so select instead of multiplying by 0
                    gg = jnp.where(gb_s[:] == 0.0, 0.0, ga_s[:] * gb_s[:])
                    gagb_col = jnp.sum(gg, axis=0, keepdims=True)
                    rec_gram = _seed_reduce(gagb_col, SEL(3))
                    wv = jnp.sum(ax_s[:] * bv, axis=1, keepdims=True)
                    cross_row = _seed_reduce(wv, SEL(3), _AXD)
                    rec_row = (rec_gram - 2.0 * cross_row + x_sq) / nm
                    ao = jnp.where(
                        offdiag == 0.0, 0.0, jnp.abs(auga_s[:] * offdiag)
                    )
                    w2 = jnp.sum(ao, axis=1, keepdims=True)
                    ortho_row = 0.5 * _seed_reduce(w2, SEL(4), _AXD)
                    ca = jnp.abs(crow_ref[0:1, :]) * coefmask
                    l1_row = _seed_reduce(ca, SEL(3))
                    # per-seed loss weights (lane si = seed si, matching the
                    # *_row reductions); ortho/l1 rows are zero beyond lane S,
                    # so the masked splat changes nothing off the seed lanes
                    beta_row = jnp.zeros((1, LANES), jnp.float32)
                    lam_row = jnp.zeros((1, LANES), jnp.float32)
                    for si in range(SEEDS):
                        svs = svec_ref[si : si + 1, :]
                        beta_row = jnp.where(
                            lane_i == si, _lane(svs, _L_BETA), beta_row
                        )
                        lam_row = jnp.where(
                            lane_i == si, _lane(svs, _L_LAM), lam_row
                        )
                    total_row = rec_row + beta_row * ortho_row + lam_row * l1_row
                    # met lanes per seed: 8*si + (rec, ortho, l1, total,
                    # global maxarg)
                    met_row = jnp.zeros((1, LANES), jnp.float32)
                    for si in range(SEEDS):
                        vals = (
                            _lane(rec_row, si),
                            _lane(ortho_row, si),
                            _lane(l1_row, si),
                            _lane(total_row, si),
                            maxarg,
                        )
                        for j, v in enumerate(vals):
                            met_row = jnp.where(lane_i == 8 * si + j, v, met_row)
                # metrics blocks are (8, 128): row s % 8 within block s // 8
                met_ref[pl.ds(jnp.remainder(s, 8), 1), :] = met_row
                sign_s[:] = jnp.sign(auga_s[:]) * offdiag

                sv = svec_ref[0:1, :]
                count = _lane(sv, _L_COUNT) + 1.0
                powb = _lane(sv, _L_POW) * _B1
                bias = 1.0 - powb
                if SEEDS == 1:
                    lr_coef = _lane(sv, _LR0 + 0)
                    lr_phi = _lane(sv, _LR0 + 1)
                    lr_z = _lane(sv, _LR0 + 2)
                    lr_om = _lane(sv, _LR0 + 3)
                    lr_per = _lane(sv, _LR0 + 4) if fourier else None
                    lr_z_rows = lr_z
                    lam_w = lam
                    ga_use = ga_s[:]
                else:
                    # per-seed group LRs splat onto each seed's lanes/rows
                    # (exact: scalar where-selects, no matmul rounding)
                    row_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
                    lr_coef = jnp.zeros((1, LANES), jnp.float32)
                    lr_om = jnp.zeros((1, LANES), jnp.float32)
                    lr_z = jnp.zeros((LANES, 1), jnp.float32)
                    lr_per = jnp.zeros((LANES, 1), jnp.float32) if fourier else None
                    lam_w = jnp.zeros((1, LANES), jnp.float32)
                    lr_phi_seed = []
                    for si in range(SEEDS):
                        svs = svec_ref[si : si + 1, :]
                        inw = jnp.logical_and(
                            lane_i >= si * K, lane_i < (si + 1) * K
                        )
                        inr = jnp.logical_and(
                            row_i >= si * K, row_i < (si + 1) * K
                        )
                        lr_coef = jnp.where(inw, _lane(svs, _LR0 + 0), lr_coef)
                        lr_om = jnp.where(inw, _lane(svs, _LR0 + 3), lr_om)
                        lam_w = jnp.where(inw, _lane(svs, _L_LAM), lam_w)
                        lr_z = jnp.where(inr, _lane(svs, _LR0 + 2), lr_z)
                        if fourier:
                            lr_per = jnp.where(
                                inr, _lane(svs, _LR0 + 4), lr_per
                            )
                        lr_phi_seed.append(_lane(svs, _LR0 + 1))
                    # the fourier series/period state is (kp, .)-shaped;
                    # match the row-splat LR columns to it
                    lr_z_rows = lr_z[0:kp]
                    if fourier:
                        lr_per = lr_per[0:kp]
                    ga_use = ga_s[:] * SEL(5).astype(jnp.float32)

                # ---- B (temporal z / z_trig rows), group 'z'
                gB = (2.0 / nm) * (_dot3(ga_use, bv, _STD) - ax_s[:])
                if fourier:
                    # backprop the B gradient through the Fourier series into
                    # the coefficient block (group 'z') and the per-channel
                    # learnable periods (group 'period'): dB/da_k = cos(k th),
                    # dB/db_k = sin(k th) are per-channel lane reductions;
                    # dB/dperiod = dB/dth * (-th / period). Harmonics are
                    # rebuilt by the same recurrence from the stashed base
                    # cos/sin (c1_s/s1_s) of THIS step's forward.
                    tmask = trow_ref[1:2, :]
                    gBk = gB[0:kp, :] * tmask

                    def rowsum(v):
                        return jnp.sum(v, axis=1, keepdims=True)

                    gzc_s[:, 0:1] = rowsum(gBk)
                    c1 = c1_s[:]
                    s1 = s1_s[:]
                    ck, sk = c1, s1
                    gzc_s[:, 1:2] = rowsum(gBk * ck)
                    gzc_s[:, 2:3] = rowsum(gBk * sk)
                    dbdt = zc_ref[:, 2:3] * ck - zc_ref[:, 1:2] * sk
                    for k in range(2, nf + 1):
                        ckn = ck * c1 - sk * s1
                        skn = sk * c1 + ck * s1
                        gzc_s[:, 2 * k - 1 : 2 * k] = rowsum(gBk * ckn)
                        gzc_s[:, 2 * k : 2 * k + 1] = rowsum(gBk * skn)
                        dbdt = dbdt + float(k) * (
                            zc_ref[:, 2 * k : 2 * k + 1] * ckn
                            - zc_ref[:, 2 * k - 1 : 2 * k] * skn
                        )
                        ck, sk = ckn, skn
                    gper = -(1.0 / per_ref[:, 0:1]) * rowsum(
                        gBk * dbdt * th_s[:]
                    )
                    gzc = gzc_s[:]
                    zmu = _B1 * zcmu_ref[:] + (1.0 - _B1) * gzc
                    znu = jnp.maximum(_B2 * zcnu_ref[:], jnp.abs(gzc) + _EPS)
                    zc_ref[:] = zc_ref[:] - (lr_z_rows / bias) * zmu / znu
                    zcmu_ref[:] = zmu
                    zcnu_ref[:] = znu
                    pmu = _B1 * per_ref[:, 1:2] + (1.0 - _B1) * gper
                    pnu = jnp.maximum(_B2 * per_ref[:, 2:3], jnp.abs(gper) + _EPS)
                    per_ref[:, 0:1] = per_ref[:, 0:1] - (lr_per / bias) * pmu / pnu
                    per_ref[:, 1:2] = pmu
                    per_ref[:, 2:3] = pnu
                else:
                    bmu = _B1 * bmu_ref[:] + (1.0 - _B1) * gB
                    bnu = jnp.maximum(_B2 * bnu_ref[:], jnp.abs(gB) + _EPS)
                    b_ref[:] = bv - (lr_z / bias) * bmu / bnu
                    bmu_ref[:] = bmu
                    bnu_ref[:] = bnu

                # ---- coefficient row (c + c_trig), group 'coef', with L1
                crow_v = crow_ref[0:1, :]
                gC = acc_s[0:1, :] + lam_w * jnp.sign(crow_v) * coefmask
                cmu = _B1 * crow_ref[1:2, :] + (1.0 - _B1) * gC
                cnu = jnp.maximum(_B2 * crow_ref[2:3, :], jnp.abs(gC) + _EPS)
                crow_new = crow_v - (lr_coef / bias) * cmu / cnu

                # ---- omega row, group 'omega'
                om_v = crow_ref[3:4, :]
                gO = acc_s[1:2, :]
                omu = _B1 * crow_ref[4:5, :] + (1.0 - _B1) * gO
                onu = jnp.maximum(_B2 * crow_ref[5:6, :], jnp.abs(gO) + _EPS)
                om_new = om_v - (lr_om / bias) * omu / onu

                crow_ref[0:1, :] = crow_new
                crow_ref[1:2, :] = cmu
                crow_ref[2:3, :] = cnu
                crow_ref[3:4, :] = om_new
                crow_ref[4:5, :] = omu
                crow_ref[5:6, :] = onu

                # ---- plateau scheduler (torch ReduceLROnPlateau semantics,
                # stepped with this step's pre-update total, on the
                # sched_every cadence; see optim.plateau_step / train._sched_update).
                # One svec row per packed seed, each driven by its own total.
                lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                is_lr = lanes < 5

                def put(vec, k, val):
                    return jnp.where(lanes == k, val, vec)

                for si in range(SEEDS):
                    if SEEDS == 1:
                        svs, total_s, lr_phi_used = sv, total, lr_phi
                    else:
                        svs = svec_ref[si : si + 1, :]
                        total_s = _lane(total_row, si)
                        lr_phi_used = lr_phi_seed[si]
                    best = _lane(svs, _L_BEST)
                    num_bad = _lane(svs, _L_NUMBAD)
                    epoch = _lane(svs, _L_EPOCH)
                    improved = total_s < best * (1.0 - _SCHED_THRESHOLD)
                    best_n = jnp.where(improved, total_s, best)
                    nb = jnp.where(improved, 0.0, num_bad + 1.0)
                    red = nb > patience
                    lrs = svs * jnp.where(is_lr, 1.0, 0.0)
                    stepped = jnp.where(
                        red, jnp.maximum(lrs * sched_factor, sched_min_lr), lrs
                    )
                    nb = jnp.where(red, 0.0, nb)
                    do_sched = jnp.mod(epoch, sched_every) == 0.0
                    lrs_n = jnp.where(do_sched, stepped, lrs)
                    best_n = jnp.where(do_sched, best_n, best)
                    # num_bad when not scheduled stays unchanged (reference
                    # quirk: the scheduler is only consulted every
                    # sched_every epochs)
                    nb_n = jnp.where(do_sched, nb, num_bad)

                    new_sv = jnp.where(is_lr, lrs_n, 0.0)
                    new_sv = put(new_sv, _L_BEST, best_n)
                    new_sv = put(new_sv, _L_POW, powb)
                    new_sv = put(new_sv, _L_COUNT, count)
                    new_sv = put(new_sv, _L_NUMBAD, nb_n)
                    new_sv = put(new_sv, _L_LRPHI_USED, lr_phi_used)
                    new_sv = put(new_sv, _L_BIAS_USED, bias)
                    new_sv = put(new_sv, _L_EPOCH, epoch + 1.0)
                    # per-seed loss weights persist unchanged (read back next
                    # step by the phi/coef/metric sites)
                    new_sv = put(new_sv, _L_BETA, _lane(svs, _L_BETA))
                    new_sv = put(new_sv, _L_LAM, _lane(svs, _L_LAM))
                    svec_ref[si : si + 1, :] = new_sv

    return kernel


@functools.lru_cache(maxsize=8)
def _build_call(
    r, P, n, m, n_pad, m_pad, num_steps, bt, beta, lam, cfg, interpret,
    transport, nf=0, n_seeds=1,
):
    T = library.num_poly_terms(r, P)
    K = T + 3 * r
    # seed-packed fourier stacks S seeds' channels as extra series rows
    # ([s*K, (s+1)*K) = seed s, matching the B/lane layout); the row-parallel
    # series recurrence and its backward need no other change
    kp = _round_up(K * n_seeds, 8)
    fourier = nf > 0
    streamed = transport != "resident"
    n_tiles = n_pad // bt
    consts = build_constants(r, P, n_seeds)
    augw = aug_width(r, n_seeds)
    kernel = _make_kernel(
        r, P, T, K, n, m, num_steps, n_tiles, bt, beta, lam, cfg, transport,
        nf=nf, kp=kp, n_seeds=n_seeds,
    )
    S = num_steps

    def tmap(s, t):
        return (t, 0)

    def cmap(s, t):
        return (0, 0)

    def initmap(s, t):
        # the init-state stream is only read at s == 0; afterwards pin the
        # index so the blocks are never re-fetched (a plain (t, 0) map would
        # re-stream dead DMA on every optimizer step)
        return (jnp.where(s < 1, t, n_tiles - 1), 0)

    def finalmap(s, t):
        # final-state streams are only written during the terminal update
        # sweep (s == num_steps); pinning the index earlier avoids flushing
        # the unwritten buffer to HBM on every tile visit
        return (jnp.where(s < S, 0, t), 0)

    def metmap(s, t):
        return (jnp.minimum(s, S - 1) // 8, 0)

    def pingmap_in(s, t):
        # read the state written LAST step: parity (s-1) % 2 (garbage at s=0,
        # guarded by the s > 0 condition on the reader)
        return (_parity_in(s), t, 0)

    def pingmap_out(s, t):
        return (_parity_out(s), t, 0)

    def bothmap(s, t):
        return (0, t, 0)

    # streamed state travels compact: phi/mu/nu as augw-lane slots of one
    # ping-pong array, dlat as its own augw-lane array (see the kernel's
    # state-access comment)
    stw = 3 * augw
    st_blk = pl.BlockSpec((1, bt, stw), pingmap_in, memory_space=pltpu.VMEM)
    dl_blk = pl.BlockSpec((1, bt, augw), pingmap_in, memory_space=pltpu.VMEM)
    if transport == "emul":
        # both parities of the tile in one block; parity picked in-kernel
        st_out_blk = pl.BlockSpec((2, bt, stw), bothmap, memory_space=pltpu.VMEM)
        dl_out_blk = pl.BlockSpec((2, bt, augw), bothmap, memory_space=pltpu.VMEM)
    else:
        st_out_blk = pl.BlockSpec((1, bt, stw), pingmap_out, memory_space=pltpu.VMEM)
        dl_out_blk = pl.BlockSpec((1, bt, augw), pingmap_out, memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((2, n_pad, stw), jnp.float32)
    dl_shape = jax.ShapeDtypeStruct((2, n_pad, augw), jnp.float32)

    in_specs = [
        pl.BlockSpec((consts.n_sel * LANES, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        (
            pl.BlockSpec((bt, augw), tmap, memory_space=pltpu.VMEM)
            if streamed
            else pl.BlockSpec((n_pad, LANES), cmap, memory_space=pltpu.VMEM)
        ),
        pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, m_pad), tmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, stw), initmap, memory_space=pltpu.VMEM),
    ]
    if fourier:
        in_specs += [
            pl.BlockSpec((kp, LANES), cmap, memory_space=pltpu.VMEM),  # zc0
            pl.BlockSpec((kp, LANES), cmap, memory_space=pltpu.VMEM),  # zcmu0
            pl.BlockSpec((kp, LANES), cmap, memory_space=pltpu.VMEM),  # zcnu0
            pl.BlockSpec((kp, LANES), cmap, memory_space=pltpu.VMEM),  # per0
            pl.BlockSpec((8, m_pad), cmap, memory_space=pltpu.VMEM),  # trow
        ]
    else:
        in_specs += [
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # bmu0
            pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM),  # bnu0
        ]
    in_specs += [
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((8, LANES), metmap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((_round_up(num_steps, 8), LANES), jnp.float32),
    ]
    if fourier:
        small_outs = [pl.BlockSpec((kp, LANES), cmap, memory_space=pltpu.VMEM)] * 4
        small_shapes = [jax.ShapeDtypeStruct((kp, LANES), jnp.float32)] * 4
    else:
        small_outs = [pl.BlockSpec((LANES, m_pad), cmap, memory_space=pltpu.VMEM)] * 3
        small_shapes = [jax.ShapeDtypeStruct((LANES, m_pad), jnp.float32)] * 3
    small_outs += [
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), cmap, memory_space=pltpu.VMEM),
    ]
    small_shapes += [
        jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((LANES, m_pad), jnp.float32),  # ax
        pltpu.VMEM((LANES, LANES), jnp.float32),  # ga
        pltpu.VMEM((LANES, LANES), jnp.float32),  # auga
        pltpu.VMEM((LANES, LANES), jnp.float32),  # gb
        pltpu.VMEM((LANES, m_pad), jnp.bfloat16),  # b hi
        pltpu.VMEM((LANES, m_pad), jnp.bfloat16),  # b lo
        pltpu.VMEM((8, LANES), jnp.float32),  # acc rows
        pltpu.VMEM((LANES, LANES), jnp.float32),  # ortho sign matrix
    ]
    if fourier:
        scratch += [
            pltpu.VMEM((LANES, m_pad), jnp.float32),  # bfull (series B)
            pltpu.VMEM((kp, m_pad), jnp.float32),  # theta
            pltpu.VMEM((kp, m_pad), jnp.float32),  # cos(theta)
            pltpu.VMEM((kp, m_pad), jnp.float32),  # sin(theta)
            pltpu.VMEM((kp, LANES), jnp.float32),  # series-coefficient grads
        ]
    n_in = len(in_specs)
    io_aliases = {}
    if streamed:
        if transport == "aliased":
            in_specs += [st_blk, dl_blk]  # stin, dlin
            # stin/dlin alias stout/dlout (met + small outs precede them)
            n_small = 1 + len(small_outs)
            io_aliases = {n_in + i: n_small + i for i in range(2)}
        out_specs += small_outs + [st_out_blk, dl_out_blk]
        out_shape += small_shapes + [st_shape, dl_shape]
        scratch = [
            pltpu.VMEM((bt, stw), jnp.float32),  # cur phi/mu/nu slots
        ] + scratch
    else:
        out_specs += [
            pl.BlockSpec((bt, LANES), finalmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, LANES), finalmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, LANES), finalmap, memory_space=pltpu.VMEM),
        ] + small_outs
        out_shape += [
            jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
        ] + small_shapes
        scratch = [
            pltpu.VMEM((n_pad, LANES), jnp.float32),  # phis
            pltpu.VMEM((n_pad, LANES), jnp.float32),  # mus
            pltpu.VMEM((n_pad, LANES), jnp.float32),  # nus
            pltpu.VMEM((n_pad, LANES), jnp.float32),  # dlat
        ] + scratch

    grid = (num_steps + 1, n_tiles)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,
                pltpu.GridDimensionSemantics.ARBITRARY,
            ),
        ),
        interpret=interpret,
    )
    return call, consts


def _pack_aug(vec_rn, n_pad, lane0=None, width=LANES):
    """(r, n) -> (n_pad, width) with lanes 1..r; lane 0 = lane0 (or 0)."""
    r, n = vec_rn.shape
    out = jnp.zeros((n_pad, width), jnp.float32)
    out = out.at[:n, 1 : r + 1].set(vec_rn.T.astype(jnp.float32))
    if lane0 is not None:
        out = out.at[:, 0].set(lane0)
    return out


def _unpack_aug(fw, r, n):
    return fw[:n, 1 : r + 1].T


def _pack_b(z, z_trig, T, m_pad):
    """z (T, m) + z_trig (3, r, m) -> B rows (128, m_pad), WIDE row order."""
    m = z.shape[1]
    out = jnp.zeros((LANES, m_pad), jnp.float32)
    out = out.at[:T, :m].set(z.astype(jnp.float32))
    zt = z_trig.reshape(-1, m)  # kind-major (3r, m) == temporal_matrix order
    out = out.at[T : T + zt.shape[0], :m].set(zt.astype(jnp.float32))
    return out


def _unpack_b(bfw, T, r, m):
    z = bfw[:T, :m]
    zt = bfw[T : T + 3 * r, :m].reshape(3, r, m)
    return z, zt


def _pack_series(z, z_trig, T, kp):
    """Fourier series coefficients: z (T, ncoef) + z_trig (3, r, ncoef) ->
    (kp, 128), rows in WIDE channel order, lanes = [a0, a1, b1, a2, b2, ...]."""
    ncoef = z.shape[-1]
    zt = z_trig.reshape(-1, ncoef)
    out = jnp.zeros((kp, LANES), jnp.float32)
    out = out.at[: z.shape[0], :ncoef].set(z.astype(jnp.float32))
    out = out.at[T : T + zt.shape[0], :ncoef].set(zt.astype(jnp.float32))
    return out


def _unpack_series(fw, T, r, ncoef):
    z = fw[:T, :ncoef]
    zt = fw[T : T + 3 * r, :ncoef].reshape(3, r, ncoef)
    return z, zt


def _pack_periods(period, trig_period, mu_p, mu_tp, nu_p, nu_tp, T, kp):
    """Learnable periods + their Adamax moments: lane 0 = period (1.0 on the
    padding rows so 1/period stays finite), lane 1 = mu, lane 2 = nu."""

    def col(a, b):
        v = jnp.concatenate(
            [a.astype(jnp.float32).reshape(-1), b.astype(jnp.float32).reshape(-1)]
        )
        return v

    out = jnp.zeros((kp, LANES), jnp.float32)
    out = out.at[:, 0].set(1.0)
    k = T + trig_period.size
    out = out.at[:k, 0].set(col(period, trig_period))
    out = out.at[:k, 1].set(col(mu_p, mu_tp))
    out = out.at[:k, 2].set(col(nu_p, nu_tp))
    return out


def _unpack_periods(fw, T, r):
    lane0 = fw[:, 0]
    lane1 = fw[:, 1]
    lane2 = fw[:, 2]

    def split(v):
        return v[:T], v[T : T + 3 * r].reshape(3, r)

    return split(lane0), split(lane1), split(lane2)


def _pack_wide_row(c, c_trig, T, r):
    row = jnp.zeros((LANES,), jnp.float32)
    row = row.at[:T].set(c.astype(jnp.float32))
    row = row.at[T : T + 3 * r].set(c_trig.reshape(-1).astype(jnp.float32))
    return row


def _unpack_wide_row(row, T, r):
    return row[:T], row[T : T + 3 * r].reshape(3, r)


def supports(spec, cfg) -> bool:
    """Whether the mega-kernel can run this configuration: DESMO or
    DESMOFourier variant with all K terms within one lane register, and the
    constant tables in bounds (the P factor-gather rows live in an (8, 128)
    block). The Fourier temporal side additionally needs its 2*nF+1 series
    coefficients within one lane register (spec must be a FourierSpec). Any
    spatial size works — small cases keep the state resident in VMEM; larger
    ones (aneurysm n=27000) ping-pong the state through HBM
    (``resident_fits`` decides)."""
    variant = getattr(cfg, "variant", "desmo")
    if variant == "fourier":
        nf = getattr(spec, "n_fourier", 0)
        if not 1 <= nf <= 63:  # ncoef = 2nF+1 lanes; grads use lanes 0..2nF
            return False
    elif variant != "desmo":
        return False
    r, P = spec.r, spec.poly_order
    T = library.num_poly_terms(r, P)
    return T + 3 * r <= LANES and P <= 8 and r <= 8


def supports_packed(spec, cfg, n_seeds: int) -> bool:
    """Whether the SEED-PACKED mega-kernel can run ``n_seeds`` models in one
    lane register (``ensemble.py``): desmo or fourier variant, S*K wide lanes
    and 1 + S*r aug lanes within 128. Fourier additionally stacks the seeds'
    series channels as ROWS of the (kp, 128) coefficient/period blocks
    (row [s*K, (s+1)*K) = seed s, matching the lane layout) and needs its
    2nF+1 coefficients within one lane register like the single-seed kernel."""
    variant = getattr(cfg, "variant", "desmo")
    if variant == "fourier":
        if not 1 <= getattr(spec, "n_fourier", 0) <= 63:
            return False
    elif variant != "desmo":
        return False
    if n_seeds < 1:
        return False
    r, P = spec.r, spec.poly_order
    K = library.num_poly_terms(r, P) + 3 * r
    return (
        n_seeds * K <= LANES
        and 1 + n_seeds * r <= LANES
        # one svec scheduler row per seed (the svec block is (8, 128)), and
        # the per-seed metric lanes live at 8*si + j; larger S falls back to
        # the packed scan chunk, which has no seed-count ceiling
        and n_seeds <= 8
        and P <= 8
        and r <= 8  # same tested rank ceiling as supports()
    )


def loss_method_allows_kernel(cfg) -> bool:
    """ONE policy gate for "may a fused/mega kernel replace the scan chunk":
    an explicit non-fused ``cfg.loss_method`` requests the scan path's
    numerics class, which auto-selection must respect (only an explicit
    ``chunk_method='megakernel'`` overrides it). ``select_chunk``,
    ``select_ensemble_chunk`` and ``runner.run``'s mesh branch all consult
    this — don't re-roll the predicate."""
    return getattr(cfg, "loss_method", "auto") in ("auto", "fused")


def select_chunk(spec, cfg, bt: int = _BT_DEFAULT):
    """The single chunk-selection policy shared by runner/bench: returns the
    mega-kernel chunk, or None for the scanned path.

    ``cfg.chunk_method``: 'scan' always scans; 'megakernel' requires the
    mega-kernel (ValueError if unsupported); 'auto' picks it on TPU for the
    desmo/fourier variants when the loss method resolves to the fused path."""
    method = getattr(cfg, "chunk_method", "auto")
    variant = getattr(cfg, "variant", "desmo")
    if method == "scan":
        return None
    if method == "megakernel":
        if variant == "ae":
            from desmo_tpu.pallas import ae_chunk

            if not ae_chunk.ae_supports(spec, cfg, bt):
                raise ValueError(
                    f"chunk_method='megakernel' but AE preset {cfg.name!r} is "
                    "not supported — see pallas.ae_chunk.ae_supports"
                )
            return ae_chunk.make_ae_fused_chunk(spec, cfg, bt)
        if not supports(spec, cfg):
            raise ValueError(
                f"chunk_method='megakernel' but preset {cfg.name!r} is not "
                "supported (variant/terms) — see pallas.train_chunk.supports"
            )
        return make_fused_train_chunk(spec, cfg, bt)
    if jax.default_backend() != "tpu":
        return None
    if not loss_method_allows_kernel(cfg):
        return None
    if variant == "ae":
        # The AE mega-kernel is measured SLOWER than the scanned path on
        # hardware (round 4: Mosaic serializes the narrow-funnel chain; see
        # docs/RESULTS.md "AE mega-kernel") — auto keeps the scanned chunk;
        # chunk_method='megakernel' opts in explicitly.
        return None
    if not supports(spec, cfg):
        return None
    return make_fused_train_chunk(spec, cfg, bt)


def select_ensemble_chunk(
    spec, cfg, n_seeds: int, bt: int = _BT_DEFAULT, device_mesh=None,
    betas=None, lams=None,
):
    """Chunk-selection policy for the lane-packed multi-seed trainer
    (``ensemble.fit``), mirroring ``select_chunk``: the seed-packed
    mega-kernel on TPU when the pack fits, else None (packed scan).
    Under a ``device_mesh`` the kernel form is the SHARDED seed-packed
    megastep (``shard_step.make_sharded_fused_ensemble_chunk`` — seeds in
    lanes x rows over 'space'); an explicit ``chunk_method='megakernel'``
    request errors rather than degrading when that kernel can't apply.
    ``betas``/``lams`` (optional, length n_seeds) are the per-seed loss
    weights of the hyperparameter multi-start, forwarded to whichever packed
    kernel is selected."""
    method = getattr(cfg, "chunk_method", "auto")
    if method == "scan":
        return None
    if device_mesh is not None:
        from desmo_tpu.pallas import shard_step

        if not shard_step.supports_sharded_packed(spec, cfg, n_seeds):
            if method == "megakernel":
                raise ValueError(
                    f"chunk_method='megakernel' with a device mesh but "
                    f"preset {cfg.name!r} at S={n_seeds} has no sharded "
                    "seed-packed kernel — see "
                    "shard_step.supports_sharded_packed"
                )
            return None
        if method != "megakernel" and (
            jax.default_backend() != "tpu"
            # same gate as the single-chip auto branch below: adding a mesh
            # must not silently override an explicit loss_method
            or not loss_method_allows_kernel(cfg)
        ):
            return None
        return shard_step.make_sharded_fused_ensemble_chunk(
            spec, cfg, device_mesh, n_seeds, bt, betas=betas, lams=lams
        )
    if method == "megakernel":
        if not supports_packed(spec, cfg, n_seeds):
            raise ValueError(
                f"chunk_method='megakernel' but {n_seeds} seeds don't pack "
                f"for preset {cfg.name!r} — see train_chunk.supports_packed"
            )
        return make_fused_ensemble_chunk(spec, cfg, n_seeds, bt, betas=betas, lams=lams)
    if jax.default_backend() != "tpu":
        return None
    if not loss_method_allows_kernel(cfg):
        return None
    if not supports_packed(spec, cfg, n_seeds):
        return None
    return make_fused_ensemble_chunk(spec, cfg, n_seeds, bt, betas=betas, lams=lams)


def resident_fits(spec, cfg, bt: int = _BT_DEFAULT, vmem_budget_mb: float = 30.0) -> bool:
    """Whether the RESIDENT variant's VMEM working set (full-width
    phi/mu/nu/dlat scratch + resident pod + B-state + X stream blocks) fits
    the budget empirically validated on v5e (~35 MB compiles; 30 MB margin).
    Beyond it, make_fused_train_chunk switches to the streamed-state variant
    (state ping-pongs through aliased HBM arrays; ~n-independent VMEM)."""
    n_pad = _round_up(spec.n, bt)
    m_pad = _round_up(spec.m, LANES)
    mb = 1 / (1024 * 1024)
    state = 4 * n_pad * LANES * 4 * mb  # phi/mu/nu/dlat scratch
    init_streams = (2 * bt * 3 * AUGW * 4 + n_pad * LANES * 4) * mb
    b_state = 10 * LANES * m_pad * 4 * mb  # B in/out/moments + ax + gb rows
    x_stream = 2 * 2 * bt * m_pad * 2 * mb  # double-buffered bf16 planes
    return state + init_streams + b_state + x_stream + 2.0 < vmem_budget_mb


def packed_resident_fits(spec, cfg, bt: int = _BT_DEFAULT, n_seeds: int = 1) -> bool:
    """Resident-mode feasibility for the SEED-PACKED kernel.

    The PACKED fourier kernel hits Mosaic's 16 MB SCOPED-stack vmem pool
    before the ~30 MB total-VMEM budget ``resident_fits`` models: measured
    on fourier_cylinder (n=3961, m=1001, 2026-08-20) the resident stack is
    ~13.9 MB + ~0.94 MB/seed (S=4: 17.61M, S=8: 21.36M — compile OOM
    "scoped allocation ... limit 16.00M"; this is what silently erased
    BENCH_r04's ensemble_fourier entry). The streamed transport moves the
    state scratch to HBM and S=8 compiles AND runs (measured 1.13-1.16x
    single-seed cost = ~7x seed throughput). Packed desmo is unaffected
    (cylinder S=2 resident compiles); single-seed keeps the 30 MB budget —
    its resident kernel fits the scoped pool at these shapes."""
    fourier_packed = getattr(cfg, "variant", "desmo") == "fourier" and n_seeds > 1
    budget = 16.0 if fourier_packed else 30.0
    return resident_fits(spec, cfg, bt, vmem_budget_mb=budget)


def prepare_batch(x, pod_modes, bt: int = _BT_DEFAULT, bm: int = LANES, n_mult: int | None = None):
    """Pad + hi/lo-split X once, outside the chunk, to (bt, bm) multiples;
    returns the batch dict the mega-kernel consumes. ``n_mult`` overrides the
    row-padding multiple (the sharded chunk needs bt * n_space so every
    device owns whole tiles)."""
    x = jnp.asarray(x, jnp.float32)
    n, m = x.shape
    xp = jnp.pad(x, ((0, _round_up(n, n_mult or bt) - n), (0, _round_up(m, bm) - m)))
    hi = xp.astype(jnp.bfloat16)
    lo = (xp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return {
        "x": x,
        "pod_modes": jnp.asarray(pod_modes, jnp.float32),
        "x_hi": hi,
        "x_lo": lo,
        "x_sq": jnp.sum(x * x),
    }


def make_fused_train_chunk(
    spec, cfg, bt: int = _BT_DEFAULT, interpret: bool | None = None,
    streamed: bool | None = None,
):
    """Build ``chunk(state, batch, num_steps) -> (state, metrics)`` running the
    ENTIRE chunk inside one pallas_call (the resident mega-kernel).

    Drop-in replacement for ``train.make_train_chunk`` for the DESMO and
    DESMOFourier variants; ``batch`` must carry ``pod_modes``, pre-split
    ``x_hi``/``x_lo`` (``dual_gemm.split_snapshots``) and ``x_sq``.
    ``streamed=None`` auto-selects: state resident in VMEM when it fits
    (fastest), otherwise ping-ponged through HBM (scale-free in n).
    """
    from desmo_tpu import optim, train

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if streamed is None:
        streamed = not interpret and not resident_fits(spec, cfg, bt)
    # State transport of the streamed mode: on hardware, ping-pong parities
    # are glued by input_output_aliases (in-place HBM, zero extra traffic).
    # Interpret mode snapshots aliased inputs, so there the same kernel math
    # runs in 'emul' transport instead: both parities of each tile travel in
    # one OUTPUT block and the kernel indexes the parity itself — same
    # _parity_in/_parity_out expressions, no aliasing. This keeps the
    # streamed step semantics (incl. the final-parity selection below) under
    # CPU CI; only the aliasing plumbing itself is hardware-only.
    transport = "resident" if not streamed else ("emul" if interpret else "aliased")
    r, P = spec.r, spec.poly_order
    T = spec.num_poly_terms
    n, m = spec.n, spec.m
    beta = float(cfg.beta)
    lam = float(cfg.l1_lambda)
    fourier = getattr(cfg, "variant", "desmo") == "fourier"
    nf = int(getattr(spec, "n_fourier", 0)) if fourier else 0
    if fourier and not 1 <= nf <= 63:
        raise ValueError(f"fourier mega-kernel needs 1 <= n_fourier <= 63, got {nf}")
    ncoef = 2 * nf + 1
    kp = _round_up(T + 3 * r, 8)

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def chunk(state, batch, num_steps: int):
        if num_steps < 1:
            raise ValueError(f"mega-kernel chunk needs num_steps >= 1, got {num_steps}")
        x_hi, x_lo = batch["x_hi"], batch["x_lo"]
        n_pad, m_pad = x_hi.shape
        if n_pad % bt:
            raise ValueError(f"x padding {n_pad} not a multiple of bt={bt}")
        call, consts = _build_call(
            r, P, n, m, n_pad, m_pad, int(num_steps), bt, beta, lam, cfg,
            interpret, transport, nf,
        )
        rowmask = (jnp.arange(n_pad) < n).astype(jnp.float32)
        # streamed transport ships pod compact (AUGW lanes); resident keeps
        # the full-width VMEM-resident layout. Init state is always packed
        # compact as three AUGW slots of one stream (widened in-kernel for
        # the resident scratch).
        pod_fw = _pack_aug(
            batch["pod_modes"].T, n_pad, lane0=rowmask,
            width=AUGW if streamed else LANES,
        )
        params, opt, sched = state.params, state.opt, state.sched
        init0 = jnp.concatenate(
            [
                _pack_aug(
                    params["phi"], n_pad,
                    lane0=jnp.ones((n_pad,), jnp.float32), width=AUGW,
                ),
                _pack_aug(opt.mu["phi"], n_pad, width=AUGW),
                _pack_aug(opt.nu["phi"], n_pad, width=AUGW),
            ],
            axis=1,
        )
        if fourier:
            from desmo_tpu.models import fourier as fourier_model

            zc0 = _pack_series(params["z"], params["z_trig"], T, kp)
            zcmu0 = _pack_series(opt.mu["z"], opt.mu["z_trig"], T, kp)
            zcnu0 = _pack_series(opt.nu["z"], opt.nu["z_trig"], T, kp)
            per0 = _pack_periods(
                params["period"], params["trig_period"],
                opt.mu["period"], opt.mu["trig_period"],
                opt.nu["period"], opt.nu["trig_period"], T, kp,
            )
            tp = jnp.asarray(fourier_model.t_points(m))
            trow = jnp.zeros((8, m_pad), jnp.float32)
            trow = trow.at[0, :m].set(tp)
            trow = trow.at[1, :m].set(1.0)
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

        args = [
            jnp.asarray(consts.sel),
            jnp.asarray(consts.gidx),
            mrow,
            pod_fw,
            x_hi,
            x_lo,
            init0,
        ]
        if fourier:
            args += [zc0, zcmu0, zcnu0, per0, trow]
        else:
            args += [b0, bmu0, bnu0]
        args += [crow0, svec0]
        if streamed:
            if transport == "aliased":
                # ping-pong state arrays (donated into their aliased outputs);
                # parity (s-1)%2 is never read before parity s%2 was written
                args += [
                    jnp.zeros((2, n_pad, 3 * AUGW), jnp.float32),
                    jnp.zeros((2, n_pad, AUGW), jnp.float32),
                ]
            (met, *small, stio, _dl) = call(*args)
            # generation written in the final sweep: same parity arithmetic
            # as the kernel's _parity_out at s = num_steps
            parity = int(num_steps) % 2
            st = stio[parity]
            phio = st[:, 0 * AUGW : 1 * AUGW]
            muo = st[:, 1 * AUGW : 2 * AUGW]
            nuo = st[:, 2 * AUGW : 3 * AUGW]
        else:
            (met, phio, muo, nuo, *small) = call(*args)
        if fourier:
            zcfw, zcmufw, zcnufw, perfw, crow_o, svec_o = small
        else:
            bfw, bmufw, bnufw, crow_o, svec_o = small

        phi = _unpack_aug(phio, r, n)
        mu_phi = _unpack_aug(muo, r, n)
        nu_phi = _unpack_aug(nuo, r, n)
        if fourier:
            z, z_trig = _unpack_series(zcfw, T, r, ncoef)
            mz, mzt = _unpack_series(zcmufw, T, r, ncoef)
            nz, nzt = _unpack_series(zcnufw, T, r, ncoef)
            (per, tper), (mper, mtper), (nper, ntper) = _unpack_periods(perfw, T, r)
        else:
            z, z_trig = _unpack_b(bfw, T, r, m)
            mz, mzt = _unpack_b(bmufw, T, r, m)
            nz, nzt = _unpack_b(bnufw, T, r, m)
        c, c_trig = _unpack_wide_row(crow_o[0], T, r)
        mc, mct = _unpack_wide_row(crow_o[1], T, r)
        nc, nct = _unpack_wide_row(crow_o[2], T, r)
        _, omega = _unpack_wide_row(crow_o[3], T, r)
        _, momega = _unpack_wide_row(crow_o[4], T, r)
        _, nomega = _unpack_wide_row(crow_o[5], T, r)

        new_params = {
            "phi": phi, "c": c, "z": z, "z_trig": z_trig,
            "c_trig": c_trig, "omega": omega,
        }
        new_mu = {
            "phi": mu_phi, "c": mc, "z": mz, "z_trig": mzt,
            "c_trig": mct, "omega": momega,
        }
        new_nu = {
            "phi": nu_phi, "c": nc, "z": nz, "z_trig": nzt,
            "c_trig": nct, "omega": nomega,
        }
        if fourier:
            new_params.update(period=per, trig_period=tper)
            new_mu.update(period=mper, trig_period=mtper)
            new_nu.update(period=nper, trig_period=ntper)
        nlr = sched.lrs.shape[0]
        new_sched = optim.PlateauState(
            lrs=svec_o[0, _LR0 : _LR0 + nlr],
            best=svec_o[0, _L_BEST],
            num_bad=svec_o[0, _L_NUMBAD].astype(jnp.int32),
        )
        new_state = train.TrainState(
            params={k: new_params[k] for k in state.params},
            opt=optim.AdamaxState(
                count=svec_o[0, _L_COUNT].astype(jnp.int32),
                mu={k: new_mu[k] for k in state.params},
                nu={k: new_nu[k] for k in state.params},
            ),
            sched=new_sched,
            epoch=svec_o[0, _L_EPOCH].astype(jnp.int32),
        )
        metrics = {
            "rec": met[:num_steps, 0],
            "ortho": met[:num_steps, 1],
            "l1": met[:num_steps, 2],
            "total": met[:num_steps, 3],
            # max |omega*latent| per step: the _fast_sincos domain telemetry
            # consumed by train.fit's SINCOS_DOMAIN fallback guard
            "max_arg": met[:num_steps, 4],
        }
        return new_state, metrics

    return chunk


# ---------------------------------------------------------------------------
# Seed-packed mega-kernel (ensemble.py): S independently-initialized DESMO
# (or DESMOFourier — per-seed series coefficients AND periods stack as extra
# rows of the (kp, 128) coefficient/period blocks, [s*K, (s+1)*K) = seed s,
# so the row-parallel series recurrence needs no change) models in ONE
# kernel. Inside the kernel nearly every cost center is
# lane-width-fixed — the trig transcendentals, the factor gathers, the hi/lo
# contractions and the optimizer all operate on full (., 128) vregs whether
# the lanes carry 1 seed's K terms + padding or S seeds' S*K terms — so S
# models train for close to the cost of one (measured in docs/RESULTS.md).
# Per-seed independence: gb/ga are block-diag masked (SEL(5)), per-seed
# metrics reduce through SEEDSEL/AUGSEL selection matmuls, each seed drives
# its own plateau-scheduler svec row, and group LRs splat per seed block.
# ---------------------------------------------------------------------------


def _pack_b_seeds(z, z_trig, T, K, m_pad):
    """Stacked z (S, T, m) + z_trig (S, 3, r, m) -> B rows (128, m_pad) with
    seed s's [T poly; 3r trig] rows at [s*K, (s+1)*K)."""
    S, _, m = z.shape
    out = jnp.zeros((LANES, m_pad), jnp.float32)
    for s in range(S):
        out = out.at[s * K : s * K + T, :m].set(z[s].astype(jnp.float32))
        zt = z_trig[s].reshape(-1, m)
        out = out.at[s * K + T : (s + 1) * K, :m].set(zt.astype(jnp.float32))
    return out


def _unpack_b_seeds(bfw, S, T, K, r, m):
    z = jnp.stack([bfw[s * K : s * K + T, :m] for s in range(S)])
    zt = jnp.stack(
        [bfw[s * K + T : (s + 1) * K, :m].reshape(3, r, m) for s in range(S)]
    )
    return z, zt


def _pack_wide_row_seeds(c, c_trig, T, K, r):
    """Stacked c (S, T) + c_trig (S, 3, r) -> one (128,) WIDE row."""
    S = c.shape[0]
    row = jnp.zeros((LANES,), jnp.float32)
    for s in range(S):
        row = row.at[s * K : s * K + T].set(c[s].astype(jnp.float32))
        row = row.at[s * K + T : (s + 1) * K].set(
            c_trig[s].reshape(-1).astype(jnp.float32)
        )
    return row


def _unpack_wide_row_seeds(row, S, T, K, r):
    c = jnp.stack([row[s * K : s * K + T] for s in range(S)])
    ct = jnp.stack(
        [row[s * K + T : (s + 1) * K].reshape(3, r) for s in range(S)]
    )
    return c, ct


def _pack_series_seeds(z, z_trig, T, K, kp):
    """Stacked series coefficients z (S, T, ncoef) + z_trig (S, 3, r, ncoef)
    -> (kp, 128), seed s's channel rows at [s*K, (s+1)*K)."""
    S, _, ncoef = z.shape
    out = jnp.zeros((kp, LANES), jnp.float32)
    for s in range(S):
        out = out.at[s * K : s * K + T, :ncoef].set(z[s].astype(jnp.float32))
        out = out.at[s * K + T : (s + 1) * K, :ncoef].set(
            z_trig[s].reshape(-1, ncoef).astype(jnp.float32)
        )
    return out


def _unpack_series_seeds(fw, S, T, K, r, ncoef):
    z = jnp.stack([fw[s * K : s * K + T, :ncoef] for s in range(S)])
    zt = jnp.stack(
        [
            fw[s * K + T : (s + 1) * K, :ncoef].reshape(3, r, ncoef)
            for s in range(S)
        ]
    )
    return z, zt


def _pack_periods_seeds(period, trig_period, mu_p, mu_tp, nu_p, nu_tp, T, K, kp):
    """Stacked periods (S, T) / (S, 3, r) + moments -> (kp, 128): lane 0 =
    period (1.0 on padding rows so 1/period stays finite), 1 = mu, 2 = nu;
    seed s's rows at [s*K, (s+1)*K)."""
    S = period.shape[0]
    out = jnp.zeros((kp, LANES), jnp.float32)
    out = out.at[:, 0].set(1.0)
    for s in range(S):
        for lane, (a, b) in enumerate(
            ((period, trig_period), (mu_p, mu_tp), (nu_p, nu_tp))
        ):
            col = jnp.concatenate(
                [
                    a[s].astype(jnp.float32).reshape(-1),
                    b[s].astype(jnp.float32).reshape(-1),
                ]
            )
            out = out.at[s * K : (s + 1) * K, lane].set(col)
    return out


def _unpack_periods_seeds(fw, S, T, K, r):
    def split(lane):
        v = fw[:, lane]
        p = jnp.stack([v[s * K : s * K + T] for s in range(S)])
        tp = jnp.stack(
            [v[s * K + T : (s + 1) * K].reshape(3, r) for s in range(S)]
        )
        return p, tp

    return split(0), split(1), split(2)


def make_fused_ensemble_chunk(
    spec, cfg, n_seeds: int, bt: int = _BT_DEFAULT,
    interpret: bool | None = None, streamed: bool | None = None,
    betas=None, lams=None,
):
    """Seed-packed ``chunk(state, batch, num_steps) -> (state, metrics)``.

    Drop-in replacement for ``ensemble.make_ensemble_chunk``: ``state`` is the
    stacked-TrainState of ``ensemble.init_state`` (leading seed axis on every
    param/moment, per-seed (S, G) scheduler rows); metrics carry per-seed
    ``rec/ortho/l1/total_s`` (num_steps, S) + summed ``total`` and the global
    ``max_arg`` telemetry. Semantics per seed match the single-seed
    mega-kernel step-for-step (same Adamax/plateau quirks), asserted against
    the packed scan chunk in ``tests/test_ensemble_kernel.py``.

    ``betas``/``lams`` (optional, length S) give each packed seed its OWN loss
    weights — the hyperparameter multi-start of ``ensemble.resolve_hypers``.
    The kernel reads them from the per-seed svec rows (``_L_BETA``/``_L_LAM``),
    so a uniform sweep (or None) is bit-identical to the scalar-``cfg`` kernel.
    """
    from desmo_tpu import optim, train

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if streamed is None:
        streamed = not interpret and not packed_resident_fits(
            spec, cfg, bt, n_seeds
        )
    transport = "resident" if not streamed else ("emul" if interpret else "aliased")
    r, P = spec.r, spec.poly_order
    T = spec.num_poly_terms
    K = T + 3 * r
    n, m = spec.n, spec.m
    S = int(n_seeds)
    if not supports_packed(spec, cfg, S):
        raise ValueError(f"{S} seeds x K={K} do not pack into {LANES} lanes")
    beta = float(cfg.beta)
    lam = float(cfg.l1_lambda)
    betas_arr = np.full((S,), beta, np.float32) if betas is None else np.asarray(betas, np.float32)
    lams_arr = np.full((S,), lam, np.float32) if lams is None else np.asarray(lams, np.float32)
    if betas_arr.shape != (S,) or lams_arr.shape != (S,):
        raise ValueError(
            f"betas/lams must have shape ({S},), got {betas_arr.shape}/{lams_arr.shape}"
        )
    if S == 1:
        # the SEEDS==1 kernel branches use the compile-time scalars, not the
        # svec lanes — a remainder group of a sweep (e.g. 3 seeds at cap 2)
        # must still train under ITS combo, so the scalars take the per-seed
        # values (f32 round trip: identical arithmetic to the lane read)
        beta = float(betas_arr[0])
        lam = float(lams_arr[0])
    augw = aug_width(r, S)
    fourier = getattr(cfg, "variant", "desmo") == "fourier"
    nf = int(getattr(spec, "n_fourier", 0)) if fourier else 0
    ncoef = 2 * nf + 1
    kp = _round_up(S * K, 8)

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def chunk(state, batch, num_steps: int):
        if num_steps < 1:
            raise ValueError(f"mega-kernel chunk needs num_steps >= 1, got {num_steps}")
        x_hi, x_lo = batch["x_hi"], batch["x_lo"]
        n_pad, m_pad = x_hi.shape
        if n_pad % bt:
            raise ValueError(f"x padding {n_pad} not a multiple of bt={bt}")
        call, consts = _build_call(
            r, P, n, m, n_pad, m_pad, int(num_steps), bt, beta, lam, cfg,
            interpret, transport, nf, n_seeds=S,
        )
        rowmask = (jnp.arange(n_pad) < n).astype(jnp.float32)
        pod_rep = jnp.tile(batch["pod_modes"].T, (S, 1))  # (S*r, n), shared
        pod_fw = _pack_aug(
            pod_rep, n_pad, lane0=rowmask, width=augw if streamed else LANES,
        )
        params, opt, sched = state.params, state.opt, state.sched

        def aug_seeds(v):  # (S, r, n) -> (S*r, n)
            return v.reshape(S * r, n)

        init0 = jnp.concatenate(
            [
                _pack_aug(
                    aug_seeds(params["phi"]), n_pad,
                    lane0=jnp.ones((n_pad,), jnp.float32), width=augw,
                ),
                _pack_aug(aug_seeds(opt.mu["phi"]), n_pad, width=augw),
                _pack_aug(aug_seeds(opt.nu["phi"]), n_pad, width=augw),
            ],
            axis=1,
        )
        if fourier:
            from desmo_tpu.models import fourier as fourier_model

            zc0 = _pack_series_seeds(params["z"], params["z_trig"], T, K, kp)
            zcmu0 = _pack_series_seeds(opt.mu["z"], opt.mu["z_trig"], T, K, kp)
            zcnu0 = _pack_series_seeds(opt.nu["z"], opt.nu["z_trig"], T, K, kp)
            per0 = _pack_periods_seeds(
                params["period"], params["trig_period"],
                opt.mu["period"], opt.mu["trig_period"],
                opt.nu["period"], opt.nu["trig_period"], T, K, kp,
            )
            tp = jnp.asarray(fourier_model.t_points(m))
            trow = jnp.zeros((8, m_pad), jnp.float32)
            trow = trow.at[0, :m].set(tp)
            trow = trow.at[1, :m].set(1.0)
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
                jnp.zeros((LANES,), jnp.float32),
                jnp.zeros((LANES,), jnp.float32),
            ]
        )
        count_f = opt.count.astype(jnp.float32)
        svec0 = jnp.zeros((8, LANES), jnp.float32)
        nlr = sched.lrs.shape[-1]
        svec0 = svec0.at[:S, _LR0 : _LR0 + nlr].set(sched.lrs)
        svec0 = svec0.at[:S, _L_BEST].set(sched.best)
        svec0 = svec0.at[:S, _L_POW].set(_B1**count_f)
        svec0 = svec0.at[:S, _L_COUNT].set(count_f)
        svec0 = svec0.at[:S, _L_NUMBAD].set(sched.num_bad.astype(jnp.float32))
        svec0 = svec0.at[:S, _L_EPOCH].set(state.epoch.astype(jnp.float32))
        svec0 = svec0.at[:S, _L_BETA].set(jnp.asarray(betas_arr))
        svec0 = svec0.at[:S, _L_LAM].set(jnp.asarray(lams_arr))
        mrow = jnp.asarray(consts.mrow).at[5, 0].set(batch["x_sq"])

        args = [
            jnp.asarray(consts.sel), jnp.asarray(consts.gidx), mrow,
            pod_fw, x_hi, x_lo, init0,
        ]
        if fourier:
            args += [zc0, zcmu0, zcnu0, per0, trow]
        else:
            args += [b0, bmu0, bnu0]
        args += [crow0, svec0]
        if streamed:
            if transport == "aliased":
                args += [
                    jnp.zeros((2, n_pad, 3 * augw), jnp.float32),
                    jnp.zeros((2, n_pad, augw), jnp.float32),
                ]
            (met, *small, stio, _dl) = call(*args)
            parity = int(num_steps) % 2
            st = stio[parity]
            phio = st[:, 0 * augw : 1 * augw]
            muo = st[:, 1 * augw : 2 * augw]
            nuo = st[:, 2 * augw : 3 * augw]
        else:
            (met, phio, muo, nuo, *small) = call(*args)

        def unaug(fw):  # lanes 1..S*r -> (S, r, n)
            return _unpack_aug(fw, S * r, n).reshape(S, r, n)

        if fourier:
            zcfw, zcmufw, zcnufw, perfw, crow_o, svec_o = small
            z, z_trig = _unpack_series_seeds(zcfw, S, T, K, r, ncoef)
            mz, mzt = _unpack_series_seeds(zcmufw, S, T, K, r, ncoef)
            nz, nzt = _unpack_series_seeds(zcnufw, S, T, K, r, ncoef)
            (per, tper), (mper, mtper), (nper, ntper) = _unpack_periods_seeds(
                perfw, S, T, K, r
            )
        else:
            bfw, bmufw, bnufw, crow_o, svec_o = small
            z, z_trig = _unpack_b_seeds(bfw, S, T, K, r, m)
            mz, mzt = _unpack_b_seeds(bmufw, S, T, K, r, m)
            nz, nzt = _unpack_b_seeds(bnufw, S, T, K, r, m)
        c, c_trig = _unpack_wide_row_seeds(crow_o[0], S, T, K, r)
        mc, mct = _unpack_wide_row_seeds(crow_o[1], S, T, K, r)
        nc, nct = _unpack_wide_row_seeds(crow_o[2], S, T, K, r)
        _, omega = _unpack_wide_row_seeds(crow_o[3], S, T, K, r)
        _, momega = _unpack_wide_row_seeds(crow_o[4], S, T, K, r)
        _, nomega = _unpack_wide_row_seeds(crow_o[5], S, T, K, r)

        new_params = {
            "phi": unaug(phio), "c": c, "z": z, "z_trig": z_trig,
            "c_trig": c_trig, "omega": omega,
        }
        new_mu = {
            "phi": unaug(muo), "c": mc, "z": mz, "z_trig": mzt,
            "c_trig": mct, "omega": momega,
        }
        new_nu = {
            "phi": unaug(nuo), "c": nc, "z": nz, "z_trig": nzt,
            "c_trig": nct, "omega": nomega,
        }
        if fourier:
            new_params.update(period=per, trig_period=tper)
            new_mu.update(period=mper, trig_period=mtper)
            new_nu.update(period=nper, trig_period=ntper)
        new_state = train.TrainState(
            params={k: new_params[k] for k in state.params},
            opt=optim.AdamaxState(
                count=svec_o[0, _L_COUNT].astype(jnp.int32),
                mu={k: new_mu[k] for k in state.params},
                nu={k: new_nu[k] for k in state.params},
            ),
            sched=optim.PlateauState(
                lrs=svec_o[:S, _LR0 : _LR0 + nlr],
                best=svec_o[:S, _L_BEST],
                num_bad=svec_o[:S, _L_NUMBAD].astype(jnp.int32),
            ),
            epoch=svec_o[0, _L_EPOCH].astype(jnp.int32),
        )
        lanes = np.arange(S) * 8
        mets = met[:num_steps]
        metrics = {
            "rec": mets[:, lanes + 0],
            "ortho": mets[:, lanes + 1],
            "l1": mets[:, lanes + 2],
            "total_s": mets[:, lanes + 3],
            "total": jnp.sum(mets[:, lanes + 3], axis=1),
            # global max |omega*latent| per step (any seed): the
            # _fast_sincos domain telemetry (SINCOS_DOMAIN)
            "max_arg": mets[:, 4],
        }
        return new_state, metrics

    return chunk
