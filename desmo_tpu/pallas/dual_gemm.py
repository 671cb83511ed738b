"""Fused dual contraction kernel: one pass over X computes A^T X and X B^T.

Why this exists: with the factored MSE (`desmo_tpu.losses.factored_mse`) the
training step's only large array is the constant snapshot matrix X (n, m) —
everything else is (n, K) / (K, m) with K = T + 3r ~ 50. XLA evaluates
``ax = A^T X`` in the forward pass and ``xb = X B^T`` in the backward pass as
two separate GEMMs, i.e. two full reads of X per step. But the factored loss'
gradients are exactly

    dL/dA = (2/nm) (A (B B^T) - X B^T)      dL/dB = (2/nm) ((A^T A) B - A^T X)

so both X-dependent products are known *at forward time*. This module:

* ``dual_contractions(a, b, x)`` — a Pallas kernel tiled over n that streams
  each X block through VMEM once, emitting both partial products (two MXU
  ``dot_general``s per block; ``ax`` accumulates in a revisited output block,
  ``xb`` streams out row-tiles);
* ``factored_mse_fused`` — a ``custom_vjp`` around the whole factored MSE
  whose backward touches only (n, K)/(K, K)-sized residuals: X is read exactly
  ONCE per optimizer step.

Inputs are zero-padded to tile multiples; padded rows of A are zeroed by
construction (the caller masks the dictionary's constant column), so padding
contributes nothing to any product. Falls back to interpreter mode off-TPU so
the same code path is unit-tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN = 512  # X row-tile; VMEM per step ~ BN * m_pad * 4B


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _split_bf16(v):
    """f32 -> (hi, lo) bf16 pair with v ~= hi + lo (error ~2^-16 relative)."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a32, b32, dims):
    """3-pass bf16 matmul ~ fp32 accuracy (XLA's Precision.HIGH, which Mosaic
    does not support in-kernel): split both operands into bf16 hi/lo and sum
    hi*hi + hi*lo + lo*hi with fp32 accumulation, dropping the ~2^-32 lo*lo
    term. Without this, Mosaic lowers f32 dots to a single-pass bf16 MXU op
    (~2e-3 relative error) or, with HIGHEST, to 6 passes (~1.7x step cost);
    the reference trains in full fp32 and the factored loss' cancellation is
    precision-sensitive near convergence."""
    a_hi, a_lo = _split_bf16(a32)
    b_hi, b_lo = _split_bf16(b32)

    def d(u, v):
        return jax.lax.dot_general(
            u, v, dimension_numbers=dims, preferred_element_type=jnp.float32
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dual_kernel(a_ref, b_ref, x_ref, ax_ref, xb_ref):
    i = pl.program_id(0)
    x_blk = x_ref[:]  # (BN, m_pad)
    partial_ax = _dot3(a_ref[:], x_blk, (((0,), (0,)), ((), ())))  # (K_pad, m_pad)

    @pl.when(i == 0)
    def _():
        ax_ref[:] = partial_ax

    @pl.when(i > 0)
    def _():
        ax_ref[:] = ax_ref[:] + partial_ax

    xb_ref[:] = _dot3(x_blk, b_ref[:], (((1,), (1,)), ((), ())))  # (BN, K_pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_contractions(a: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray, interpret: bool = False):
    """Returns ``(ax, xb) = (a.T @ x, x @ b.T)`` reading x once.

    a: (n, K), b: (K, m), x: (n, m); result shapes (K, m) and (n, K).

    ``x`` may be pre-padded with zero rows/columns to tile multiples
    ((multiple of 512) x (multiple of 128)) — pass it padded when calling in a
    loop, so the pad is not re-materialized every step (zero rows/cols change
    neither product). a and b are padded here (small copies).
    """
    n, k = a.shape
    m = b.shape[1]
    n_pad = max(_round_up(n, _BN), _round_up(x.shape[0], _BN))
    m_pad = max(_round_up(m, 128), _round_up(x.shape[1], 128))
    k_pad = _round_up(k, 128)
    a_p = jnp.pad(a, ((0, n_pad - n), (0, k_pad - k)))
    b_p = jnp.pad(b, ((0, k_pad - k), (0, m_pad - m)))
    x_p = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, m_pad - x.shape[1])))

    grid = (n_pad // _BN,)
    ax, xb = pl.pallas_call(
        _dual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * m_pad * k_pad,
            bytes_accessed=(n_pad * m_pad + n_pad * k_pad + k_pad * m_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p, x_p)
    return ax[:k, :m], xb[:n, :k]


def _mse_value(a, b, ax, x_sq, nm, precision=jax.lax.Precision.HIGHEST):
    ga = jnp.dot(a.T, a, precision=precision)
    gb = jnp.dot(b, b.T, precision=precision)
    sq = jnp.sum(ga * gb) - 2.0 * jnp.sum(ax * b) + x_sq
    return sq / nm, ga, gb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def factored_mse_fused(a, b, x, x_sq, interpret: bool = False):
    """``mean((a @ b - x)^2)`` with a single fused read of x per step and an
    x-free backward. Value matches ``losses.factored_mse`` (tested)."""
    ax, _ = dual_contractions(a, b, x, interpret=interpret)
    # true sizes from a/b — x may be zero-padded (see dual_contractions)
    val, _, _ = _mse_value(a, b, ax, x_sq, a.shape[0] * b.shape[1])
    return val


def _fwd(a, b, x, x_sq, interpret):
    ax, xb = dual_contractions(a, b, x, interpret=interpret)
    nm = a.shape[0] * b.shape[1]
    val, ga, gb = _mse_value(a, b, ax, x_sq, nm)
    return val, (a, b, ax, xb, ga, gb, nm, x.shape)


def _bwd(interpret, res, g):
    a, b, ax, xb, ga, gb, nm, x_shape = res
    scale = 2.0 * g / nm
    da = scale * (
        jnp.dot(a, gb, precision=jax.lax.Precision.HIGHEST) - xb
    )
    db = scale * (
        jnp.dot(ga, b, precision=jax.lax.Precision.HIGHEST) - ax
    )
    # X is a training constant; its cotangent is unused and DCE'd by XLA.
    dx = jnp.zeros(x_shape, a.dtype)
    dx_sq = g / nm
    return da, db, dx, dx_sq


factored_mse_fused.defvjp(_fwd, _bwd)


def pad_snapshots(x, bn: int = _BN, bm: int = 128):
    """Zero-pad X once, outside the training loop, to the kernel's tile
    multiples. The fused loss accepts padded X directly."""
    n, m = x.shape
    return jnp.pad(jnp.asarray(x), ((0, _round_up(n, bn) - n), (0, _round_up(m, bm) - m)))


def split_snapshots(x):
    """Pad + hi/lo-split X ONCE outside the loop: returns two bf16 planes with
    x ~= hi + lo. The split-input kernel then skips the per-step f32->bf16
    casts of the X block (X is the only large per-step operand). Padding is
    fixed to the kernel's tile multiples."""
    xp = pad_snapshots(x, _BN, 128)
    hi = xp.astype(jnp.bfloat16)
    lo = (xp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dual_kernel_split(a_ref, b_ref, xhi_ref, xlo_ref, ax_ref, xb_ref):
    i = pl.program_id(0)
    a_hi, a_lo = _split_bf16(a_ref[:])
    b_hi, b_lo = _split_bf16(b_ref[:])
    x_hi = xhi_ref[:]
    x_lo = xlo_ref[:]

    def d(u, v, dims):
        return jax.lax.dot_general(
            u, v, dimension_numbers=dims, preferred_element_type=jnp.float32
        )

    ax_dims = (((0,), (0,)), ((), ()))
    partial_ax = d(a_hi, x_hi, ax_dims) + d(a_hi, x_lo, ax_dims) + d(a_lo, x_hi, ax_dims)

    @pl.when(i == 0)
    def _():
        ax_ref[:] = partial_ax

    @pl.when(i > 0)
    def _():
        ax_ref[:] = ax_ref[:] + partial_ax

    xb_dims = (((1,), (1,)), ((), ()))
    xb_ref[:] = d(x_hi, b_hi, xb_dims) + d(x_hi, b_lo, xb_dims) + d(x_lo, b_hi, xb_dims)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_contractions_split(a, b, x_hi, x_lo, interpret: bool = False):
    """Like ``dual_contractions`` but over a pre-split bf16 X (see
    ``split_snapshots``); identical 3-pass accuracy."""
    n, k = a.shape
    m = b.shape[1]
    n_pad, m_pad = x_hi.shape
    if n_pad % _BN or m_pad % 128 or n_pad < n or m_pad < m:
        raise ValueError(
            f"x_hi/x_lo must be padded to ({_BN}, 128) multiples covering "
            f"(n={n}, m={m}); got {x_hi.shape} — use split_snapshots()"
        )
    k_pad = _round_up(k, 128)
    a_p = jnp.pad(a, ((0, n_pad - n), (0, k_pad - k)))
    b_p = jnp.pad(b, ((0, k_pad - k), (0, m_pad - m)))

    grid = (n_pad // _BN,)
    ax, xb = pl.pallas_call(
        _dual_kernel_split,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad * m_pad * k_pad,
            bytes_accessed=(2 * n_pad * m_pad + n_pad * k_pad + k_pad * m_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p, x_hi, x_lo)
    return ax[:k, :m], xb[:n, :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def factored_mse_fused_split(a, b, x_hi, x_lo, x_sq, interpret: bool = False):
    """``factored_mse_fused`` over pre-split bf16 X planes."""
    ax, _ = dual_contractions_split(a, b, x_hi, x_lo, interpret=interpret)
    val, _, _ = _mse_value(a, b, ax, x_sq, a.shape[0] * b.shape[1])
    return val


def _fwd_split(a, b, x_hi, x_lo, x_sq, interpret):
    ax, xb = dual_contractions_split(a, b, x_hi, x_lo, interpret=interpret)
    nm = a.shape[0] * b.shape[1]
    val, ga, gb = _mse_value(a, b, ax, x_sq, nm)
    return val, (a, b, ax, xb, ga, gb, nm, x_hi.shape)


def _bwd_split(interpret, res, g):
    a, b, ax, xb, ga, gb, nm, x_shape = res
    scale = 2.0 * g / nm
    da = scale * (jnp.dot(a, gb, precision=jax.lax.Precision.HIGHEST) - xb)
    db = scale * (jnp.dot(ga, b, precision=jax.lax.Precision.HIGHEST) - ax)
    dx = jnp.zeros(x_shape, jnp.bfloat16)  # unused; DCE'd
    return da, db, dx, dx, g / nm


factored_mse_fused_split.defvjp(_fwd_split, _bwd_split)


# ---------------------------------------------------------------------------
# Per-seed (block) variants for lane-packed multi-seed training (ensemble.py):
# A (n, S*K) / B (S*K, m) hold S independent models side by side in the lane
# axis; the return is the PER-SEED mse vector (S,). Only the block-diagonal
# of the packed Grams enters each seed's value, and the backward scales each
# seed's block by its own cotangent — gradients are exactly the stacked
# single-seed gradients (tested vs. factored_mse per seed).
# ---------------------------------------------------------------------------


def _mse_blocks_value(a, b, ax, x_sq, nm, n_blocks, precision=jax.lax.Precision.HIGHEST):
    """Per-block MSE values from packed Grams — the ONE home of the
    block-diagonal extraction + cross-term assembly (the XLA path
    ``ensemble.factored_mse_blocks`` delegates here too)."""
    S = n_blocks
    K = a.shape[1] // S
    m = b.shape[1]
    ga = jnp.dot(a.T, a, precision=precision)
    gb = jnp.dot(b, b.T, precision=precision)
    idx = jnp.arange(S)
    ga_d = ga.reshape(S, K, S, K)[idx, :, idx, :]
    gb_d = gb.reshape(S, K, S, K)[idx, :, idx, :]
    cross = jnp.sum((ax * b).reshape(S, K, m), axis=(1, 2))
    vals = (jnp.sum(ga_d * gb_d, axis=(1, 2)) - 2.0 * cross + x_sq) / nm
    return vals, ga, gb


def _blocks_bwd_core(a, b, ax, xb, ga, gb, nm, g_vec, n_blocks):
    """Shared backward: per-block cotangent g_vec (S,) scales its block."""
    S = n_blocks
    K = a.shape[1] // S
    mask = jnp.kron(jnp.eye(S, dtype=a.dtype), jnp.ones((K, K), a.dtype))
    g_lane = jnp.repeat(g_vec, K)  # (S*K,)
    scale = 2.0 / nm
    gb_bd = gb * mask * g_lane[:, None]
    ga_bd = ga * mask * g_lane[:, None]
    da = scale * (
        jnp.dot(a, gb_bd, precision=jax.lax.Precision.HIGHEST)
        - xb * g_lane[None, :]
    )
    db = scale * (
        jnp.dot(ga_bd, b, precision=jax.lax.Precision.HIGHEST)
        - ax * g_lane[:, None]
    )
    return da, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def factored_mse_fused_blocks(a, b, x, x_sq, n_blocks, interpret: bool = False):
    """Per-seed ``mean((A_s @ B_s - x)^2) -> (S,)`` with one fused read of x
    shared by all S packed seeds and an x-free backward."""
    ax, _ = dual_contractions(a, b, x, interpret=interpret)
    vals, _, _ = _mse_blocks_value(a, b, ax, x_sq, a.shape[0] * b.shape[1], n_blocks)
    return vals


def _fwd_blocks(a, b, x, x_sq, n_blocks, interpret):
    ax, xb = dual_contractions(a, b, x, interpret=interpret)
    nm = a.shape[0] * b.shape[1]
    vals, ga, gb = _mse_blocks_value(a, b, ax, x_sq, nm, n_blocks)
    return vals, (a, b, ax, xb, ga, gb, nm, x.shape)


def _bwd_blocks(n_blocks, interpret, res, g_vec):
    a, b, ax, xb, ga, gb, nm, x_shape = res
    da, db = _blocks_bwd_core(a, b, ax, xb, ga, gb, nm, g_vec, n_blocks)
    dx = jnp.zeros(x_shape, a.dtype)  # X constant; DCE'd
    return da, db, dx, jnp.sum(g_vec) / nm


factored_mse_fused_blocks.defvjp(_fwd_blocks, _bwd_blocks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def factored_mse_fused_split_blocks(
    a, b, x_hi, x_lo, x_sq, n_blocks, interpret: bool = False
):
    """``factored_mse_fused_blocks`` over pre-split bf16 X planes."""
    ax, _ = dual_contractions_split(a, b, x_hi, x_lo, interpret=interpret)
    vals, _, _ = _mse_blocks_value(a, b, ax, x_sq, a.shape[0] * b.shape[1], n_blocks)
    return vals


def _fwd_split_blocks(a, b, x_hi, x_lo, x_sq, n_blocks, interpret):
    ax, xb = dual_contractions_split(a, b, x_hi, x_lo, interpret=interpret)
    nm = a.shape[0] * b.shape[1]
    vals, ga, gb = _mse_blocks_value(a, b, ax, x_sq, nm, n_blocks)
    return vals, (a, b, ax, xb, ga, gb, nm, x_hi.shape)


def _bwd_split_blocks(n_blocks, interpret, res, g_vec):
    a, b, ax, xb, ga, gb, nm, x_shape = res
    da, db = _blocks_bwd_core(a, b, ax, xb, ga, gb, nm, g_vec, n_blocks)
    dx = jnp.zeros(x_shape, jnp.bfloat16)  # unused; DCE'd
    return da, db, dx, dx, jnp.sum(g_vec) / nm


factored_mse_fused_split_blocks.defvjp(_fwd_split_blocks, _bwd_split_blocks)
