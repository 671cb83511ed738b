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


def _dual_kernel(a_ref, b_ref, x_ref, ax_ref, xb_ref):
    i = pl.program_id(0)
    x_blk = x_ref[:]  # (BN, m_pad)
    partial_ax = jax.lax.dot_general(
        a_ref[:],  # (BN, K_pad)
        x_blk,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K_pad, m_pad)

    @pl.when(i == 0)
    def _():
        ax_ref[:] = partial_ax

    @pl.when(i > 0)
    def _():
        ax_ref[:] = ax_ref[:] + partial_ax

    xb_ref[:] = jax.lax.dot_general(
        x_blk,
        b_ref[:],  # (K_pad, m_pad)
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, K_pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_contractions(a: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray, interpret: bool = False):
    """Returns ``(ax, xb) = (a.T @ x, x @ b.T)`` reading x once.

    a: (n, K), b: (K, m), x: (n, m); result shapes (K, m) and (n, K).
    """
    n, k = a.shape
    m = x.shape[1]
    n_pad = _round_up(n, _BN)
    m_pad = _round_up(m, 128)
    k_pad = _round_up(k, 128)
    a_p = jnp.pad(a, ((0, n_pad - n), (0, k_pad - k)))
    b_p = jnp.pad(b, ((0, k_pad - k), (0, m_pad - m)))
    x_p = jnp.pad(x, ((0, n_pad - n), (0, m_pad - m)))

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
    val, _, _ = _mse_value(a, b, ax, x_sq, a.shape[0] * x.shape[1])
    return val


def _fwd(a, b, x, x_sq, interpret):
    ax, xb = dual_contractions(a, b, x, interpret=interpret)
    nm = a.shape[0] * x.shape[1]
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
