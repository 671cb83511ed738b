"""Optimizer and LR scheduling with exact PyTorch semantics, in pure JAX.

The reference trains with ``torch.optim.Adamax`` over 4-5 parameter groups
with very different learning rates (1e-3 ... 1e3) plus a
``ReduceLROnPlateau`` scheduler (``DESMO/cylinder_flow/DESMO-Cylinder.py:
592-614``). Convergence trajectories are part of the parity contract
(SURVEY §7 "hard parts"), so both are re-implemented here to match torch
update-for-update (validated against torch in ``tests/test_optim.py``) rather
than approximated with stock optax (whose adamax places eps differently).

Everything is a pure function of explicit state so the whole training loop can
live inside ``lax.scan`` on device — per-group LRs are *state*, not Python
floats, letting the plateau scheduler run inside the compiled loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Pytree = object


class AdamaxState(NamedTuple):
    count: jnp.ndarray  # int32 scalar, number of steps taken
    mu: Pytree  # first-moment EMA, like params
    nu: Pytree  # infinity-norm buffer, like params


def adamax_init(params: Pytree) -> AdamaxState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamaxState(jnp.zeros((), jnp.int32), zeros, jax.tree.map(jnp.zeros_like, params))


def adamax_update(
    grads: Pytree,
    state: AdamaxState,
    lr_tree: Pytree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[Pytree, AdamaxState]:
    """One Adamax step; returns (updates, new_state). Apply with ``p + u``.

    Matches torch's ``_single_tensor_adamax``:
        mu  <- b1*mu + (1-b1)*g
        nu  <- max(b2*nu, |g| + eps)          # eps inside the max, torch-style
        p   <- p - lr/(1 - b1^t) * mu / nu
    ``lr_tree`` is a pytree of per-leaf scalar LRs (so per-group LRs and the
    plateau scheduler compose as data).
    """
    count = state.count + 1
    bias = 1.0 - b1 ** count.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: jnp.maximum(b2 * v, jnp.abs(g) + eps), state.nu, grads)
    updates = jax.tree.map(
        lambda m, v, lr: -(lr / bias) * m / v, mu, nu, lr_tree
    )
    return updates, AdamaxState(count, mu, nu)


class PlateauState(NamedTuple):
    """State of a torch-semantics ReduceLROnPlateau over per-group LRs."""

    lrs: jnp.ndarray  # (num_groups,) current learning rates
    best: jnp.ndarray  # best metric seen
    num_bad: jnp.ndarray  # int32 epochs since improvement


def plateau_init(group_lrs: jnp.ndarray) -> PlateauState:
    return PlateauState(
        jnp.asarray(group_lrs, jnp.float32),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.zeros((), jnp.int32),
    )


def plateau_step(
    state: PlateauState,
    metric: jnp.ndarray,
    patience: int,
    factor: float = 0.1,
    min_lr: float = 1e-6,
    threshold: float = 1e-4,
) -> PlateauState:
    """One scheduler step, mode='min', threshold_mode='rel', cooldown=0.

    Semantics of ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (as configured
    at ``CYL:614``): improvement means ``metric < best * (1 - threshold)``;
    after more than ``patience`` consecutive non-improvements, multiply every
    group LR by ``factor`` (clamped at ``min_lr``) and reset the counter.
    """
    improved = metric < state.best * (1.0 - threshold)
    best = jnp.where(improved, metric, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lrs = jnp.where(reduce, jnp.maximum(state.lrs * factor, min_lr), state.lrs)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lrs, best, num_bad)


def lr_tree_from_groups(
    params: Pytree, group_of: dict[str, str], group_order: tuple[str, ...], lrs: jnp.ndarray
) -> Pytree:
    """Expand the (num_groups,) LR vector into a per-leaf LR pytree.

    ``group_of`` maps top-level param key -> group name; ``group_order`` fixes
    each group's index into ``lrs``.
    """
    index = {g: i for i, g in enumerate(group_order)}
    return {k: lrs[index[group_of[k]]] for k in params}
