"""Independent NumPy oracles for the DESMO math, written from the behavioral
spec in SURVEY.md (term ordering, forward contraction, losses). These are the
ground truth the JAX implementations are validated against; they deliberately
share no code with desmo_tpu's vectorized implementations.
"""

from __future__ import annotations

import math

import numpy as np


def pool_data_oracle(y: np.ndarray, n_vars: int, poly_order: int) -> np.ndarray:
    """Polynomial library with explicit nested loops, degree by degree.

    Column ordering contract: constant; then degree-1 terms y_i; then degree-d
    products y_i*y_j*... with i <= j <= ... (lexicographic non-decreasing).
    """
    n = y.shape[0]
    cols = [np.ones(n)]
    idx_sets: list[tuple[int, ...]] = [()]

    def grow(prefix: tuple[int, ...], degree: int):
        if degree == 0:
            idx_sets.append(prefix)
            cols.append(np.prod([y[:, v] for v in prefix], axis=0))
            return
        start = prefix[-1] if prefix else 0
        for v in range(start, n_vars):
            grow(prefix + (v,), degree - 1)

    for d in range(1, poly_order + 1):
        grow((), d)
    return np.stack(cols, axis=1)


def num_terms_oracle(n_vars: int, poly_order: int) -> int:
    return sum(
        math.factorial(n_vars + k - 1) // (math.factorial(k) * math.factorial(n_vars - 1))
        for k in range(poly_order + 1)
    )


def desmo_forward_oracle(
    phi_masks: np.ndarray,  # (r, n)
    c: np.ndarray,  # (T,)
    z: np.ndarray,  # (T, m)
    z_trig: np.ndarray,  # (3, r, m) sin/cos/tanh
    c_trig: np.ndarray,  # (3, r)
    omega: np.ndarray,  # (3, r)
    pod_modes: np.ndarray,  # (n, r)
    poly_order: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference forward semantics in plain NumPy. Returns (recon (n,m), latent)."""
    r, n = phi_masks.shape
    latent = pod_modes * phi_masks.T  # (n, r)
    theta = pool_data_oracle(latent, r, poly_order)  # (n, T)
    recon = (c[None, :] * theta) @ z  # (n, m)
    funcs = [np.sin, np.cos, np.tanh]
    for i in range(r):
        for k in range(3):
            spatial = funcs[k](omega[k, i] * latent[:, i])  # (n,)
            recon += c_trig[k, i] * np.outer(spatial, z_trig[k, i])
    return recon, latent


def total_loss_oracle(recon, x, latent, c, c_trig, beta, l1_lambda):
    rec = np.mean((recon - x) ** 2)
    r = latent.shape[1]
    ortho = 0.0
    for i in range(r):
        for j in range(i + 1, r):
            ortho += abs(float(latent[:, i] @ latent[:, j]))
    l1 = np.abs(c).sum() + np.abs(c_trig).sum()
    return rec + beta * ortho + l1_lambda * l1, rec, ortho, l1
