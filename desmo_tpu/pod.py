"""POD / SVD initialization, on device.

The reference runs a *full* LAPACK SVD on the host for every case
(``DESMO/cylinder_flow/DESMO-Cylinder.py:197-299``, ``POD_analysis``) — O(n*m^2)
on CPU, the slowest pre-training stage for the 27000x1000 aneurysm case
(SURVEY §3.1). TPU-native redesign: for tall matrices (n >> m) use the method
of snapshots — eigendecompose the m x m Gram matrix ``X^T X = V S^2 V^T`` and
recover ``U = X V / S`` — which is two MXU GEMMs plus a small symmetric
eigensolve, instead of a host round-trip. Results match the reference SVD up
to per-mode sign, which is absorbed by the learnable phi masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PODResult:
    """Rank-r POD of the snapshot matrix X (n, m)."""

    modes: jnp.ndarray  # U[:, :r]  (n, r)
    temporal: jnp.ndarray  # S_r * Vt[:r]  scaled temporal coefficients? see note
    singular_values: jnp.ndarray  # S[:r]
    energy: jnp.ndarray  # full normalized energy spectrum S^2 / sum(S^2)
    reconstruction: jnp.ndarray  # rank-r approximation U_r S_r Vt_r  (n, m)


def _method_of_snapshots(x: jnp.ndarray, precision) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    gram = jnp.dot(x.T, x, precision=precision)  # (m, m)
    evals, v = jnp.linalg.eigh(gram)  # ascending
    evals = evals[::-1]
    v = v[:, ::-1]
    s = jnp.sqrt(jnp.clip(evals, 0.0))
    # guard tiny/zero singular values when inverting
    safe = jnp.where(s > 0, s, 1.0)
    u = jnp.dot(x, v / safe[None, :], precision=precision)
    return u, s, v.T


def pod(
    x,
    r: int,
    method: str = "auto",
    precision=jax.lax.Precision.HIGHEST,
) -> PODResult:
    """Rank-r POD of X (n, m).

    ``temporal`` follows the reference convention ``Vt[:r, :]`` (unscaled right
    singular vectors, ``CYL:205``); ``reconstruction`` is ``U_r S_r Vt_r``
    (``CYL:208``).

    method: 'auto' (snapshots when n > m), 'snapshots', or 'svd' (full
    ``jnp.linalg.svd``, bit-matching the reference up to sign).
    """
    x = jnp.asarray(x, jnp.float32)
    n, m = x.shape
    if method == "auto":
        method = "snapshots" if n > m else "svd"
    if method == "snapshots":
        u, s, vt = _method_of_snapshots(x, precision)
    elif method == "svd":
        u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    else:
        raise ValueError(f"unknown POD method {method!r}")
    energy = (s * s) / jnp.sum(s * s)
    u_r, s_r, vt_r = u[:, :r], s[:r], vt[:r, :]
    recon = jnp.dot(u_r * s_r[None, :], vt_r, precision=precision)
    return PODResult(
        modes=u_r,
        temporal=vt_r,
        singular_values=s_r,
        energy=energy,
        reconstruction=recon,
    )


def truncate(x, result: PODResult, r: int, precision=jax.lax.Precision.HIGHEST) -> PODResult:
    """Rank-r views of an existing rank-R factorization (r <= R): the modes and
    singular values are exact prefixes; only the rank-r reconstruction needs
    one cheap GEMM (avoids re-running the decomposition)."""
    if r > result.modes.shape[1]:
        raise ValueError(f"cannot truncate rank-{result.modes.shape[1]} POD to r={r}")
    u_r = result.modes[:, :r]
    s_r = result.singular_values[:r]
    vt_r = result.temporal[:r, :]
    recon = jnp.dot(u_r * s_r[None, :], vt_r, precision=precision)
    return PODResult(
        modes=u_r,
        temporal=vt_r,
        singular_values=s_r,
        energy=result.energy,
        reconstruction=recon,
    )


def pod_relative_error(x, result: PODResult) -> float:
    """Relative Frobenius error of the rank-r POD reconstruction (``CYL:210``)."""
    x = jnp.asarray(x, jnp.float32)
    return float(jnp.linalg.norm(x - result.reconstruction) / jnp.linalg.norm(x))


def rank_sweep(x, max_r: int, method: str = "auto") -> list[tuple[int, float]]:
    """Relative reconstruction error for every rank 1..max_r from ONE
    factorization — the AE script's inline mode-count sweep
    (``DESMO_AE/...py:283-407``, swept to 20 modes)."""
    full = pod(jnp.asarray(x, jnp.float32), max_r, method=method)
    out = []
    for r in range(1, max_r + 1):
        out.append((r, pod_relative_error(x, truncate(x, full, r))))
    return out


def pod_numpy(x: np.ndarray, r: int):
    """Host-side full-SVD oracle, exactly the reference's path (``CYL:199-208``).

    Returns (X_approx, modes, temporal, S_r) like ``POD_analysis``."""
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    x_approx = u[:, :r] @ np.diag(s[:r]) @ vt[:r, :]
    return x_approx, u[:, :r], vt[:r, :], s[:r]


def pod_host(x, r: int) -> PODResult:
    """Rank-r POD with the REFERENCE's exact mode signs: ``np.linalg.svd`` on
    host (``CYL:199-205``), packaged as a :class:`PODResult`.

    Use this whenever POD modes must pair with *frozen* trained masks — e.g.
    importing a reference ``.pt`` checkpoint for inference. The device paths
    (`pod` with method-of-snapshots or ``jnp.linalg.svd``) may flip individual
    mode signs relative to LAPACK-on-host; during *training* a flip is absorbed
    by the learnable phi masks, but at inference with imported phi it silently
    corrupts the reconstruction."""
    x = np.asarray(x, np.float32)
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    energy = (s * s) / np.sum(s * s)
    u_r, s_r, vt_r = u[:, :r], s[:r], vt[:r, :]
    recon = (u_r * s_r[None, :]) @ vt_r
    return PODResult(
        modes=jnp.asarray(u_r),
        temporal=jnp.asarray(vt_r),
        singular_values=jnp.asarray(s_r),
        energy=jnp.asarray(energy),
        reconstruction=jnp.asarray(recon),
    )


def sign_align(result: PODResult, reference_modes) -> PODResult:
    """Flip modes (and their temporal rows) whose sign convention disagrees
    with ``reference_modes`` (n, r'); detection = sign of the mode/reference
    inner product. Returns an aligned :class:`PODResult` (reconstruction is
    sign-invariant and reused)."""
    ref = jnp.asarray(reference_modes, jnp.float32)
    r = result.modes.shape[1]
    dots = jnp.sum(result.modes * ref[:, :r], axis=0)  # (r,)
    flip = jnp.where(dots < 0, -1.0, 1.0)
    return PODResult(
        modes=result.modes * flip[None, :],
        temporal=result.temporal * flip[:, None],
        singular_values=result.singular_values,
        energy=result.energy,
        reconstruction=result.reconstruction,
    )
