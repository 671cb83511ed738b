"""Synthetic unsteady-flow snapshot generators.

The reference's datasets (cylinder wake, ICA aneurysm, JHTDB channel) live on
an external scratch filesystem and are not shipped (``CYL:157``). For tests
and benchmarks we generate fields with the same structure the method targets:
a low-rank space-time-separable oscillatory part (vortex shedding and its
harmonics) plus optional broadband residual. Shapes default to the cylinder
case (n=3961, m=1001) so benchmark numbers are comparable to BASELINE.md.
"""

from __future__ import annotations

import numpy as np


def cylinder_wake(
    n: int = 3961,
    m: int = 1001,
    n_harmonics: int = 3,
    noise: float = 0.0,
    seed: int = 0,
    dtype=np.float32,
    period_steps: float | None = None,
) -> np.ndarray:
    """Traveling-wave wake surrogate: X (n, m), temporal-mean-free.

    Each harmonic k contributes a standing-wave pair
    ``a_k [ sin(k s) g(s) sin(k w t), cos(k s) g(s) cos(k w t) ]`` — the
    classic POD structure of vortex shedding (paired modes per frequency),
    with a Gaussian spatial envelope g and 1/k^2 energy decay.

    ``period_steps``: fundamental shedding period in snapshot indices (e.g. 60
    to match the Fourier presets' ``period_init``); default keeps the historic
    ~100-step period.
    """
    rng = np.random.default_rng(seed)
    s = np.linspace(0.0, 8.0 * np.pi, n)
    envelope = np.exp(-(((s - s.mean()) / (0.35 * np.ptp(s))) ** 2))
    if period_steps is None:
        t = np.linspace(0.0, 20.0 * np.pi, m)
    else:
        t = 2.0 * np.pi * np.arange(m) / float(period_steps)
    x = np.zeros((n, m))
    w = 1.0
    for k in range(1, n_harmonics + 1):
        amp = 1.0 / k**2
        phase = rng.uniform(0, 2 * np.pi)
        sp1 = np.sin(k * s + phase) * envelope
        sp2 = np.cos(k * s + phase) * envelope
        x += amp * np.outer(sp1, np.sin(k * w * t))
        x += amp * np.outer(sp2, np.cos(k * w * t))
    if noise:
        x += noise * rng.standard_normal((n, m))
    x -= x.mean(axis=1, keepdims=True)
    return x.astype(dtype)


def separable_rank_k(
    n: int, m: int, k: int, seed: int = 0, decay: float = 2.0, dtype=np.float32
) -> np.ndarray:
    """Exactly rank-k random smooth field (for POD/convergence unit tests)."""
    rng = np.random.default_rng(seed)
    s = np.linspace(0, 2 * np.pi, n)
    t = np.linspace(0, 2 * np.pi, m)
    x = np.zeros((n, m))
    for i in range(1, k + 1):
        spatial = np.sin(i * s + rng.uniform(0, 2 * np.pi))
        temporal = np.cos(i * t + rng.uniform(0, 2 * np.pi))
        x += (1.0 / i**decay) * np.outer(spatial, temporal)
    return x.astype(dtype)


def voxel_grid_mesh(nx: int, ny: int, nz: int, spacing: float = 1.0):
    """An aneurysm-style voxel mesh: an (nx, ny, nz)-CELL lattice stored as an
    unstructured grid (VTK_VOXEL cells), like the reference's resampled ICA
    geometry whose CellData fields are rendered as (x_range, y_range, z_range)
    slices (``DESMO/aneurysm/DESMO_ICA_norm.py:654-769``). Points are the
    (nx+1)(ny+1)(nz+1) lattice in VTK x-fastest order."""
    from desmo_tpu.io import vtk as vio

    px, py, pz = nx + 1, ny + 1, nz + 1
    zz, yy, xx = np.meshgrid(
        np.arange(pz) * spacing,
        np.arange(py) * spacing,
        np.arange(px) * spacing,
        indexing="ij",
    )
    points = np.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=1)

    def pid(i, j, k):
        return i + px * (j + py * k)

    conn = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                conn.extend(
                    [
                        pid(i, j, k), pid(i + 1, j, k),
                        pid(i, j + 1, k), pid(i + 1, j + 1, k),
                        pid(i, j, k + 1), pid(i + 1, j, k + 1),
                        pid(i, j + 1, k + 1), pid(i + 1, j + 1, k + 1),
                    ]
                )
    ncells = nx * ny * nz
    return vio.Mesh(
        points=points.astype(np.float32),
        point_data={},
        cell_data={},
        cells=np.asarray(conn, np.int64),
        cell_offsets=np.arange(8, 8 * ncells + 1, 8, dtype=np.int64),
        cell_types=np.full(ncells, 11, np.uint8),  # VTK_VOXEL
    )


def voxel_snapshot_series(
    out_dir: str,
    nx: int = 8,
    ny: int = 7,
    nz: int = 6,
    m: int = 12,
    filename: str = "velocity_",
    seed: int = 0,
):
    """Write an aneurysm-style CellData ``.vtu`` series (velocity vectors on a
    voxel grid) for tests; returns (mesh, X (ncells, m) magnitude truth)."""
    import os

    from desmo_tpu.io import vtk as vio

    mesh = voxel_grid_mesh(nx, ny, nz)
    ncells = nx * ny * nz
    x = cylinder_wake(ncells, m, n_harmonics=2, seed=seed)
    x += 2.0 * np.abs(x).max()  # positive, so |velocity| round-trips to x
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 1)
    direction = rng.standard_normal(3).astype(np.float32)
    direction /= np.linalg.norm(direction)
    for t in range(m):
        vel = np.outer(x[:, t], direction).astype(np.float32)  # (ncells, 3)
        vio.write_vtu(
            os.path.join(out_dir, f"{filename}{t}.vtu"),
            mesh,
            cell_data={"velocity": vel},
        )
    return mesh, x
