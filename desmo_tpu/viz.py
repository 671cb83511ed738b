"""Host-side visualization reports (reference L8, SURVEY §2.8).

The reference renders unstructured meshes with PyVista and voxel grids with
matplotlib ``imshow`` (``DESMO/cylinder_flow/DESMO-Cylinder.py:214-296,
736-763, 820-925, 931-1177``; ``DESMO/aneurysm/DESMO_ICA_norm.py:654-769``),
always writing files under ``./figures/<run>/``. This module reproduces every
report with matplotlib only (PyVista is an optional upgrade via
``use_pyvista=True`` when the package is installed): scatter/tri rendering of
point clouds replaces mesh rendering, which preserves the diagnostic value
(mode structure, true-vs-predicted) without the heavyweight dependency.

All functions save to a path and never call ``plt.show()`` — the reference's
in-loop ``plotter.show()`` stall (``DESMO_AE/...py:874-901``) is deliberately
not replicated.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from desmo_tpu import library  # noqa: E402


# Module-wide output format for every report (the reference saves its mode
# figures as PDFs via `plotter.save_graphic(...pdf)`, CYL:849; PNG stays the
# default for cheap inline inspection). Callers keep passing '.png' paths —
# `_save` swaps the suffix so one switch covers every figure surface.
FIGURE_FORMAT = "png"
_FORMATS = ("png", "pdf", "svg")


def set_figure_format(fmt: str) -> None:
    """Select the on-disk format for all subsequently saved figures
    (CLI: ``--figure-format``)."""
    global FIGURE_FORMAT
    fmt = fmt.lower().lstrip(".")
    if fmt not in _FORMATS:
        raise ValueError(f"figure format must be one of {_FORMATS}: {fmt!r}")
    FIGURE_FORMAT = fmt


def _save(fig, path: str) -> str:
    base, ext = os.path.splitext(path)
    if ext.lstrip(".").lower() != FIGURE_FORMAT:
        path = f"{base}.{FIGURE_FORMAT}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=130)
    plt.close(fig)
    return path


def loss_curve(history: dict, path: str, key: str = "rec") -> str:
    """Reconstruction-loss curve, log y-scale (``CYL:792-801``)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.asarray(history[key]))
    ax.set_xlabel("epochs")
    ax.set_ylabel("rec loss")
    ax.set_yscale("log")
    return _save(fig, path)


def temporal_coefficients(z: np.ndarray, path: str, labels: Optional[Sequence[str]] = None) -> str:
    """All temporal coefficient traces (``CYL:1172-1177``). z is (T, m)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    z = np.asarray(z)
    for i, row in enumerate(z):
        ax.plot(row, lw=0.8, label=labels[i] if labels else None)
    ax.set_xlabel("timesteps")
    ax.set_ylabel("z")
    if labels:
        ax.legend(fontsize=6, ncol=2)
    return _save(fig, path)


def pod_spectrum(singular_values: np.ndarray, path: str) -> str:
    """Singular values + cumulative energy (``CYL:214-236``)."""
    s = np.asarray(singular_values)
    energy = s**2 / np.sum(s**2)
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    axes[0].semilogy(np.arange(1, len(s) + 1), s, "o-", ms=3)
    axes[0].set_xlabel("mode")
    axes[0].set_ylabel("singular value")
    axes[1].plot(np.arange(1, len(s) + 1), np.cumsum(energy), "o-", ms=3)
    axes[1].set_xlabel("mode")
    axes[1].set_ylabel("cumulative energy")
    axes[1].set_ylim(0, 1.02)
    return _save(fig, path)


def infer_voxel_grid(mesh, field_len: int):
    """Infer the (nx, ny, nz) grid a length-``field_len`` field lives on.

    The reference's aneurysm case stores CellData on a voxel grid inside a
    ``.vtu`` and renders mid-plane ``imshow`` slices of ``reshape(field,
    (x_range, y_range, z_range))`` (``DESMO/aneurysm/DESMO_ICA_norm.py:
    654-769``). An unstructured file carries no ``dimensions`` attribute, so
    the grid is recovered from the point lattice: if the unique per-axis
    coordinates tile the points exactly, the mesh is structured. Returns the
    POINT grid dims when the field is point-located, the CELL grid dims
    (each axis one less) when cell-located, or None for genuinely
    unstructured meshes / non-matching field lengths.
    """
    if mesh is None:
        return None

    def match(dims):
        dims = tuple(int(d) for d in dims)
        if field_len == int(np.prod(dims)):
            return dims
        cdims = tuple(max(d - 1, 1) for d in dims)
        if field_len == int(np.prod(cdims)):
            return cdims
        return None

    if mesh.dimensions is not None:
        return match(mesh.dimensions)
    pts = getattr(mesh, "points", None)
    if pts is None or len(pts) == 0:
        return None
    pts = np.asarray(pts)
    rounded = np.round(pts, 9)
    axes = [np.unique(rounded[:, a]) for a in range(pts.shape[1])]
    dims = tuple(len(u) for u in axes)
    if int(np.prod(dims)) != len(pts):
        return None  # not a tensor-product lattice
    # Unique-count matching alone admits permuted lattices; _render_field
    # reshapes order='F', so the points must actually be stored x-fastest.
    # Verify against the x-fastest lattice reconstruction.
    grids = np.meshgrid(*axes, indexing="ij")
    expected = np.stack([g.ravel(order="F") for g in grids], axis=1)
    if not np.array_equal(rounded, expected):
        return None  # lattice stored in a permuted order
    return match(dims)


def _render_field(ax, field: np.ndarray, points=None, grid_shape=None, plane=None, cmap="turbo"):
    """Scatter a point-cloud field, or imshow a slice of a voxel/grid field."""
    field = np.asarray(field)
    if points is not None and grid_shape is None and len(field) != len(points):
        # e.g. a cell-located field paired with mesh points: a scatter would
        # be wrong (or crash); fall back to a line plot of the raw values
        points = None
    if grid_shape is not None:
        # VTK structured point data is x-fastest: Fortran-order reshape
        vol = field.reshape(grid_shape, order="F")
        img = vol[:, :, plane] if len(grid_shape) == 3 else vol
        h = ax.imshow(img.T, origin="lower", cmap=cmap)
    elif points is not None:
        h = ax.scatter(points[:, 0], points[:, 1], c=field, s=2, cmap=cmap, rasterized=True)
        ax.set_aspect("equal")
    else:
        h = ax.plot(field)[0]
        return h
    plt.colorbar(h, ax=ax, shrink=0.8)
    return h


def field_layout(mesh, field_len: int):
    """``(points, grid_shape, plane)`` for rendering a length-``field_len``
    field from a snapshot mesh: voxel/structured meshes get mid-plane imshow
    slices (legacy rectilinear files with explicit dimensions AND the
    aneurysm-style .vtu with CellData on a voxel lattice,
    ``DESMO_ICA_norm.py:654-769``); point-located unstructured meshes get a
    2D scatter; anything else renders index-ordered."""
    points = mesh.points[:, :2] if mesh is not None and mesh.points is not None else None
    grid_shape = infer_voxel_grid(mesh, field_len)
    plane = None
    if grid_shape is not None:
        dims = tuple(d for d in grid_shape if d > 1)
        grid_shape = dims
        plane = dims[-1] // 2 if len(dims) == 3 else None
        points = None
    elif points is not None and len(points) != field_len:
        points = None  # cell-located field on an unstructured mesh
    return points, grid_shape, plane


def mode_fields(
    latent: np.ndarray,
    omega: Optional[np.ndarray],
    path: str,
    points=None,
    grid_shape=None,
    plane=None,
) -> str:
    """Per-mode panels: phi_i plus sin/cos/tanh(omega * phi_i) — the
    ``modes.pdf`` / ``more_modes.pdf`` report (``CYL:931-1165``). With
    ``omega=None`` only the raw mode row is rendered (the POD-analysis
    spatial-mode panels, ``CYL:241-276``, where no frequencies exist)."""
    latent = np.asarray(latent)
    if omega is not None:
        omega = np.asarray(omega)
    r = latent.shape[1]
    rows = 1 if omega is None else 4
    fig, axes = plt.subplots(rows, r, figsize=(3.2 * r, 2.6 * rows), squeeze=False)
    funcs = [np.sin, np.cos, np.tanh]
    names = ["phi", "sin", "cos", "tanh"]
    for i in range(r):
        fields = [latent[:, i]]
        if omega is not None:
            fields += [funcs[k](omega[k, i] * latent[:, i]) for k in range(3)]
        for rix, (name, f) in enumerate(zip(names, fields)):
            ax = axes[rix][i]
            _render_field(ax, f, points, grid_shape, plane)
            ax.set_title(f"{name} mode{i + 1}", fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
    return _save(fig, path)


def term_fields(
    latent: np.ndarray,
    c: np.ndarray,
    spec,
    path: str,
    points=None,
    grid_shape=None,
    plane=None,
    max_terms: int = 16,
) -> str:
    """Spatial structure of each (surviving) polynomial library term — the
    per-term poly-mode PDFs (``plot_poly_modes``, ``CYL:820-849``)."""
    import jax.numpy as jnp

    latent = np.asarray(latent)
    r = latent.shape[1]
    theta = np.asarray(
        library.eval_library(jnp.asarray(latent), library.factor_table(r, spec.poly_order))
    )
    names = library.poly_term_names(r, spec.poly_order)
    c = np.asarray(c)
    active = [t for t in range(len(names)) if c[t] != 0][:max_terms]
    if not active:
        active = list(range(min(len(names), max_terms)))
    cols = min(4, len(active))
    rows = -(-len(active) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.6 * rows), squeeze=False)
    for j, t in enumerate(active):
        ax = axes[j // cols][j % cols]
        _render_field(ax, c[t] * theta[:, t], points, grid_shape, plane)
        ax.set_title(f"{names[t]} (c={c[t]:.3g})", fontsize=8)
        ax.set_xticks([])
        ax.set_yticks([])
    for j in range(len(active), rows * cols):
        axes[j // cols][j % cols].axis("off")
    return _save(fig, path)


def true_vs_predicted(
    x: np.ndarray,
    recon: np.ndarray,
    timestep: int,
    path: str,
    points=None,
    grid_shape=None,
    plane=None,
    pod_recon: Optional[np.ndarray] = None,
) -> str:
    """Side-by-side snapshot comparison (``CYL:736-763, 1272-1302``)."""
    panels = [("True", np.asarray(x)[:, timestep]), ("DESMO", np.asarray(recon)[:, timestep])]
    if pod_recon is not None:
        panels.append(("POD", np.asarray(pod_recon)[:, timestep]))
    fig, axes = plt.subplots(1, len(panels), figsize=(4.0 * len(panels), 3.2), squeeze=False)
    for ax, (title, f) in zip(axes[0], panels):
        _render_field(ax, f, points, grid_shape, plane)
        ax.set_title(title, fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
    return _save(fig, path)


def render_mesh_field(mesh, field: np.ndarray, path: str, title: str = "", cmap: str = "turbo") -> str:
    """Render a field on the original unstructured mesh with PyVista, exactly
    like the reference's plotters (``CYL:736-763``). Optional dependency:
    falls back to the matplotlib scatter path when pyvista is absent.

    ``mesh`` is a ``desmo_tpu.io.vtk.Mesh`` (points + cells)."""
    try:
        import pyvista as pv
    except ImportError:
        fig, ax = plt.subplots(figsize=(5, 4))
        pts = mesh.points if mesh is not None and mesh.points is not None else None
        _render_field(ax, field, points=pts[:, :2] if pts is not None else None)
        ax.set_title(title or "field", fontsize=10)
        return _save(fig, path)
    cloud = pv.PolyData(np.asarray(mesh.points, float))  # pragma: no cover
    cloud["field"] = np.asarray(field)  # pragma: no cover
    plotter = pv.Plotter(off_screen=True)  # pragma: no cover
    plotter.add_mesh(cloud, scalars="field", cmap=cmap)  # pragma: no cover
    if title:  # pragma: no cover
        plotter.add_title(title, font_size=10)
    plotter.view_xy()  # pragma: no cover
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)  # pragma: no cover
    plotter.screenshot(path)  # pragma: no cover
    plotter.close()  # pragma: no cover
    return path  # pragma: no cover


def sweep_curve(entries, path: str) -> str:
    """Error vs. surviving-term-count curve from a threshold sweep or greedy
    pruning run (``...TurbulentChannel.py:1166-1245`` summary)."""
    fig, ax = plt.subplots(figsize=(5.5, 3.8))
    counts = [e.nonzero_terms for e in entries]
    errs = [e.error for e in entries]
    ax.plot(counts, errs, "o-", ms=4)
    ax.set_xlabel("nonzero terms")
    ax.set_ylabel("relative error")
    ax.set_yscale("log")
    return _save(fig, path)


def forecast_errors(
    per_train: np.ndarray, per_hold: np.ndarray, path: str
) -> str:
    """Per-snapshot relative error across the train window AND the held-out
    horizon (temporal-holdout forecasting — beyond reference: the reference
    never scores unseen times). One log-y series; the dashed rule where
    training data ends marks where genuine forecasting begins, so
    horizon-dependent error growth is visible at a glance. The two vectors
    must be scored with the same model class to be comparable."""
    m_train = len(per_train)
    e = np.concatenate([
        np.asarray(per_train, dtype=float), np.asarray(per_hold, dtype=float)
    ])
    fig, ax = plt.subplots(figsize=(6.5, 3.8))
    ax.plot(np.arange(len(e)), e, lw=1.2, color="#2a6f97")
    ax.axvline(m_train - 0.5, color="0.45", lw=1.0, ls="--")
    ymax = float(np.nanmax(e)) if len(e) else 1.0
    ax.text(m_train * 0.5, ymax, "train", ha="center", va="bottom",
            fontsize=8, color="0.35")
    ax.text((m_train + len(e)) * 0.5, ymax, "held out", ha="center",
            va="bottom", fontsize=8, color="0.35")
    ax.set_xlabel("snapshot")
    ax.set_ylabel("relative error")
    ax.set_yscale("log")
    ax.grid(True, which="major", lw=0.4, color="0.9")
    ax.set_axisbelow(True)
    return _save(fig, path)


def term_stability_bars(names: Sequence[str], frequency: np.ndarray, path: str) -> str:
    """Selection frequency of each candidate term across multi-start seeds
    (``ensemble.term_stability`` — beyond reference: the reference trains one
    init per dataset, so it cannot distinguish robust terms from
    init-sensitive artifacts). Terms never selected are omitted; bars stay in
    the reference's candidate-library order; fractional (init-sensitive)
    bars are direct-labeled."""
    freq = np.asarray(frequency, dtype=float)
    keep = freq > 0.0
    kept = [(n, f) for n, f, k in zip(names, freq, keep) if k]
    fig, ax = plt.subplots(figsize=(6, max(2.2, 0.3 * len(kept) + 1.2)))
    if not kept:
        ax.text(0.5, 0.5, "no terms selected in any seed", ha="center",
                va="center", transform=ax.transAxes, color="0.35")
        ax.set_axis_off()
        return _save(fig, path)
    y = np.arange(len(kept))[::-1]
    vals = np.array([f for _, f in kept])
    ax.barh(y, vals, color="#2a6f97", height=0.62)
    ax.set_yticks(y)
    ax.set_yticklabels([n for n, _ in kept], fontsize=7)
    ax.axvline(1.0, color="0.6", lw=0.8)
    ax.set_xlim(0, 1.08)
    ax.set_xlabel("selection frequency across seeds")
    for yi, fi in zip(y, vals):
        if fi < 1.0:
            ax.text(fi + 0.015, yi, f"{fi:.2f}", va="center", fontsize=7,
                    color="0.25")
    ax.grid(True, axis="x", lw=0.4, color="0.9")
    ax.set_axisbelow(True)
    return _save(fig, path)


def sr_trajectories(
    z_data: np.ndarray,
    z_sim: np.ndarray,
    names: Sequence[str],
    path: str,
    m_train: Optional[int] = None,
) -> str:
    """Trained z(t) vs the identified system's simulated trajectory, one
    panel per channel — the reference's DynSysFit comparison figure
    (``DESMO-SR/...ReadAndInference-DynamicalSystemsFit.py:1306-1327``:
    small multiples, trained solid / discovered dashed, one shared legend).

    ``z_sim`` may extend PAST ``z_data`` (forecasting); ``m_train`` then
    draws the train/forecast boundary."""
    z_data = np.asarray(z_data)
    z_sim = np.asarray(z_sim)
    c = z_data.shape[1]
    ncols = 2 if c > 1 else 1
    nrows = (c + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5.0 * ncols, 2.4 * nrows), squeeze=False
    )
    for i in range(c):
        ax = axes[i // ncols][i % ncols]
        ax.plot(np.arange(z_data.shape[0]), z_data[:, i], lw=1.2,
                color="#2a6f97", label="trained z(t)" if i == 0 else None)
        ax.plot(np.arange(z_sim.shape[0]), z_sim[:, i], lw=1.2, ls="--",
                color="#c4541c", label="identified dynamics" if i == 0 else None)
        if m_train is not None and z_sim.shape[0] > z_data.shape[0]:
            ax.axvline(m_train - 0.5, color="0.45", lw=0.8, ls=":")
        ax.set_ylabel(names[i] if i < len(names) else f"z{i}", fontsize=8)
        ax.tick_params(labelsize=7)
    for j in range(c, nrows * ncols):
        axes[j // ncols][j % ncols].set_axis_off()
    axes[-1][0].set_xlabel("time")
    fig.legend(loc="lower center", bbox_to_anchor=(0.5, 1.0), ncol=2,
               fontsize=8, frameon=False)
    fig.tight_layout()
    return _save(fig, path)


def seed_recs(
    labels: Sequence[str],
    recs: Sequence[float],
    best: int,
    path: str,
) -> str:
    """Final per-member REC error of a multi-start run, one bar per seed
    with the winner marked (beyond reference — one init per dataset there).
    Under a hyperparameter sweep the labels carry each member's combo, so
    this doubles as the sweep outcome chart. Diverged members (non-finite
    REC) render as annotated gaps, not bars."""
    recs = np.asarray([float(v) for v in recs])
    n = len(recs)
    fig, ax = plt.subplots(figsize=(6, max(2.0, 0.42 * n + 1.0)))
    y = np.arange(n)[::-1]
    finite = np.isfinite(recs)
    vals = np.where(finite, recs, 0.0)
    ax.barh(y[finite], vals[finite], color="#2a6f97", height=0.62)
    for yi, ok, v in zip(y, finite, recs):
        if not ok:
            ax.text(0.0, yi, " diverged", va="center", fontsize=7,
                    color="0.35", style="italic")
    if finite.any() and finite[best]:
        ax.text(recs[best], y[best], " winner", va="center", fontsize=7,
                color="0.25", fontweight="bold")
        mx = np.nanmax(np.where(finite, recs, np.nan))
        mn = np.nanmin(np.where(finite, recs, np.nan))
        if mn > 0 and mx / max(mn, 1e-300) > 10:
            ax.set_xscale("log")
    ax.set_yticks(y)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("final REC error")
    ax.grid(True, axis="x", lw=0.4, color="0.9")
    ax.set_axisbelow(True)
    return _save(fig, path)
