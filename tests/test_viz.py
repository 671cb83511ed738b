"""Visualization reports: every figure function must produce a file."""

import os

import numpy as np

from desmo_tpu import sparsify, viz
from desmo_tpu.models import desmo


def test_all_reports_render(tmp_path):
    rng = np.random.default_rng(0)
    n, m, r = 50, 30, 2
    spec = desmo.DesmoSpec(n=n, m=m, r=r, poly_order=2)
    history = {"rec": np.exp(-np.linspace(0, 5, 100))}
    latent = rng.standard_normal((n, r))
    omega = rng.uniform(0.5, 2.0, (3, r))
    points = rng.standard_normal((n, 2))
    x = rng.standard_normal((n, m))
    recon = x + 0.1 * rng.standard_normal((n, m))
    c = rng.standard_normal(spec.num_poly_terms)

    paths = [
        viz.loss_curve(history, str(tmp_path / "loss.png")),
        viz.temporal_coefficients(rng.standard_normal((4, m)), str(tmp_path / "z.png")),
        viz.pod_spectrum(np.sort(rng.uniform(0.1, 10, 8))[::-1], str(tmp_path / "pod.png")),
        viz.mode_fields(latent, omega, str(tmp_path / "modes.png"), points=points),
        viz.term_fields(latent, c, spec, str(tmp_path / "terms.png"), points=points),
        viz.true_vs_predicted(x, recon, 3, str(tmp_path / "cmp.png"), points=points),
        viz.sweep_curve(
            [sparsify.SweepEntry(1e-2, 0.1, 10), sparsify.SweepEntry(1.0, 0.2, 4)],
            str(tmp_path / "sweep.png"),
        ),
    ]
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000, p


def test_grid_rendering(tmp_path):
    """Voxel-grid rendering path (aneurysm 30^3, channel 128^2 analogs)."""
    rng = np.random.default_rng(1)
    n = 4 * 4 * 4
    latent = rng.standard_normal((n, 2))
    omega = np.ones((3, 2))
    p = viz.mode_fields(
        latent, omega, str(tmp_path / "vox.png"), grid_shape=(4, 4, 4), plane=2
    )
    assert os.path.getsize(p) > 1000
    x = rng.standard_normal((16, 5))
    p = viz.true_vs_predicted(
        x, x, 0, str(tmp_path / "grid.png"), grid_shape=(4, 4)
    )
    assert os.path.getsize(p) > 1000


def test_infer_voxel_grid():
    from desmo_tpu import viz
    from desmo_tpu.io import synthetic as synth

    mesh = synth.voxel_grid_mesh(5, 4, 3)
    assert viz.infer_voxel_grid(mesh, 5 * 4 * 3) == (5, 4, 3)  # cell field
    assert viz.infer_voxel_grid(mesh, 6 * 5 * 4) == (6, 5, 4)  # point field
    assert viz.infer_voxel_grid(mesh, 17) is None  # length matches neither
    assert viz.infer_voxel_grid(None, 60) is None
    # genuinely unstructured points: no lattice
    import dataclasses as dc

    rng = np.random.default_rng(0)
    scattered = dc.replace(mesh, points=rng.standard_normal((60, 3)).astype(np.float32))
    assert viz.infer_voxel_grid(scattered, 60) is None
    # explicit dimensions attribute (legacy rectilinear) takes precedence
    dims = dc.replace(mesh, dimensions=(4, 4, 4))
    assert viz.infer_voxel_grid(dims, 64) == (4, 4, 4)
    assert viz.infer_voxel_grid(dims, 27) == (3, 3, 3)
    # a PERMUTED lattice passes the unique-count test but must be rejected:
    # _render_field reshapes order='F' assuming x-fastest storage (ADVICE r2)
    perm = dc.replace(mesh, points=np.asarray(mesh.points)[::-1].copy())
    assert viz.infer_voxel_grid(perm, 5 * 4 * 3) is None
    shuffled = np.asarray(mesh.points).copy()
    rng2 = np.random.default_rng(3)
    shuffled = shuffled[rng2.permutation(len(shuffled))]
    assert viz.infer_voxel_grid(dc.replace(mesh, points=shuffled), 60) is None


def test_render_field_guards_cell_point_mismatch(tmp_path):
    """A cell-located field paired with mesh POINTS must not scatter-crash."""
    from desmo_tpu import viz

    import matplotlib.pyplot as plt

    points = np.random.default_rng(1).standard_normal((50, 2)).astype(np.float32)
    field = np.arange(30, dtype=np.float32)  # wrong length for these points
    fig, ax = plt.subplots()
    viz._render_field(ax, field, points=points)  # falls back to a line plot
    plt.close(fig)


def test_render_mesh_field_pyvista_path(tmp_path, monkeypatch):
    """Exercise the PyVista render path with a recording stub module, so the
    code is tested even though pyvista isn't installed here (the fallback
    scatter path is covered elsewhere)."""
    import sys
    import types

    calls = {}

    class FakePolyData(dict):
        def __init__(self, pts):
            calls["points"] = np.asarray(pts)

    class FakePlotter:
        def __init__(self, off_screen=False):
            calls["off_screen"] = off_screen

        def add_mesh(self, cloud, scalars=None, cmap=None):
            calls["scalars"] = scalars
            calls["cmap"] = cmap

        def add_title(self, title, font_size=None):
            calls["title"] = title

        def view_xy(self):
            calls["view"] = "xy"

        def screenshot(self, path):
            with open(path, "wb") as f:
                f.write(b"\x89PNG fake")
            calls["screenshot"] = path

        def close(self):
            calls["closed"] = True

    fake = types.ModuleType("pyvista")
    fake.PolyData = FakePolyData
    fake.Plotter = FakePlotter
    monkeypatch.setitem(sys.modules, "pyvista", fake)

    from desmo_tpu.io import synthetic as synth

    mesh = synth.voxel_grid_mesh(3, 3, 3)
    field = np.arange(len(mesh.points), dtype=np.float32)
    out = str(tmp_path / "pv.png")
    path = viz.render_mesh_field(mesh, field, out, title="mode 1")
    assert path == out and os.path.exists(out)
    assert calls["off_screen"] and calls["closed"] and calls["view"] == "xy"
    assert calls["title"] == "mode 1" and calls["scalars"] == "field"
    assert len(calls["points"]) == len(mesh.points)


def test_render_mesh_field_fallback_without_pyvista(tmp_path):
    """Without pyvista the same call falls back to the matplotlib scatter."""
    from desmo_tpu.io import synthetic as synth

    mesh = synth.voxel_grid_mesh(3, 3, 3)
    field = np.arange(len(mesh.points), dtype=np.float32)
    out = str(tmp_path / "fb.png")
    assert viz.render_mesh_field(mesh, field, out) == out
    assert os.path.exists(out)


def test_forecast_and_stability_reports(tmp_path):
    """The beyond-reference reports render: per-horizon forecast error and
    cross-seed term-stability bars (incl. the nothing-selected edge)."""
    paths = [
        viz.forecast_errors(
            np.full(30, 1e-3), np.geomspace(1e-3, 1e-1, 10),
            str(tmp_path / "fc.png"),
        ),
        viz.term_stability_bars(
            ["z0", "z1", "zsin0"], [1.0, 0.5, 0.0], str(tmp_path / "stab.png")
        ),
        viz.term_stability_bars(["z0"], [0.0], str(tmp_path / "empty.png")),
    ]
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_sr_trajectories_report(tmp_path):
    """DynSysFit comparison panels render, incl. the forecast-extended case."""
    m, h, c = 50, 10, 3
    t = np.linspace(0, 4 * np.pi, m + h)
    z_full = np.stack([np.sin(t * (i + 1)) for i in range(c)], axis=1)
    p1 = viz.sr_trajectories(
        z_full[:m], z_full[:m] + 0.05, ["z1", "zsin0", "ztanh0"],
        str(tmp_path / "sr.png"),
    )
    p2 = viz.sr_trajectories(  # simulated past the data: boundary drawn
        z_full[:m], z_full, ["z1", "zsin0", "ztanh0"],
        str(tmp_path / "srf.png"), m_train=m,
    )
    for p in (p1, p2):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_seed_recs_report(tmp_path):
    """Per-member REC chart: finite bars, diverged gap, winner mark; also
    the wide-range case that flips to a log axis."""
    p1 = viz.seed_recs(
        ["seed 0", "seed 1: beta=0.01", "seed 2"],
        [0.12, float("inf"), 0.08], 2, str(tmp_path / "r.png"),
    )
    p2 = viz.seed_recs(  # >10x spread -> log x
        ["a", "b"], [1e-4, 0.5], 0, str(tmp_path / "rlog.png"),
    )
    for p in (p1, p2):
        assert os.path.exists(p) and os.path.getsize(p) > 0
