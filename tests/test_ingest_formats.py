"""End-to-end CLI ingestion over all three on-disk reference formats
(raw-appended PointData .vtu, raw-appended CellData voxel .vtu, legacy binary
STRUCTURED_POINTS .vtk) at small shapes; the full reference-scale rehearsal
lives in ``scripts/ingest_rehearsal.py`` (results in docs/RESULTS.md)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import ingest_rehearsal as ir  # noqa: E402

from desmo_tpu.__main__ import main as cli_main  # noqa: E402


@pytest.mark.parametrize(
    "preset,gen,kwargs,ext,loc,t_end",
    [
        ("cylinder", ir.gen_cylinder, dict(n=50, m=8), ".vtu", "point", 8),
        ("aneurysm", ir.gen_aneurysm, dict(nx=4, m=6), ".vtu", "cell", 6),
        ("channel", ir.gen_channel, dict(side=8, n_files=10), ".vtk", "point", 10),
    ],
)
def test_cli_run_from_on_disk_series(tmp_path, capsys, preset, gen, kwargs, ext, loc, t_end):
    d, n_files, _ = gen(str(tmp_path), **kwargs)
    rc = cli_main([
        "run", "--preset", preset, "--data-dir", d,
        "--extension", ext, "--location", loc,
        "--t-end", str(t_end), "--epochs", "5",
        "--out-dir", str(tmp_path / "runs"), "--no-figures",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    summary = json.loads([l for l in out.strip().splitlines() if l.startswith("{")][-1])
    assert summary["preset"] == preset
    assert np.isfinite(summary["relative_error"])


def test_native_and_python_loaders_agree_on_all_formats(tmp_path):
    """The rehearsal's loader cross-check at small shapes: both loaders must
    produce identical matrices for every on-disk format."""
    for gen, kwargs, ext, loc in [
        (ir.gen_cylinder, dict(n=40, m=5), ".vtu", "point"),
        (ir.gen_aneurysm, dict(nx=3, m=4), ".vtu", "cell"),
        (ir.gen_channel, dict(side=6, n_files=6), ".vtk", "point"),
    ]:
        d, n_files, _ = gen(str(tmp_path), **kwargs)
        res = ir.time_loaders(d, n_files, ext, loc)  # asserts allclose inside
        assert res["shape"][1] == n_files


def test_cli_pod_streaming_matches_in_memory(tmp_path, capsys):
    """`desmo_tpu pod` over an on-disk series: the out-of-core streaming path
    (X never materialized) must agree with the in-memory exact SVD loaded from
    the same files — spectrum, captured energy, and factored error."""
    d, m, _ = ir.gen_cylinder(str(tmp_path), n=60, m=12)
    common = [
        "pod", "--preset", "cylinder", "--rank", "3",
        "--data-dir", d, "--t-end", str(m),
    ]
    assert cli_main(common + ["--method", "svd"]) == 0
    exact = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cli_main(common + ["--method", "streaming", "--block", "5"]) == 0
    stream = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stream["rank"] == exact["rank"] == 3
    np.testing.assert_allclose(
        stream["singular_values"], exact["singular_values"], rtol=1e-2
    )
    assert abs(stream["relative_error"] - exact["relative_error"]) < 2e-2
    # saving artifacts works on the streaming path too
    out = str(tmp_path / "pod.npz")
    assert cli_main(common + ["--method", "streaming", "--save", out]) == 0
    capsys.readouterr()
    saved = np.load(out)
    assert saved["modes"].shape == (60, 3)
    assert saved["temporal"].shape[0] == 3
    # POD_analysis figures render on both paths (streaming has no mesh:
    # spatial panels fall back to index-ordered rendering)
    import os

    for method, sub in [("svd", "f1"), ("streaming", "f2")]:
        figs = str(tmp_path / sub)
        assert cli_main(common + ["--method", method, "--figures", figs]) == 0
        capsys.readouterr()
        assert {"pod_spectrum.png", "temporal.png", "modes.png"} <= set(
            os.listdir(figs)
        )


def test_cli_figure_format_pdf(tmp_path, capsys, monkeypatch):
    """--figure-format pdf renders every report as PDF (the reference's
    save_graphic emits per-term mode PDFs, DESMO/cylinder_flow/
    DESMO-Cylinder.py:820-925); default stays PNG."""
    import os

    from desmo_tpu import viz

    # the CLI sets a module-wide switch — register its restore
    monkeypatch.setattr(viz, "FIGURE_FORMAT", viz.FIGURE_FORMAT)
    d, m, _ = ir.gen_cylinder(str(tmp_path), n=60, m=12)
    figs = str(tmp_path / "figs_pdf")
    rc = cli_main([
        "pod", "--preset", "cylinder", "--rank", "3",
        "--data-dir", d, "--t-end", str(m),
        "--method", "svd", "--figures", figs, "--figure-format", "pdf",
    ])
    capsys.readouterr()
    assert rc == 0
    assert {"pod_spectrum.pdf", "temporal.pdf", "modes.pdf"} <= set(
        os.listdir(figs)
    )
    # PDF magic bytes, not a renamed PNG
    with open(os.path.join(figs, "modes.pdf"), "rb") as fh:
        assert fh.read(5) == b"%PDF-"
    with pytest.raises(ValueError, match="figure format"):
        viz.set_figure_format("gif")


def test_cli_run_hyper_sweep_defaults_seeds_to_grid(tmp_path, capsys):
    """--sweep-beta/--sweep-lam without --seeds: the CLI defaults n_seeds to
    the combo-grid size and the run records the sweep in ensemble.json."""
    d, n_files, _ = ir.gen_cylinder(str(tmp_path), n=50, m=8)
    out_dir = tmp_path / "runs"
    rc = cli_main([
        "run", "--preset", "cylinder", "--data-dir", d,
        "--t-end", "8", "--epochs", "6",
        "--sweep-beta", "1e-3,1e-2",
        "--out-dir", str(out_dir), "--no-figures",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(
        [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert np.isfinite(summary["relative_error"])
    run_dirs = list(out_dir.iterdir())
    assert len(run_dirs) == 1
    with open(run_dirs[0] / "ensemble.json") as fh:
        rec = json.load(fh)
    assert rec["n_seeds"] == 2  # defaulted to the grid size
    assert rec["hypers"] is not None
    np.testing.assert_allclose(rec["hypers"]["betas"], [1e-3, 1e-2], rtol=1e-6)
