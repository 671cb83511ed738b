"""Reference-scale ingestion rehearsal (VERDICT r3 #7, completes L1 evidence).

Generates full-size reference-format snapshot series on disk, times the
native C++ loader vs the pure-Python reader on each, then runs the real CLI
(`python -m desmo_tpu run --data-dir ...`) end-to-end from the files:

1. cylinder:  3961-point .vtu x 1001, raw-appended binary PointData
   (the reference cylinder series shape/format, `CYL:39-85,157-164`)
2. aneurysm:  30^3-cell voxel .vtu x 1000, raw-appended CellData
   (`DESMO/aneurysm/DESMO_ICA_norm.py:104-127,654-769`)
3. channel:   128^2 legacy binary .vtk x 2000, stride-2 consumption
   (`...TurbulentChannel.py:150-189`)

Prints one JSON report; writes ~3 GB under --root (default /tmp/desmo_ingest).
Usage: python scripts/ingest_rehearsal.py [--root DIR] [--epochs N] [--skip-cli]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_cylinder(root, n=3961, m=1001):
    from desmo_tpu.io import synthetic, vtk as vio

    d = os.path.join(root, "cylinder")
    os.makedirs(d, exist_ok=True)
    x = synthetic.cylinder_wake(n, m, seed=0)  # (n, m) signal
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, size=(n, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    # minimal triangulation-free cell block: one poly-vertex cell
    mesh = vio.Mesh(
        points=pts, point_data={}, cell_data={},
        cells=np.arange(n, dtype=np.int64),
        cell_offsets=np.asarray([n], np.int64),
        cell_types=np.asarray([2], np.uint8),  # VTK_POLY_VERTEX
    )
    t0 = time.perf_counter()
    for j in range(m):
        vel = np.zeros((n, 3), np.float32)
        vel[:, 0] = x[:, j]
        vel[:, 1] = 0.3 * x[:, j]
        vio.write_vtu(
            os.path.join(d, f"velocity_{j}.vtu"), mesh,
            point_data={"velocity": vel}, data_format="appended",
        )
    return d, m, time.perf_counter() - t0


def gen_aneurysm(root, nx=30, m=1000):
    from desmo_tpu.io import synthetic, vtk as vio

    d = os.path.join(root, "aneurysm")
    os.makedirs(d, exist_ok=True)
    ncells = nx ** 3
    mesh = synthetic.voxel_grid_mesh(nx, nx, nx)
    x = synthetic.cylinder_wake(ncells, m, seed=2)
    t0 = time.perf_counter()
    for j in range(m):
        vel = np.zeros((ncells, 3), np.float32)
        vel[:, 0] = x[:, j]
        vel[:, 2] = 0.5 * x[:, j]
        vio.write_vtu(
            os.path.join(d, f"velocity_{j}.vtu"), mesh,
            cell_data={"velocity": vel}, data_format="appended",
        )
    return d, m, time.perf_counter() - t0


def gen_channel(root, side=128, n_files=2000):
    from desmo_tpu.io import synthetic, vtk as vio

    d = os.path.join(root, "channel")
    os.makedirs(d, exist_ok=True)
    n = side * side
    x = synthetic.cylinder_wake(n, n_files, seed=3)
    t0 = time.perf_counter()
    for j in range(n_files):
        vel = np.zeros((n, 3), np.float32)
        vel[:, 0] = x[:, j]
        vel[:, 1] = -x[:, j]
        vio.write_legacy_vtk(
            os.path.join(d, f"velocity_{j}.vtk"), (side, side, 1),
            {"velocity": vel},
        )
    return d, n_files, time.perf_counter() - t0


def time_loaders(d, n_files, extension, location):
    from desmo_tpu.io import native, vtk as vio

    t0 = time.perf_counter()
    xn = native.read_snapshot_series_native(
        d, "velocity_", 0, n_files, extension=extension,
        array="velocity", location=location,
    )
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    xp, _ = vio.read_snapshot_series(
        d, "velocity_", 0, n_files, extension=extension,
        array="velocity", location=location,
    )
    t_python = time.perf_counter() - t0
    np.testing.assert_allclose(xn, xp, rtol=1e-6)
    return {
        "native_s": round(t_native, 2),
        "python_s": round(t_python, 2),
        "speedup": round(t_python / t_native, 1),
        "shape": list(xn.shape),
    }


def run_cli(preset, d, extension, location, epochs, out):
    cmd = [
        sys.executable, "-m", "desmo_tpu", "run", "--preset", preset,
        "--data-dir", d, "--extension", extension, "--location", location,
        "--epochs", str(epochs), "--out-dir", out,
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    wall = time.perf_counter() - t0
    tail = proc.stdout.strip().splitlines()
    summary = None
    for line in reversed(tail):
        if line.startswith("{"):
            summary = json.loads(line)
            break
    return {"ok": proc.returncode == 0, "wall_s": round(wall, 1),
            "summary": summary,
            **({} if proc.returncode == 0 else {"stderr": proc.stderr[-2000:]})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/desmo_ingest")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--skip-cli", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep generated files")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    out = os.path.join(args.root, "runs")

    report = {}
    plans = [
        ("cylinder", gen_cylinder, ".vtu", "point"),
        ("aneurysm", gen_aneurysm, ".vtu", "cell"),
        ("channel", gen_channel, ".vtk", "point"),
    ]
    for preset, gen, ext, loc in plans:
        d, n_files, gen_s = gen(args.root)
        entry = {"gen_s": round(gen_s, 1), "files": n_files,
                 "bytes": sum(e.stat().st_size for e in os.scandir(d))}
        entry["load"] = time_loaders(d, n_files, ext, loc)
        if not args.skip_cli:
            entry["cli"] = run_cli(preset, d, ext, loc, args.epochs, out)
        report[preset] = entry
        print(f"## {preset}: {json.dumps(entry)}", file=sys.stderr, flush=True)
    print(json.dumps(report))
    if not args.keep:
        for preset, *_ in plans:
            shutil.rmtree(os.path.join(args.root, preset), ignore_errors=True)


if __name__ == "__main__":
    main()
