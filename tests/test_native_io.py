"""Native C++ snapshot loader vs. the pure-Python reference readers."""

import struct
import zlib

import numpy as np
import pytest

from desmo_tpu.io import native, vtk as vio
from test_vtk_io import _legacy_rectilinear, _vtu_appended_raw

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"no native build: {native.build_error()}"
)


def _write_series(tmp_path, maker, m, ext, seed=0, npts=9):
    rng = np.random.default_rng(seed)
    vels = []
    for i in range(m):
        v = rng.standard_normal((npts, 3))
        vels.append(v)
        (tmp_path / f"velocity_{i}{ext}").write_bytes(maker(v))
    return vels


@pytest.mark.parametrize("compressed", [False, True])
def test_native_vtu_matches_python(tmp_path, compressed):
    m = 5
    vels = _write_series(tmp_path, lambda v: _vtu_appended_raw(v, compressed), m, ".vtu")
    x_native = native.read_snapshot_series_native(
        str(tmp_path), "velocity_", 0, m, array="velocity", location="cell"
    )
    x_py, _ = vio.read_snapshot_series(
        str(tmp_path), "velocity_", 0, m, array="velocity", location="cell"
    )
    assert x_native.shape == (27, m)
    np.testing.assert_allclose(x_native, x_py.astype(np.float32), rtol=1e-6)
    for t in range(m):
        np.testing.assert_allclose(x_native[:, t], vels[t].reshape(-1), rtol=1e-6)


def test_native_legacy_matches_python(tmp_path):
    m = 4
    _write_series(tmp_path, lambda v: _legacy_rectilinear(v, binary=True), m, ".vtk", seed=1, npts=12)

    x_native = native.read_snapshot_series_native(
        str(tmp_path), "velocity_", 0, m, extension=".vtk", array="Velocity"
    )
    x_py, _ = vio.read_snapshot_series(
        str(tmp_path), "velocity_", 0, m, extension=".vtk", array="Velocity"
    )
    np.testing.assert_allclose(x_native, x_py.astype(np.float32), rtol=1e-6)


def test_native_error_reporting(tmp_path):
    (tmp_path / "velocity_0.vtu").write_bytes(b"not a vtk file at all")
    with pytest.raises(RuntimeError):
        native.read_snapshot_series_native(str(tmp_path), "velocity_", 0, 1)


def test_native_many_files_parallel(tmp_path):
    """Exercise the thread pool with more files than threads."""
    m = 64
    _write_series(tmp_path, lambda v: _vtu_appended_raw(v, True), m, ".vtu", seed=2)
    x = native.read_snapshot_series_native(
        str(tmp_path), "velocity_", 0, m, array="velocity", location="cell"
    )
    x_py, _ = vio.read_snapshot_series(
        str(tmp_path), "velocity_", 0, m, array="velocity", location="cell"
    )
    np.testing.assert_allclose(x, x_py.astype(np.float32), rtol=1e-6)
