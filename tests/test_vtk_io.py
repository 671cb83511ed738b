"""VTK readers vs. hand-constructed files written straight from the format
spec (ascii, inline-base64, raw-appended, zlib-compressed; legacy ascii and
big-endian binary)."""

import base64
import struct
import zlib

import numpy as np
import pytest

from desmo_tpu.io import vtk as vio


def _vtu_ascii(points, velocity) -> bytes:
    pts = " ".join(f"{v:.9g}" for v in points.reshape(-1))
    vel = " ".join(f"{v:.9g}" for v in velocity.reshape(-1))
    n = len(points)
    return f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
 <UnstructuredGrid>
  <Piece NumberOfPoints="{n}" NumberOfCells="0">
   <PointData>
    <DataArray type="Float64" Name="velocity" NumberOfComponents="3" format="ascii">{vel}</DataArray>
   </PointData>
   <Points>
    <DataArray type="Float32" Name="Points" NumberOfComponents="3" format="ascii">{pts}</DataArray>
   </Points>
   <Cells>
    <DataArray type="Int64" Name="connectivity" format="ascii"></DataArray>
    <DataArray type="Int64" Name="offsets" format="ascii"></DataArray>
    <DataArray type="UInt8" Name="types" format="ascii"></DataArray>
   </Cells>
  </Piece>
 </UnstructuredGrid>
</VTKFile>""".encode()


def _vtu_inline_base64(velocity) -> bytes:
    raw = velocity.astype("<f4").tobytes()
    payload = struct.pack("<I", len(raw))
    b64 = (base64.b64encode(payload) + base64.b64encode(raw)).decode()
    n = len(velocity)
    return f"""<VTKFile type="UnstructuredGrid" byte_order="LittleEndian" header_type="UInt32">
 <UnstructuredGrid><Piece NumberOfPoints="{n}" NumberOfCells="0">
  <PointData>
   <DataArray type="Float32" Name="velocity" NumberOfComponents="3" format="binary">{b64}</DataArray>
  </PointData>
 </Piece></UnstructuredGrid>
</VTKFile>""".encode()


def _vtu_appended_raw(velocity, compressed: bool) -> bytes:
    raw = velocity.astype("<f8").tobytes()
    if compressed:
        comp = zlib.compress(raw)
        block = struct.pack("<4I", 1, len(raw), len(raw), len(comp)) + comp
        compressor = ' compressor="vtkZLibDataCompressor"'
    else:
        block = struct.pack("<I", len(raw)) + raw
        compressor = ""
    n = len(velocity)
    head = f"""<VTKFile type="UnstructuredGrid" byte_order="LittleEndian" header_type="UInt32"{compressor}>
 <UnstructuredGrid><Piece NumberOfPoints="{n}" NumberOfCells="0">
  <CellData>
   <DataArray type="Float64" Name="velocity" NumberOfComponents="3" format="appended" offset="0"/>
  </CellData>
 </Piece></UnstructuredGrid>
 <AppendedData encoding="raw">_""".encode()
    return head + block + b"</AppendedData></VTKFile>"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_vtu_ascii(tmp_path, rng):
    pts = rng.standard_normal((7, 3)).astype(np.float32)
    vel = rng.standard_normal((7, 3))
    path = tmp_path / "a.vtu"
    path.write_bytes(_vtu_ascii(pts, vel))
    mesh = vio.read_vtu(str(path))
    np.testing.assert_allclose(mesh.points, pts, rtol=1e-6)
    np.testing.assert_allclose(mesh.point_data["velocity"], vel, rtol=1e-7)


def test_vtu_inline_base64(tmp_path, rng):
    vel = rng.standard_normal((5, 3)).astype(np.float32)
    path = tmp_path / "b.vtu"
    path.write_bytes(_vtu_inline_base64(vel))
    mesh = vio.read_vtu(str(path))
    np.testing.assert_array_equal(mesh.point_data["velocity"], vel)


@pytest.mark.parametrize("compressed", [False, True])
def test_vtu_appended_raw(tmp_path, rng, compressed):
    vel = rng.standard_normal((9, 3))
    path = tmp_path / "c.vtu"
    path.write_bytes(_vtu_appended_raw(vel, compressed))
    mesh = vio.read_vtu(str(path))
    np.testing.assert_array_equal(mesh.cell_data["velocity"], vel)


def _legacy_rectilinear(velocity, binary: bool, name="Velocity") -> bytes:
    nx, ny, nz = 3, 2, 2
    n = nx * ny * nz
    assert len(velocity) == n
    head = [
        "# vtk DataFile Version 3.0",
        "channel slice",
        "BINARY" if binary else "ASCII",
        "DATASET RECTILINEAR_GRID",
        f"DIMENSIONS {nx} {ny} {nz}",
    ]
    xs = np.arange(nx, dtype=">f4")
    ys = np.arange(ny, dtype=">f4")
    zs = np.arange(nz, dtype=">f4")
    out = bytearray()

    def emit(lines):
        out.extend(("\n".join(lines) + "\n").encode())

    emit(head)
    for label, arr in (("X", xs), ("Y", ys), ("Z", zs)):
        emit([f"{label}_COORDINATES {len(arr)} float"])
        if binary:
            out.extend(arr.tobytes())
            out.extend(b"\n")
        else:
            emit([" ".join(str(float(v)) for v in arr)])
    emit([f"POINT_DATA {n}", f"VECTORS {name} double"])
    data = velocity.astype(">f8")
    if binary:
        out.extend(data.tobytes())
        out.extend(b"\n")
    else:
        emit([" ".join(f"{v:.12g}" for v in data.reshape(-1))])
    return bytes(out)


@pytest.mark.parametrize("binary", [False, True])
def test_legacy_rectilinear(tmp_path, rng, binary):
    vel = rng.standard_normal((12, 3))
    path = tmp_path / "d.vtk"
    path.write_bytes(_legacy_rectilinear(vel, binary))
    mesh = vio.read_legacy_vtk(str(path))
    assert mesh.dimensions == (3, 2, 2)
    np.testing.assert_allclose(mesh.point_data["Velocity"], vel, rtol=1e-10)
    assert mesh.points.shape == (12, 3)


def test_legacy_scalars_and_field(tmp_path, rng):
    scal = rng.standard_normal(12)
    fld = rng.standard_normal((12, 2))
    txt = "\n".join(
        [
            "# vtk DataFile Version 2.0",
            "t",
            "ASCII",
            "DATASET STRUCTURED_POINTS",
            "DIMENSIONS 3 2 2",
            "ORIGIN 0 0 0",
            "SPACING 1 1 1",
            "POINT_DATA 12",
            "SCALARS p float 1",
            "LOOKUP_TABLE default",
            " ".join(f"{v:.7g}" for v in scal),
            "FIELD FieldData 1",
            "uv 2 12 float",
            " ".join(f"{v:.7g}" for v in fld.reshape(-1)),
        ]
    ).encode()
    path = tmp_path / "e.vtk"
    path.write_bytes(txt)
    mesh = vio.read_legacy_vtk(str(path))
    np.testing.assert_allclose(mesh.point_data["p"], scal, rtol=1e-6)
    np.testing.assert_allclose(mesh.point_data["uv"], fld, rtol=1e-6)


def test_snapshot_series_layout(tmp_path, rng):
    """Columns must be C-flattened per-point interleaved components (CYL:69-80)."""
    n_pts, m = 4, 3
    vels = [rng.standard_normal((n_pts, 3)) for _ in range(m)]
    pts = rng.standard_normal((n_pts, 3)).astype(np.float32)
    for i, v in enumerate(vels):
        (tmp_path / f"velocity_{i}.vtu").write_bytes(_vtu_ascii(pts, v))
    X, mesh = vio.read_snapshot_series(str(tmp_path), "velocity_", 0, m)
    assert X.shape == (n_pts * 3, m)
    for t in range(m):
        np.testing.assert_allclose(X[:, t], vels[t].reshape(-1), rtol=1e-7)
    # row layout: u1, v1, w1, u2, ...
    np.testing.assert_allclose(X[0:3, 0], vels[0][0], rtol=1e-7)
    np.testing.assert_allclose(X[3:6, 0], vels[0][1], rtol=1e-7)


def test_legacy_crlf_line_endings(tmp_path, rng):
    """Windows-style CRLF legacy files must parse (exact scanner pushback)."""
    vel = rng.standard_normal((12, 3))
    blob = _legacy_rectilinear(vel, binary=False)
    # convert header/ascii lines to CRLF
    blob_crlf = blob.replace(b"\n", b"\r\n")
    path = tmp_path / "crlf.vtk"
    path.write_bytes(blob_crlf)
    mesh = vio.read_legacy_vtk(str(path))
    np.testing.assert_allclose(mesh.point_data["Velocity"], vel, rtol=1e-10)


def test_write_vtu_roundtrip(tmp_path, rng):
    """write_vtu output must read back with identical geometry and fields."""
    pts = rng.standard_normal((6, 3)).astype(np.float32)
    mesh = vio.Mesh(
        points=pts,
        point_data={},
        cell_data={},
        cells=np.array([0, 1, 2, 1, 2, 3], np.int64),
        cell_offsets=np.array([3, 6], np.int64),
        cell_types=np.array([5, 5], np.uint8),  # triangles
    )
    field = rng.standard_normal(6)
    vec = rng.standard_normal((6, 3))
    path = str(tmp_path / "out.vtu")
    vio.write_vtu(path, mesh, point_data={"mode1": field, "velocity": vec})
    back = vio.read_vtu(path)
    np.testing.assert_allclose(back.points, pts, rtol=1e-6)
    np.testing.assert_allclose(back.point_data["mode1"], field, rtol=1e-7)
    np.testing.assert_allclose(back.point_data["velocity"], vec, rtol=1e-7)
    np.testing.assert_array_equal(back.cells, mesh.cells)
    np.testing.assert_array_equal(back.cell_types, mesh.cell_types)
