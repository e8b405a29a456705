"""Native IO runtime tests: idx parser vs Python reference, CSV parser."""
import gzip
import struct

import numpy as np
import pytest

from tensornetworksfork_tpu import native


def _write_idx(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_native_idx_roundtrip(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    arr = np.random.default_rng(0).integers(0, 255, (7, 5, 4), np.uint8)
    p = str(tmp_path / "test.idx")
    _write_idx(p, arr)
    out = native.read_idx(p)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def test_native_csv(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1.5,2,3\n-4,5.25,6\n")
    res = native.parse_csv(p, skip_header=True)
    assert res is not None
    mat, ncols = res
    assert ncols == 3
    np.testing.assert_allclose(mat, [[1.5, 2, 3], [-4, 5.25, 6]])


def test_native_csv_empty_cells_keep_position(tmp_path):
    """Consecutive commas are empty cells (0.0), not collapsed — dropping
    them would shift every later value left in the row-major buffer."""
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "e.csv")
    with open(p, "w") as f:
        f.write("1,,3\n,5,\n7,abc,9\n")
    mat, ncols = native.parse_csv(p, skip_header=False)
    assert ncols == 3
    np.testing.assert_allclose(mat, [[1, 0, 3], [0, 5, 0], [7, 0, 9]])


def test_native_csv_whitespace_cells(tmp_path):
    """A whitespace-only cell must not let the parser read across the line
    break (strtof skips newlines as whitespace) — rows stay separate."""
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "w.csv")
    with open(p, "w") as f:
        f.write("1,2, \n3,4,\n 5 ,6, 7 \n")
    mat, ncols = native.parse_csv(p, skip_header=False)
    assert ncols == 3
    np.testing.assert_allclose(mat, [[1, 2, 0], [3, 4, 0], [5, 6, 7]])


def test_native_csv_trailing_whitespace_line(tmp_path):
    """A whitespace-only (or blank) trailing line is ignored like a blank
    line — it must not parse as a 1-cell row and fail the file as jagged."""
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "tw.csv")
    with open(p, "w") as f:
        f.write("1,2\n3,4\n   \n")
    mat, ncols = native.parse_csv(p, skip_header=False)
    assert ncols == 2
    np.testing.assert_allclose(mat, [[1, 2], [3, 4]])
    # interior whitespace-only lines are skipped the same way
    with open(p, "w") as f:
        f.write("1,2\n\t \n3,4\n")
    mat, ncols = native.parse_csv(p, skip_header=False)
    np.testing.assert_allclose(mat, [[1, 2], [3, 4]])


def test_native_csv_jagged_rows_error(tmp_path):
    """A row whose column count differs from the first row must be an
    error, not silently scrambled data."""
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "j.csv")
    with open(p, "w") as f:
        f.write("1,2,3\n4,5\n")
    assert native.parse_csv(p, skip_header=False) is None


def test_native_idx_bad_magic(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    p = str(tmp_path / "bad.idx")
    with open(p, "wb") as f:
        f.write(b"\x12\x34\x08\x01" + struct.pack(">I", 3) + b"\x01\x02\x03")
    assert native.read_idx(p) is None
