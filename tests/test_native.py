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
