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


def test_minibatch_stream_mem_and_file(tmp_path):
    """Native prefetcher (tnf_stream.cpp): every epoch is a full seeded
    permutation, gathers match fancy indexing, file-backed .npy streams via
    mmap, and same-seed streams are bit-identical."""
    from tensornetworksfork_tpu.utils.data_stream import MinibatchStream

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "tnf_stream_open_mem"):
        pytest.skip("no C++ toolchain")
    X = np.arange(23 * 4, dtype=np.float32).reshape(23, 4)
    with MinibatchStream(X, batch_size=5, seed=7) as s:
        assert s.is_native and s.batches_per_epoch == 5
        seen = []
        for xb, idx in s.epoch():
            np.testing.assert_array_equal(xb, X[idx])
            seen.extend(idx.tolist())
        assert sorted(seen) == list(range(23))
        seen2 = [i for _, idx in s.epoch() for i in idx.tolist()]
        assert sorted(seen2) == list(range(23)) and seen2 != seen

    with MinibatchStream(X, 5, seed=7) as a, \
            MinibatchStream(X, 5, seed=7) as b:
        assert ([i.tolist() for _, i in a.epoch()]
                == [i.tolist() for _, i in b.epoch()])

    p = str(tmp_path / "big.npy")
    Y = np.random.default_rng(0).standard_normal((257, 6)).astype(np.float32)
    np.save(p, Y)
    with MinibatchStream(p, batch_size=64, seed=1) as fs:
        assert fs.is_native
        tot = 0
        for xb, idx in fs.epoch():
            np.testing.assert_array_equal(xb, Y[idx])
            tot += len(idx)
        assert tot == 257  # partial tail batch kept


def test_minibatch_stream_numpy_fallback(monkeypatch):
    """Without the native lib the stream keeps the same protocol via numpy
    gathers (permutations differ — mt19937_64 vs numpy Generator)."""
    from tensornetworksfork_tpu.utils import data_stream

    monkeypatch.setattr(data_stream, "get_lib", lambda: None)
    X = np.arange(11 * 3, dtype=np.float32).reshape(11, 3)
    s = data_stream.MinibatchStream(X, batch_size=4, seed=0)
    assert not s.is_native
    seen = []
    for xb, idx in s.epoch():
        np.testing.assert_array_equal(xb, X[idx])
        seen.extend(idx.tolist())
    assert sorted(seen) == list(range(11))


def test_batch_regressor_native_stream():
    """TensorTrainBatchRegressor(stream='native') trains through the
    prefetcher to the same quality as the default gather path."""
    from tensornetworksfork_tpu.models.module import TensorTrainBatchRegressor

    rng = np.random.default_rng(5)
    X = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
    y = (X[:, :1] * X[:, 1:2] + 0.3 * X[:, 2:]).astype(np.float32)
    kw = dict(N=2, r=4, num_swipes=3, batch_size=64, eps_start=0.5,
              swipe_method="batch_same", seed=0, verbose=0)
    m = TensorTrainBatchRegressor(stream="native", **kw)
    m.fit(X, y, split_train=False)
    m0 = TensorTrainBatchRegressor(**kw)
    m0.fit(X, y, split_train=False)
    assert m.score(X, y) > 0.9 and m0.score(X, y) > 0.9
