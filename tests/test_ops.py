"""ops-tier tests: patch extraction vs torch unfold, bias patch, TT data
compression round trips (SVD split-then-contract oracle, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp

from tensornetworksfork_tpu.ops.patches import add_bias_patch, extract_patches
from tensornetworksfork_tpu.ops import compression as dc


def test_extract_patches_matches_unfold():
    torch = None
    try:
        import torch
        import torch.nn.functional as F
    except Exception:
        pass
    x = np.random.default_rng(0).standard_normal((2, 1, 28, 28)).astype(np.float32)
    ours = np.asarray(extract_patches(jnp.asarray(x), 4, 4))
    assert ours.shape == (2, 49, 16)
    if torch is not None:
        ref = F.unfold(torch.tensor(x), kernel_size=(4, 4),
                       stride=(4, 4)).transpose(-2, -1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # multi-channel ordering
    x3 = np.random.default_rng(1).standard_normal((2, 3, 8, 8)).astype(np.float32)
    ours3 = np.asarray(extract_patches(jnp.asarray(x3), 2, 2))
    assert ours3.shape == (2, 16, 12)
    if torch is not None:
        ref3 = F.unfold(torch.tensor(x3), kernel_size=(2, 2),
                        stride=(2, 2)).transpose(-2, -1).numpy()
        np.testing.assert_allclose(ours3, ref3, rtol=1e-5, atol=1e-5)


def test_add_bias_patch():
    x = np.ones((2, 4, 5), np.float32)
    out = np.asarray(add_bias_patch(jnp.asarray(x)))
    assert out.shape == (2, 5, 6)
    assert (out[:, -1, -1] == 1).all()
    assert (out[:, -1, :-1] == 0).all()
    assert (out[:, :-1, -1] == 0).all()


def test_compress_roundtrip():
    """SVD split then contract reproduces the pair within truncation error."""
    rng = np.random.default_rng(2)
    bl = jnp.asarray(rng.standard_normal((1, 3, 1, 8)), jnp.float32)
    br = jnp.asarray(rng.standard_normal((8, 3, 1, 2)), jnp.float32)
    u, v, err = dc.compress(bl, br, rank=8)
    orig = np.einsum("abcd,defg->abcefg", np.asarray(bl), np.asarray(br))
    rec = np.einsum("abcd,defg->abcefg", np.asarray(u), np.asarray(v))
    np.testing.assert_allclose(rec, orig, rtol=1e-3, atol=1e-3)


def test_data_compression_design_tensor():
    """The compressed data TT must reproduce the degree-2 design tensor:
    contracting blocks gives (p1, p2, B) with entries x[b,p1]*x[b,p2]."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((10, 3)).astype(np.float32)
    comp = dc.DataCompression(X)
    blocks = comp.non_compressed(degree=2)
    assert len(blocks) == 2
    full = np.einsum("apcb,bqdr->pqr", np.asarray(blocks[0]),
                     np.asarray(blocks[1]))
    expected = np.einsum("bp,bq->pqb", X, X)
    np.testing.assert_allclose(full, expected, rtol=1e-4, atol=1e-4)
    # compressed version approximates it with full rank
    blocks_c, errs = dc.train_compress(list(blocks), rank=30)
    full_c = np.einsum("apcb,bqdr->pqr", np.asarray(blocks_c[0]),
                       np.asarray(blocks_c[1]))
    np.testing.assert_allclose(full_c, expected, rtol=1e-2, atol=1e-2)


def test_sequential_compress_runs():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((32, 3)).astype(np.float32)
    comp = dc.DataCompression(X)
    blocks = comp.sequential_compress(batch_size=8, degree=3, rank=10)
    assert len(blocks) == 3
    # last bond is the sample axis
    assert blocks[-1].shape[-1] == 32


def test_concat_direct_sum():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((2, 3, 1, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 3, 1, 5)), jnp.float32)
    out = dc.concat(a, b)
    assert out.shape == (5, 3, 1, 9)
    np.testing.assert_allclose(np.asarray(out[:2, ..., :4]), np.asarray(a))
    np.testing.assert_allclose(np.asarray(out[2:, ..., 4:]), np.asarray(b))
