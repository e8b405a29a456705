"""TT compression of polynomial design tensors.

Rebuilds `/root/reference/tensor/data_compression.py`: the degree-d feature
tensor of a dataset is held as a tensor train whose last bond is the sample
axis, so design matrices for high-degree polynomial models never materialise.

Blocks have shape (k_left, p, d, k_right): left bond, physical feature, a
dummy/diag axis, right bond; the first block is x^T reshaped (1, p, 1, B) and
middle blocks are diag-embedded copies (compression.py:105-117). `compress`
SVD-truncates adjacent pairs; `concat` direct-sums along bonds; the
DataCompression driver offers sequential (stream + recompress), parallel
(binary-tree merge) and feature-split variants.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def compress(block_left: jax.Array, block_right: jax.Array, rank: int = 5,
             cut_off: Optional[float] = None) -> Tuple[jax.Array, jax.Array, float]:
    """SVD-split the pair contraction back into two blocks with rank/cut_off
    truncation (reference compress, data_compression.py:5-28)."""
    sl, sr = block_left.shape, block_right.shape
    contract = jnp.einsum("abcd,defg->abcefg", block_left, block_right,
                          precision=jax.lax.Precision.HIGHEST)
    matrix = contract.reshape(int(np.prod(sl[:3])), -1)
    rank = min(rank, min(matrix.shape))
    u, s, v = jnp.linalg.svd(matrix, full_matrices=False)
    s_cumsum = jnp.cumsum(jnp.flip(s))
    if cut_off is not None:
        k = int(jnp.sum(s_cumsum / jnp.sum(s) > cut_off))
        rank = max(min(rank, k), 1)
    split_err = float(s_cumsum[-rank] / jnp.sum(s))
    u = u[..., :rank]
    v = (jnp.diag(s[:rank]) @ v[:rank])
    u = u.reshape(sl[:-1] + (rank,))
    v = v.reshape((rank,) + sr[1:])
    return u, v, split_err


def train_compress(blocks: List[jax.Array], rank: int = 5,
                   cut_off: Optional[float] = None):
    """Left-to-right pairwise compression pass (data_compression.py:30-38)."""
    errors = []
    blocks = list(blocks)
    for i in range(len(blocks) - 1):
        u, v, err = compress(blocks[i], blocks[i + 1], rank=rank, cut_off=cut_off)
        blocks[i], blocks[i + 1] = u, v
        errors.append(err)
    return blocks, errors


def concat(block1: jax.Array, block2: jax.Array) -> jax.Array:
    """Block-diagonal direct sum along both bonds (data_compression.py:84-96)."""
    rl = (max(block1.shape[0], block2.shape[0])
          if 1 in (block1.shape[0], block2.shape[0])
          else block1.shape[0] + block2.shape[0])
    rr = (max(block1.shape[3], block2.shape[3])
          if 1 in (block1.shape[3], block2.shape[3])
          else block1.shape[3] + block2.shape[3])
    out = jnp.zeros((rl, block1.shape[1], block1.shape[2], rr), block1.dtype)
    out = out.at[: block1.shape[0], ..., : block1.shape[3]].set(block1)
    out = out.at[rl - block2.shape[0]:, ..., rr - block2.shape[3]:].set(block2)
    return out


def train_concat(blocks1: List[jax.Array], blocks2: List[jax.Array]):
    if len(blocks1) != len(blocks2):
        raise ValueError("blocks1 and blocks2 must have the same length")
    return [concat(b1, b2) for b1, b2 in zip(blocks1, blocks2)]


def block_left_feature_compress(block: jax.Array, rank: int = 5,
                                cut_off: Optional[float] = None):
    """Split the two leading axes off a block by SVD
    (data_compression.py:49-72)."""
    sb = block.shape
    matrix = block.reshape(sb[0] * sb[1], -1)
    rank = min(rank, min(matrix.shape))
    u, s, v = jnp.linalg.svd(matrix, full_matrices=False)
    s_cumsum = jnp.cumsum(jnp.flip(s))
    if cut_off is not None:
        k = int(jnp.sum(s_cumsum / jnp.sum(s) > cut_off))
        rank = max(min(rank, k), 1)
    split_err = float(s_cumsum[-rank] / jnp.sum(s))
    u = u[..., :rank].reshape(sb[0], sb[1], sb[-2], rank)
    v = (jnp.diag(s[:rank]) @ v[:rank]).reshape((rank,) + sb[2:])
    return u, v, split_err


def feature_split(block: jax.Array, feature_shape, rank: int = 5,
                  cut_off: Optional[float] = None):
    """Split one physical axis into factor axes (data_compression.py:74-82)."""
    block = block.reshape((block.shape[0],) + tuple(feature_shape)
                          + block.shape[-2:])
    split_blocks, errors = [], []
    for _ in range(len(feature_shape) - 1):
        u, block, err = block_left_feature_compress(block, rank=rank,
                                                    cut_off=cut_off)
        split_blocks.append(u)
        errors.append(err)
    return split_blocks + [block], float(np.mean(errors)) if errors else 0.0


def _raw_blocks(batch: jax.Array, degree: int) -> List[jax.Array]:
    """Uncompressed data-tensor blocks for one batch
    (data_compression.py:105-117): first block x^T (1, p, 1, B); middle blocks
    diag-embedded x^T (p, p, 1, B) carrying the same sample on both bonds."""
    xt = batch.T  # (p, B)
    left = xt.reshape(1, xt.shape[0], 1, xt.shape[1])
    if degree == 1:
        return [left]
    # middle blocks: D[b, p, 1, b'] = x[b, p] * delta(b, b')
    B = batch.shape[0]
    eye = jnp.eye(B, dtype=batch.dtype)
    mid = jnp.einsum("bp,bc->bpc", batch, eye)[:, :, None, :]
    return [left] + [mid] * (degree - 1)


class DataCompression:
    """Driver (reference data_compression.py:98-210)."""

    def __init__(self, X, full_svd: bool = True):
        self.X = jnp.asarray(X)
        self.blocks = None

    def non_compressed(self, degree: int, batch_index=None, batch_size=None):
        if batch_index is None or batch_size is None:
            batch_index, batch_size = 0, self.X.shape[0]
        batch = self.X[batch_index * batch_size:(batch_index + 1) * batch_size]
        self.blocks = _raw_blocks(batch, degree)
        return self.blocks

    def sequential_compress(self, batch_size: int, degree: int, rank: int = 5,
                            cut_off: Optional[float] = None):
        """Stream batches: concat previous TT with the new batch's raw blocks,
        recompress (data_compression.py:119-140)."""
        previous = []
        nb = (self.X.shape[0] + batch_size - 1) // batch_size
        for i in range(nb):
            batch = self.X[i * batch_size:(i + 1) * batch_size]
            raw = _raw_blocks(batch, degree)
            blocks = train_concat(previous, raw) if previous else raw
            previous, _ = train_compress(blocks, rank=rank, cut_off=cut_off)
        self.blocks = previous
        return self.blocks

    def parallel_compress(self, batch_size: int, degree: int,
                          iterations: Optional[int] = None, cut_size: int = 2,
                          rank: int = 5, cut_off: Optional[float] = None,
                          rank_factor: float = 1.5):
        """Compress per batch, then binary-tree merge with rank
        over-provisioning (data_compression.py:142-184)."""
        nb = (self.X.shape[0] + batch_size - 1) // batch_size
        blocks = []
        for i in range(nb):
            batch = self.X[i * batch_size:(i + 1) * batch_size]
            blk, _ = train_compress(_raw_blocks(batch, degree),
                                    rank=int(rank_factor * rank / cut_size),
                                    cut_off=cut_off)
            blocks.append(blk)
        if iterations is None:
            iterations = 1 + int(np.log(max(len(blocks), 1))
                                 / np.log(cut_size)) if len(blocks) > 1 else 0
        for it in range(iterations):
            new_blocks = []
            _rank = rank if it == iterations - 1 else int(rank_factor * rank / cut_size)
            for i in range(0, len(blocks), cut_size):
                merged = blocks[i]
                for b in blocks[i + 1:i + cut_size]:
                    merged = train_concat(merged, b)
                merged, _ = train_compress(merged, rank=_rank, cut_off=cut_off)
                new_blocks.append(merged)
            blocks = new_blocks
        if len(blocks) > 1:
            merged = blocks[0]
            for b in blocks[1:]:
                merged = train_concat(merged, b)
            blocks = [train_compress(merged, rank=rank, cut_off=cut_off)[0]]
        self.blocks = blocks[0] if blocks else []
        return self.blocks

    def feature_compress(self, batch_size: int, degree: int, feature_dim,
                         rank: int = 5, cut_off: Optional[float] = None):
        """Sequential compression with per-block feature splitting
        (data_compression.py:186-210)."""
        previous = []
        nb = (self.X.shape[0] + batch_size - 1) // batch_size
        for i in range(nb):
            batch = self.X[i * batch_size:(i + 1) * batch_size]
            raw = _raw_blocks(batch, degree)
            new_blocks = []
            for blk in raw:
                split, _ = feature_split(blk, feature_dim, rank=rank,
                                         cut_off=cut_off)
                new_blocks.extend(split)
            blocks = train_concat(previous, new_blocks) if previous else new_blocks
            previous, _ = train_compress(blocks, rank=rank, cut_off=cut_off)
        self.blocks = previous
        return self.blocks
