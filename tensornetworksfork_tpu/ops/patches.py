"""Image patch extraction for the convolutional TT models.

The reference preprocesses images with
`F.unfold(x, kernel_size, stride).transpose(-2, -1)` then appends a zero patch
row and a zero pixel column with a 1 in the corner as the bias patch
(`/root/reference/AAMNST.py:135-141`). `extract_patches` reproduces the unfold
(+transpose) layout: (B, num_patches, C*kh*kw) with the channel index slowest
— identical element order to torch unfold. `add_bias_patch` appends the bias
row/column.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax


def extract_patches(x: jax.Array, kernel_size, stride=None, padding: int = 0
                    ) -> jax.Array:
    """x: (B, C, H, W) -> (B, L, C*kh*kw), L = number of sliding windows.

    Matches torch.nn.functional.unfold(...).transpose(-2, -1) elementwise.
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if stride is None:
        stride = kernel_size
    if isinstance(stride, int):
        stride = (stride, stride)
    if x.ndim == 3:
        x = x[:, None]
    B, C, H, W = x.shape
    if padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=kernel_size, window_strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (B, C*kh*kw, H', W') with feature order (C, kh, kw) slow->fast
    Bp, F, Hp, Wp = patches.shape
    return patches.reshape(B, F, Hp * Wp).transpose(0, 2, 1)


def add_bias_patch(x: jax.Array) -> jax.Array:
    """Append a zero patch row and zero pixel column; set the corner to 1
    (the bias patch idiom, AAMNST.py:137-139). (B, L, P) -> (B, L+1, P+1)."""
    B, L, P = x.shape
    x = jnp.concatenate([x, jnp.zeros((B, 1, P), x.dtype)], axis=1)
    x = jnp.concatenate([x, jnp.zeros((B, L + 1, 1), x.dtype)], axis=2)
    return x.at[:, -1, -1].set(1.0)


def image_to_conv_input(x: jax.Array, kernel_size: int, stride: int,
                        padding: int = 0) -> jax.Array:
    """Full reference preprocessing: unfold + bias patch."""
    return add_bias_patch(extract_patches(x, kernel_size, stride, padding))
