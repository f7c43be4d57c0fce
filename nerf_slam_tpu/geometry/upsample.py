"""Convex-combination 8x upsampling of dense fields (pure JAX).

Equivalent of the reference ``cvx_upsample`` (utils/flow_viz.py:166-183 and
networks/droid_net.py:21-35): each fine pixel is a softmax-weighted convex
combination of the 3x3 coarse neighborhood, with out-of-image neighbors
masked to -inf and an optional ``pow`` applied to the weights (used for
covariance upsampling, pow keeps weights sub-convex).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_patches(data: jax.Array) -> jax.Array:
    """(B, H, W, D) -> (B, 9, H, W, D): 3x3 neighborhoods, zero-padded."""
    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = data.shape[1:3]
    shifts = []
    for dy in range(3):
        for dx in range(3):
            shifts.append(padded[:, dy:dy + H, dx:dx + W, :])
    return jnp.stack(shifts, axis=1)


def cvx_upsample(data: jax.Array, mask: jax.Array,
                 pow: float = 1.0) -> jax.Array:
    """Upsample (B, H, W, D) -> (B, 8H, 8W, D) by convex combination.

    mask: (B, 9*8*8, H, W) raw logits from the network's upmask head.
    """
    B, H, W, D = data.shape
    logits = mask.reshape(B, 9, 8, 8, H, W)

    # Exclude out-of-image neighbors: top row of the 3x3 window for image
    # row 0, bottom row for the last image row; same for columns.
    neg = jnp.finfo(logits.dtype).min
    nbr = jnp.arange(9)
    top = (nbr < 3)[None, :, None, None, None, None]
    bottom = (nbr >= 6)[None, :, None, None, None, None]
    left = (nbr % 3 == 0)[None, :, None, None, None, None]
    right = (nbr % 3 == 2)[None, :, None, None, None, None]
    row = jnp.arange(H)[None, None, None, None, :, None]
    col = jnp.arange(W)[None, None, None, None, None, :]
    invalid = (top & (row == 0)) | (bottom & (row == H - 1)) | \
              (left & (col == 0)) | (right & (col == W - 1))
    logits = jnp.where(invalid, neg, logits)

    weights = jax.nn.softmax(logits, axis=1)
    if pow != 1.0:
        weights = weights ** pow

    patches = _gather_patches(data)  # (B, 9, H, W, D)
    # (B,9,8,8,H,W) x (B,9,H,W,D) -> (B,8,8,H,W,D)
    up = jnp.einsum("bnuvhw,bnhwd->buvhwd", weights, patches)
    # interleave: output pixel (8y+u, 8x+v)
    up = jnp.transpose(up, (0, 3, 1, 4, 2, 5))  # (B,H,8,W,8,D)
    return up.reshape(B, 8 * H, 8 * W, D)


def upsample_disp(disp: jax.Array, mask: jax.Array,
                  pow: float = 1.0) -> jax.Array:
    """(B, H, W) disparity + (B, 576, H, W) mask -> (B, 8H, 8W)."""
    return cvx_upsample(disp[..., None], mask, pow=pow)[..., 0]
