"""Multiresolution hash-grid encoding (pure JAX, TPU-first).

Re-design of instant-ngp's hash encoding (the reference consumes it via
the pyngp binding, /root/reference/fusion/nerf_fusion.py:58-118) for XLA:
the per-level corner gathers vectorize into one `take` per level, and the
backward pass is XLA's scatter-add -- no hand-written CUDA.  Defaults
follow instant-ngp's base.json: 16 levels x 2 features, 2^19 table,
base resolution 16, finest ~2048.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# spatial hash primes (instant-ngp convention)
_PRIMES = (1, 2654435761, 805459861)


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def resolutions(self) -> np.ndarray:
        if self.n_levels == 1:
            return np.array([self.base_resolution])
        b = np.exp((np.log(self.finest_resolution)
                    - np.log(self.base_resolution)) / (self.n_levels - 1))
        return np.floor(self.base_resolution
                        * b ** np.arange(self.n_levels)).astype(np.int64)


def init_table(key: jax.Array, cfg: HashGridConfig,
               dtype=jnp.float32) -> jax.Array:
    """(L, T, F) feature table, U(-1e-4, 1e-4) as in instant-ngp."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4, maxval=1e-4, dtype=dtype)


def encode(table: jax.Array, pos: jax.Array,
           cfg: HashGridConfig) -> jax.Array:
    """pos: (..., 3) in [0, 1]^3 -> (..., L*F) features.

    Vectorized over levels: one gather per trilinear corner (8 total)
    regardless of level count, which keeps the XLA graph small and the
    gathers wide.  Out-of-box positions are clamped (the caller masks).
    """
    lead = pos.shape[:-1]
    p = jnp.clip(pos.reshape(-1, 3), 0.0, 1.0)
    N = p.shape[0]
    L, T, F = table.shape

    res = jnp.asarray(cfg.resolutions(), dtype=p.dtype)      # (L,)
    res_i = jnp.asarray(cfg.resolutions(), dtype=jnp.int32)
    # which levels fit densely (static boolean per level)
    dense = jnp.asarray(
        ((cfg.resolutions() + 1) ** 3 <= cfg.table_size)
        .astype(np.uint32))                                   # (L,)

    x = p[None, :, :] * res[:, None, None]                    # (L,N,3)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                  res_i[:, None, None] - 1)
    w = x - x0.astype(x.dtype)                                # (L,N,3)

    res1 = (res_i + 1).astype(jnp.uint32)[:, None]            # (L,1)
    acc = jnp.zeros((L, N, F), dtype=table.dtype)
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        cx = (x0[..., 0] + dx).astype(jnp.uint32)             # (L,N)
        cy = (x0[..., 1] + dy).astype(jnp.uint32)
        cz = (x0[..., 2] + dz).astype(jnp.uint32)
        dense_idx = (cx * res1 + cy) * res1 + cz
        hash_idx = ((cx * jnp.uint32(_PRIMES[0]))
                    ^ (cy * jnp.uint32(_PRIMES[1]))
                    ^ (cz * jnp.uint32(_PRIMES[2]))) \
            & jnp.uint32(cfg.table_size - 1)
        idx = jnp.where(dense[:, None] > 0, dense_idx, hash_idx)
        idx = idx.astype(jnp.int32)
        cw = (jnp.where(dx, w[..., 0], 1 - w[..., 0])
              * jnp.where(dy, w[..., 1], 1 - w[..., 1])
              * jnp.where(dz, w[..., 2], 1 - w[..., 2]))      # (L,N)
        vals = jnp.take_along_axis(table, idx[..., None], axis=1)
        acc = acc + cw[..., None] * vals

    out = jnp.transpose(acc, (1, 0, 2)).reshape(N, L * F)
    return out.reshape(lead + (cfg.out_dim,))


def sh_encode_deg4(dirs: jax.Array) -> jax.Array:
    """Real spherical harmonics up to degree 4 (16 components), matching
    instant-ngp's SH view-direction encoding.  dirs: (..., 3) unit."""
    x, y, z = jnp.moveaxis(dirs, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = jnp.stack([
        0.28209479177387814 * jnp.ones_like(x),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ], axis=-1)
    return out
