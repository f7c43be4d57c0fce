"""NGP radiance field: hash encoding + fused small MLPs + volume render.

TPU-native rebuild of the instant-ngp NeRF the reference drives through
pyngp (/root/reference/fusion/nerf_fusion.py).  Everything is one jitted
train step: ray generation, stratified + depth-guided sampling, hash
encode, density/color MLPs (bf16 on the MXU), volume rendering, RGB-L2 +
1/sigma^2-weighted depth-L2 loss (the reference's
``depth_supervision_lambda`` + ``depth_loss_type=L2``), Adam update.

Sampling strategy (TPU-friendly, static shapes): S_u stratified samples
over [near, far] plus S_d samples from a Gaussian around the supervised
depth when available -- the depth prior replaces instant-ngp's occupancy
marching (which is divergence-heavy and gather-bound on TPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from .hashgrid import (HashGridConfig, encode, encode_chunked,
                       init_table, sh_encode_deg4)


class NGPConfig(NamedTuple):
    # position encoding: "pe" (frequency encoding + wide MLP; pure MXU,
    # the TPU-native default -- hash gathers/scatters run at ~6/90 ns per
    # row on TPU, making instant-ngp's table GPU-shaped) or "hash"
    # (instant-ngp multires hash grid).
    encoding: str = "pe"
    grid: HashGridConfig = HashGridConfig()
    pe_degrees: int = 10            # frequency bands for "pe"
    hidden: int = 64                # density-MLP width for "hash"
    pe_hidden: int = 256            # MLP width for "pe"
    pe_depth: int = 4               # hidden layers for "pe"
    geo_features: int = 15          # density MLP extra outputs
    n_uniform: int = 96             # stratified samples / ray
    n_depth: int = 32               # depth-guided samples / ray
    near: float = 0.05
    far: float = 1.2                # in normalized aabb units (diag ~ 1.7)
    depth_sigma_floor: float = 0.012
    rgb_weight: float = 1.0
    depth_weight: float = 0.5
    lr: float = 1e-2
    pe_lr: float = 5e-4
    density_activation: str = "exp"  # exp (instant-ngp) | softplus
    # hash-encode chunking (points per gather/scatter op; 0 = one op).
    # The tunneled dev chip faults on very large hash table ops
    # (docs/backbone_decision.md); 2^17 bounds each op while keeping
    # the VPU busy
    hash_chunk: int = 131072


def positional_encoding(x: jax.Array, degrees: int) -> jax.Array:
    """NeRF frequency encoding on [0,1]^3 positions -> (..., 6*degrees)."""
    x = 2.0 * x - 1.0
    freqs = (2.0 ** jnp.arange(degrees)) * jnp.pi
    xb = x[..., None, :] * freqs[:, None]           # (..., deg, 3)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    return enc.reshape(x.shape[:-1] + (6 * degrees,))


class PEField(nn.Module):
    """Frequency-encoded MLP radiance field (the MXU-native backbone):
    no table gathers anywhere; with 1/sigma^2 depth supervision it
    converges in a few thousand steps (DS-NeRF regime), which suits
    online SLAM mapping."""
    cfg: NGPConfig

    @nn.compact
    def __call__(self, pos: jax.Array, dirs: jax.Array):
        """pos: (N, 3) in [0,1]^3; dirs: (N, 3) unit.
        Returns (sigma (N,), rgb (N, 3))."""
        cfg = self.cfg
        h = positional_encoding(pos, cfg.pe_degrees).astype(jnp.bfloat16)
        skip = h
        for i in range(cfg.pe_depth):
            h = nn.Dense(cfg.pe_hidden, dtype=jnp.bfloat16,
                         name=f"trunk_{i}")(h)
            h = nn.relu(h)
            if i == cfg.pe_depth // 2 - 1:
                h = jnp.concatenate([h, skip], axis=-1)
        raw = nn.Dense(1 + cfg.geo_features, dtype=jnp.bfloat16,
                       name="density_out")(h)
        raw_sigma = raw[..., 0].astype(jnp.float32)
        if cfg.density_activation == "exp":
            sigma = jnp.exp(jnp.clip(raw_sigma, -15.0, 12.0))
        else:
            sigma = jax.nn.softplus(raw_sigma)
        geo = raw[..., 1:]
        sh = sh_encode_deg4(dirs).astype(jnp.bfloat16)
        c = jnp.concatenate([geo, sh], axis=-1)
        c = nn.relu(nn.Dense(cfg.hidden, dtype=jnp.bfloat16,
                             name="rgb_0")(c))
        c = nn.Dense(3, dtype=jnp.bfloat16, name="rgb_1")(c)
        rgb = jax.nn.sigmoid(c.astype(jnp.float32))
        return sigma, rgb


class NGPField(nn.Module):
    """Density + color MLPs (hash table lives outside as a raw param)."""
    cfg: NGPConfig

    @nn.compact
    def __call__(self, feat: jax.Array, dirs: jax.Array):
        """feat: (N, L*F) hash features; dirs: (N, 3) unit view dirs.
        Returns (sigma (N,), rgb (N, 3))."""
        h = nn.Dense(self.cfg.hidden, dtype=jnp.bfloat16,
                     name="density_0")(feat.astype(jnp.bfloat16))
        h = nn.relu(h)
        h = nn.Dense(1 + self.cfg.geo_features, dtype=jnp.bfloat16,
                     name="density_1")(h)
        raw_sigma = h[..., 0].astype(jnp.float32)
        if self.cfg.density_activation == "exp":
            sigma = jnp.exp(jnp.clip(raw_sigma, -15.0, 12.0))
        else:
            sigma = jax.nn.softplus(raw_sigma)
        geo = h[..., 1:]

        sh = sh_encode_deg4(dirs).astype(jnp.bfloat16)
        c = jnp.concatenate([geo, sh], axis=-1)
        c = nn.relu(nn.Dense(self.cfg.hidden, dtype=jnp.bfloat16,
                             name="rgb_0")(c))
        c = nn.relu(nn.Dense(self.cfg.hidden, dtype=jnp.bfloat16,
                             name="rgb_1")(c))
        c = nn.Dense(3, dtype=jnp.bfloat16, name="rgb_2")(c)
        rgb = jax.nn.sigmoid(c.astype(jnp.float32))
        return sigma, rgb


class NGPParams(NamedTuple):
    table: jax.Array      # (L, T, F)
    mlp: dict             # flax params


@functools.partial(jax.jit, static_argnums=1)
def _init_ngp_params(key: jax.Array, field) -> "NGPParams":
    """All field-parameter init in ONE program (eager flax init costs
    dozens of single-op compiles through a tunneled device)."""
    cfg = field.cfg
    k1, k2 = jax.random.split(key)
    if cfg.encoding == "pe":
        mlp = field.init(k1, jnp.full((8, 3), 0.5),
                         jnp.ones((8, 3)) / np.sqrt(3.0))
        table = jnp.zeros((1, 1, 1), jnp.float32)   # placeholder
    else:
        mlp = field.init(k1, jnp.zeros((8, cfg.grid.out_dim)),
                         jnp.ones((8, 3)) / np.sqrt(3.0))
        table = init_table(k2, cfg.grid)
    return NGPParams(table=table, mlp=mlp)


def init_ngp(key: jax.Array, cfg: NGPConfig):
    field = PEField(cfg) if cfg.encoding == "pe" else NGPField(cfg)
    return _init_ngp_params(key, field), field


def query(params: NGPParams, field, cfg: NGPConfig,
          pos: jax.Array, dirs: jax.Array):
    """pos: (..., 3) in [0,1]^3, dirs: (..., 3) -> (sigma, rgb)."""
    lead = pos.shape[:-1]
    if cfg.encoding == "pe":
        sigma, rgb = field.apply(params.mlp, pos.reshape(-1, 3),
                                 dirs.reshape(-1, 3))
    else:
        feat = encode_chunked(params.table, pos.reshape(-1, 3),
                              cfg.grid, cfg.hash_chunk)
        sigma, rgb = field.apply(params.mlp, feat, dirs.reshape(-1, 3))
    return sigma.reshape(lead), rgb.reshape(lead + (3,))


# ---------------------------------------------------------------------------
# sampling + rendering
# ---------------------------------------------------------------------------

def sample_along_rays(key, origins, dirs, depth_guess, depth_valid,
                      cfg: NGPConfig):
    """Return sorted sample distances t: (R, S) with S = n_uniform +
    n_depth.  depth_guess: (R,) normalized depth along the ray (0 where
    invalid)."""
    R = origins.shape[0]
    Su, Sd = cfg.n_uniform, cfg.n_depth
    k1, k2 = jax.random.split(key)

    # stratified uniform
    edges = jnp.linspace(cfg.near, cfg.far, Su + 1)
    lo = edges[:-1][None, :]
    hi = edges[1:][None, :]
    tu = lo + (hi - lo) * jax.random.uniform(k1, (R, Su))

    # depth-guided gaussian (fall back to uniform when no depth)
    sigma = jnp.maximum(cfg.depth_sigma_floor,
                        0.05 * jnp.abs(depth_guess))[:, None]
    td = depth_guess[:, None] + sigma * jax.random.normal(k2, (R, Sd))
    td_fallback = cfg.near + (cfg.far - cfg.near) * jax.random.uniform(
        k2, (R, Sd))
    td = jnp.where(depth_valid[:, None] > 0, td, td_fallback)
    td = jnp.clip(td, cfg.near, cfg.far)

    t = jnp.sort(jnp.concatenate([tu, td], axis=-1), axis=-1)
    return t


def occupancy_grid(params: NGPParams, field, cfg: NGPConfig,
                   res: int) -> jax.Array:
    """Dense sigma grid over the unit cube: (res, res, res) float32.

    The TPU replacement for instant-ngp's bitfield occupancy march
    (reference render path, /root/reference/fusion/nerf_fusion.py:94-95):
    rather than marching a sparse bitfield (divergent, gather-bound),
    we query the field once on a dense grid -- res=64 is 262k MLP
    evaluations, a fraction of ONE training step -- and use it to bound
    per-ray sample intervals (see ray_occ_interval)."""
    g = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    pos = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    dirs = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]), pos.shape)      # sigma ignores dirs
    sigma, _ = query(params, field, cfg, pos, dirs)
    return sigma.reshape(res, res, res)


def ray_occ_interval(occ_mask: jax.Array, origins: jax.Array,
                     dirs: jax.Array, cfg: NGPConfig,
                     n_coarse: int = 64):
    """Per-ray [t_lo, t_hi] bounds of the occupied region.

    Probes the boolean occupancy mask at ``n_coarse`` points along
    [near, far] (pure gathers -- no MLP) and returns the first/last
    occupied probe distance, padded by one probe spacing.  Rays that hit
    nothing keep the full interval (they saturate to background either
    way).  Static shapes throughout; empty-space skipping happens by
    CONCENTRATING the fine samples, not by dropping rays."""
    res = occ_mask.shape[0]
    tc = jnp.linspace(cfg.near, cfg.far, n_coarse)
    pos = origins[:, None, :] + tc[None, :, None] * dirs[:, None, :]
    inside = jnp.all((pos >= 0.0) & (pos < 1.0), axis=-1)
    idx = jnp.clip((pos * res).astype(jnp.int32), 0, res - 1)
    hit = occ_mask[idx[..., 2], idx[..., 1], idx[..., 0]] & inside
    any_hit = hit.any(axis=-1)
    first = jnp.argmax(hit, axis=-1)
    last = (n_coarse - 1) - jnp.argmax(hit[:, ::-1], axis=-1)
    pad = (cfg.far - cfg.near) / n_coarse
    t_lo = jnp.where(any_hit, tc[first] - pad, cfg.near)
    t_hi = jnp.where(any_hit, tc[last] + pad, cfg.far)
    return (jnp.clip(t_lo, cfg.near, cfg.far),
            jnp.clip(t_hi, cfg.near, cfg.far), any_hit)


def sample_in_interval(key, t_lo: jax.Array, t_hi: jax.Array, n: int):
    """Stratified samples inside per-ray [t_lo, t_hi]: (R, n), sorted."""
    R = t_lo.shape[0]
    edges = jnp.linspace(0.0, 1.0, n + 1)
    lo = edges[:-1][None, :]
    span = (edges[1:] - edges[:-1])[None, :]
    u = lo + span * jax.random.uniform(key, (R, n))
    return t_lo[:, None] + (t_hi - t_lo)[:, None] * u


def render_rays(params: NGPParams, field: NGPField, cfg: NGPConfig,
                origins, dirs, t):
    """Volume rendering.  origins/dirs: (R, 3) in normalized scene units
    (dirs NOT necessarily unit: t is in units of ||dirs||).
    Returns (rgb (R,3), depth (R,), acc (R,), weights (R,S))."""
    R, S = t.shape
    pos = origins[:, None, :] + t[..., None] * dirs[:, None, :]
    view = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    view_b = jnp.broadcast_to(view[:, None, :], pos.shape)

    sigma, rgb = query(params, field, cfg, pos, view_b)

    # out-of-box samples contribute nothing
    inside = jnp.all((pos >= 0.0) & (pos <= 1.0), axis=-1)
    sigma = jnp.where(inside, sigma, 0.0)

    dt = jnp.diff(t, axis=-1, append=t[..., -1:] + (cfg.far - cfg.near) / S)
    dnorm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dt * dnorm)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                             trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb_out = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_out = jnp.sum(weights * t, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    return rgb_out, depth_out, acc, weights
