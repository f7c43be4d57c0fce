"""Pallas TPU kernel for the windowed correlation-volume lookup.

Alternative to the XLA one-hot formulation in ``ops/corr.py``; equivalent
of the reference CUDA sampler ``corr_index_forward``
(/root/reference/src/correlation_kernels.cu:19-70), with identical
semantics: bilinear samples of a (2r+1)^2 window around per-pixel flow
coords; out-of-bounds taps contribute zero; output channels x-offset
major.

Kernel shape: grid = (E, H1) -- one program per (edge, source row).
The program's volume slab V[e, y, :, :, :] lives in VMEM; both the y
and x window selections are per-pixel one-hot contractions on the MXU
-- no gathers, no dynamic slices, and taps outside the volume select
nothing (exact zeros), so no padding or masking is needed anywhere.
All kernel tensors keep source pixels on sublanes (dim 0) and the
contraction axis on lanes, the Mosaic-friendly layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RD = 7          # window size (2r+1), r=3
_NSUP = 8        # support taps per axis (2r+2)


def pad_level(volume: jax.Array) -> jax.Array:
    """(E, H1, W1, H2, W2) -> bf16 volume for the kernel (no padding
    needed: out-of-bounds taps self-mask through the one-hot selects)."""
    return volume.astype(jnp.bfloat16)


def _bcast(v2d, shape):
    """(W1, 1) -> shape, broadcasting along trailing dims."""
    return jax.lax.broadcast_in_dim(v2d, shape, (0, 1))


def _lookup_kernel(yi_ref, xi_ref, dx_ref, dy_ref, vol_ref, out_ref):
    """One (edge, R-source-rows) program; P = R * W1 pixels.

    yi_ref:  (1, R, W1, 1) int32 VMEM  -- y window start (may be OOB)
    xi_ref:  (1, R, W1, 1) int32 VMEM  -- x window start (may be OOB)
    dx_ref:  (1, R, W1, 1) f32 VMEM
    dy_ref:  (1, R, W1, 1) f32 VMEM
    vol_ref: (1, R, W1, H2, W2) bf16 VMEM
    out_ref: (1, R, W1, NSUP, NSUP) f32 VMEM (only [:7, :7] is live;
             Mosaic cannot collapse (7, 7) lanes to 49, so the caller
             slices and reshapes)
    """
    _, R, W1, H2, W2 = vol_ref.shape
    P = R * W1

    # y one-hot: OHY[p, b, Y] = (Y == yi[p] + b)
    yi = yi_ref[0].reshape(P, 1)
    Yids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 2)
    bids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 1)
    OHY = (Yids == _bcast(yi, (P, _NSUP, H2)) + bids
           ).astype(jnp.bfloat16)

    # rows[p, b, X] = sum_Y OHY[p, b, Y] * vol[p, Y, X]
    rows = jax.lax.dot_general(
        OHY, vol_ref[0].reshape(P, H2, W2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # x one-hot with the tap axis leading: OHX[p, a, X] = (X == xi[p] + a)
    xi = xi_ref[0].reshape(P, 1)
    Xids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 2)
    aids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 1)
    OHX = (Xids == _bcast(xi, (P, _NSUP, W2)) + aids
           ).astype(jnp.bfloat16)

    # S[p, a, b] = sum_X OHX[p, a, X] * rows[p, b, X]
    S = jax.lax.dot_general(
        OHX, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (P, 8a, 8b)

    dx = dx_ref[0].reshape(P, 1)
    dy = dy_ref[0].reshape(P, 1)
    sq = (P, _RD, _RD)
    w00 = _bcast((1 - dx) * (1 - dy), sq)
    w10 = _bcast(dx * (1 - dy), sq)
    w01 = _bcast((1 - dx) * dy, sq)
    w11 = _bcast(dx * dy, sq)
    # S is [a, b]-ordered: dx shifts a (x taps), dy shifts b (y taps)
    out = (w00 * S[:, :_RD, :_RD] + w10 * S[:, 1:, :_RD]
           + w01 * S[:, :_RD, 1:] + w11 * S[:, 1:, 1:])    # (P, a, b)

    out_ref[0, :, :, : _RD, : _RD] = out.reshape(R, W1, _RD, _RD)


def _auto_interpret(interpret: bool) -> bool:
    """Pallas TPU kernels run interpreted on the CPU backend (tests)."""
    return interpret or jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def lookup_level_pallas_nhwc(volp: jax.Array, coords: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Windowed bilinear lookup from one bf16 pyramid level.

    volp:   (E, H1, W1, H2, W2) bf16
    coords: (E, H1, W1, 2) [x, y] float, in level units
    Returns (E, H1, W1, 49) f32, channels x-offset major.
    """
    interpret = _auto_interpret(interpret)
    E, H1, W1, H2, W2 = volp.shape
    if H2 == 0 or W2 == 0:   # degenerate level (tiny test images):
        return jnp.zeros((E, H1, W1, _RD * _RD), jnp.float32)
    r = _RD // 2

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx).astype(jnp.float32)
    dy = (y0 - fy).astype(jnp.float32)
    # clip wildly-OOB starts to harmless sentinels (one-hots then select
    # nothing -> exact zeros, the CUDA kernel's OOB behavior)
    xi = jnp.clip(fx.astype(jnp.int32) - r, -_NSUP, W2 + _NSUP)
    yi = jnp.clip(fy.astype(jnp.int32) - r, -_NSUP, H2 + _NSUP)

    # rows per program: amortize per-program latency while bounding VMEM.
    # VMEM tiles pad the last two dims to (8, 128), so budget against
    # PADDED sizes: slab = R*W1*r8(H2)*r128(W2) bf16 (double-buffered),
    # plus ~16 KB/pixel of one-hot + matmul workspace.  Prefer exact
    # divisors of H1 so no program sees padding rows.
    def r8(n):
        return -(-n // 8) * 8

    def r128(n):
        return -(-n // 128) * 128

    slab_unit = W1 * r8(H2) * r128(W2) * 2
    R = max(1, min(H1,
                   (2 * 1024 * 1024) // max(slab_unit, 1),
                   384 // W1 if W1 <= 384 else 1))
    while R > 1 and H1 % R:
        R -= 1

    grid = (E, H1 // R)
    spec_pix = pl.BlockSpec((1, R, W1, 1), lambda e, y: (e, y, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _lookup_kernel,
        grid=grid,
        in_specs=[
            spec_pix,
            spec_pix,
            spec_pix,
            spec_pix,
            pl.BlockSpec((1, R, W1, H2, W2),
                         lambda e, y: (e, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W1, _NSUP, _NSUP),
                               lambda e, y: (e, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H1, W1, _NSUP, _NSUP),
                                       jnp.float32),
        interpret=interpret,
    )(yi[..., None], xi[..., None], dx[..., None], dy[..., None], volp)
    # channel = a*7 + b (x-offset major)
    return out[..., : _RD, : _RD].reshape(E, H1, W1, _RD * _RD)


def lookup_level_pallas(volp: jax.Array, coords: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(E, 49, H1, W1) channel-major variant (corr.lookup_level API)."""
    out = lookup_level_pallas_nhwc(volp, coords, interpret=interpret)
    return jnp.transpose(out, (0, 3, 1, 2))


class CorrPyramidPallas:
    """4-level correlation pyramid with Pallas lookup.

    Drop-in for ``corr.CorrPyramid`` on the tracking hot path: same
    ``__call__(coords) -> (E, 196, H1, W1)`` contract, plus an
    NHWC-native ``nhwc(coords) -> (E, H1, W1, 196)`` used by the fused
    update step.  Levels are stored bf16.
    """

    def __init__(self, levels, radius: int = 3, interpret: bool = False):
        assert radius == 3, "kernel is specialized to radius 3"
        self.levels = list(levels)
        self.radius = radius
        self.interpret = interpret

    @staticmethod
    def from_volume(volume: jax.Array, num_levels: int = 4,
                    interpret: bool = False) -> "CorrPyramidPallas":
        from . import corr
        return CorrPyramidPallas(
            [pad_level(lv)
             for lv in corr.build_pyramid(volume, num_levels)],
            interpret=interpret)

    def nhwc(self, coords: jax.Array) -> jax.Array:
        outs = []
        for lvl, volp in enumerate(self.levels):
            outs.append(lookup_level_pallas_nhwc(
                volp, coords / (2 ** lvl), interpret=self.interpret))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, coords: jax.Array) -> jax.Array:
        outs = []
        for lvl, volp in enumerate(self.levels):
            outs.append(lookup_level_pallas(volp, coords / (2 ** lvl),
                                            interpret=self.interpret))
        return jnp.concatenate(outs, axis=1)
