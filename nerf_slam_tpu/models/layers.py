"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

Mirrors /root/reference/networks/modules/{extractor,clipping}.py
structurally so pretrained DROID weights map 1:1 (see models/weights.py).
PyTorch's InstanceNorm2d defaults to affine=False, so instance/none norms
carry no parameters -- they become pure functions here.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel normalization over H, W (NHWC), no affine."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def apply_norm(x: jax.Array, norm: str) -> jax.Array:
    if norm == "instance":
        # match torch semantics in fp32 then cast back
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
    if norm == "none":
        return x
    raise ValueError(f"norm '{norm}' not supported (pretrained DROID uses "
                     "instance/none only)")


@jax.custom_vjp
def gradient_clip(x: jax.Array) -> jax.Array:
    """Identity forward; zeroes grads with |g| > 0.01 or NaN on backward
    (networks/modules/clipping.py:7-24). Training-time only."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    ok = jnp.isfinite(g) & (jnp.abs(g) < 0.01)
    return (jnp.where(ok, g, jnp.zeros_like(g)),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


class Conv(nn.Module):
    """Thin wrapper: torch-style conv (same padding semantics) in NHWC."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       dtype=self.dtype, name="conv")(x)


class ResidualBlock(nn.Module):
    """extractor.py:6-55: two 3x3 convs + optional strided 1x1 downsample.
    Note the reference applies ReLU to the second conv *before* the skip
    add, and again after -- preserved exactly."""
    planes: int
    norm: str = "instance"
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(apply_norm(y, self.norm))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(apply_norm(y, self.norm))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype, name="downsample")(x)
            x = apply_norm(x, self.norm)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT encoder (extractor.py:118-198): 7x7/2 stem + 3 residual stages
    (32 -> 64 -> 128 channels, 1/8 resolution) + 1x1 head."""
    output_dim: int = 128
    norm: str = "instance"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, 3) normalized images -> (..., H/8, W/8, out)."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])

        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(apply_norm(x, self.norm))

        for stage, (planes, stride) in enumerate(
                [(32, 1), (64, 2), (128, 2)], start=1):
            x = ResidualBlock(planes, self.norm, stride, self.dtype,
                              name=f"layer{stage}_0")(x)
            x = ResidualBlock(planes, self.norm, 1, self.dtype,
                              name=f"layer{stage}_1")(x)

        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                    name="conv2")(x)
        return x.reshape(lead + x.shape[-3:])
