"""DROID update operator: ConvGRU + flow/weight heads + graph aggregation.

Mirrors /root/reference/networks/modules/gru.py and
/root/reference/networks/droid_net.py:44-150 structurally (torch module
names kept for weight conversion).  NHWC layout; scatter_mean becomes
segment_sum over static depth-slot indices so the whole operator jits
with padded edge sets.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import gradient_clip


class ConvGRU(nn.Module):
    """3x3 ConvGRU with a sigmoid-gated global-context path (gru.py:5-32)."""
    h_planes: int = 128
    i_planes: int = 320
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, *inputs):
        """net: (E, H, W, 128); inputs concatenated to (E, H, W, i_planes)."""
        inp = jnp.concatenate(inputs, axis=-1)
        net_inp = jnp.concatenate([net, inp], axis=-1)

        glo = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (1, 1), dtype=self.dtype,
                    name="w")(net)) * net
        glo = jnp.mean(glo, axis=(-3, -2), keepdims=True)   # (E,1,1,128)

        z = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="convz")(net_inp)
            + nn.Conv(self.h_planes, (1, 1), dtype=self.dtype,
                      name="convz_glo")(glo))
        r = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="convr")(net_inp)
            + nn.Conv(self.h_planes, (1, 1), dtype=self.dtype,
                      name="convr_glo")(glo))
        q = jnp.tanh(
            nn.Conv(self.h_planes, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="convq")(
                jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(self.h_planes, (1, 1), dtype=self.dtype,
                      name="convq_glo")(glo))

        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Pool hidden states per source view -> damping eta + upsample mask
    (droid_net.py:44-75).  ``seg`` assigns each edge to its source-view
    slot (0..n_seg-1, or <0 for padded edges); replaces scatter_mean."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, seg, n_seg: int):
        E, H, W, C = net.shape
        x = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="conv1")(net))

        safe = jnp.where(seg < 0, n_seg, seg)
        summed = jax.ops.segment_sum(x, safe, num_segments=n_seg + 1)[:n_seg]
        count = jax.ops.segment_sum(jnp.ones((E,), x.dtype), safe,
                                    num_segments=n_seg + 1)[:n_seg]
        mean = summed / jnp.maximum(count, 1.0)[:, None, None, None]

        y = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="conv2")(mean))

        eta = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      name="eta_0")(y)
        eta = 0.01 * jax.nn.softplus(gradient_clip(
            eta.astype(jnp.float32)))
        upmask = nn.Conv(8 * 8 * 9, (1, 1), dtype=self.dtype,
                         name="upmask_0")(y)
        return eta[..., 0], upmask.astype(jnp.float32)   # (K,H,W), (K,H,W,576)


class UpdateModule(nn.Module):
    """RAFT-SLAM update operator (droid_net.py:78-150)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, inp, corr, flow=None, seg=None,
                 n_seg: int | None = None):
        """net/inp: (E, H, W, 128) hidden/context; corr: (E, H, W, 196);
        flow: (E, H, W, 4) motion features.  Returns (net, delta, weight
        [, eta, upmask]) with delta/weight (E, H, W, 2) fp32."""
        E, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((E, H, W, 4), dtype=net.dtype)

        c = nn.relu(nn.Conv(128, (1, 1), dtype=self.dtype,
                            name="corr_encoder_0")(corr))
        c = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="corr_encoder_2")(c))

        f = nn.relu(nn.Conv(128, (7, 7), padding=[(3, 3)] * 2,
                            dtype=self.dtype, name="flow_encoder_0")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="flow_encoder_2")(f))

        net = ConvGRU(128, 320, dtype=self.dtype, name="gru")(
            net, inp, c, f)

        d = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="delta_0")(net))
        d = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="delta_2")(d)
        delta = gradient_clip(d.astype(jnp.float32))

        w = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="weight_0")(net))
        w = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="weight_2")(w)
        weight = jax.nn.sigmoid(gradient_clip(w.astype(jnp.float32)))

        if seg is not None:
            eta, upmask = GraphAgg(dtype=self.dtype, name="agg")(
                net, seg, n_seg)
            return net, delta, weight, eta, upmask
        return net, delta, weight


class DroidNet(nn.Module):
    """Full network bundle (droid_net.py:153-158)."""
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        from .layers import BasicEncoder
        self.feature_net = BasicEncoder(128, "instance", dtype=self.dtype)
        self.context_net = BasicEncoder(256, "none", dtype=self.dtype)
        self.update_net = UpdateModule(dtype=self.dtype)

    def features(self, images):
        """images: (..., H, W, 3) normalized -> fmaps (..., H/8, W/8, 128)."""
        return self.feature_net(images)

    def context(self, images):
        """-> (net_init tanh 128, cst_context relu 128)."""
        ctx = self.context_net(images)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def update(self, net, inp, corr, flow=None, seg=None, n_seg=None):
        return self.update_net(net, inp, corr, flow, seg, n_seg)

    def __call__(self, images, net, inp, corr, flow, seg, n_seg):
        """init-shape driver (used for parameter initialization only)."""
        f = self.features(images)
        c, ci = self.context(images)
        out = self.update_net(net, inp, corr, flow, seg, n_seg)
        return f, c, ci, out
