"""DROID update operator: ConvGRU + flow/weight heads + graph aggregation.

Mirrors /root/reference/networks/modules/gru.py and
/root/reference/networks/droid_net.py:44-150 structurally (torch module
names kept for weight conversion).  NHWC layout; scatter_mean becomes
segment_sum over static depth-slot indices so the whole operator jits
with padded edge sets.

Defined setup-style (not @nn.compact) so the GraphAgg head can also be
invoked on its own: the frontend fuses N GRU+DBA iterations in one jit
and only needs the (large) upsample mask once, after the last iteration.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import gradient_clip


def _conv(features, kernel, dtype, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel),
                   padding=[(pad, pad)] * 2, dtype=dtype, name=name)


class ConvGRU(nn.Module):
    """3x3 ConvGRU with a sigmoid-gated global-context path (gru.py:5-32)."""
    h_planes: int = 128
    i_planes: int = 320
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = self.dtype
        self.convz = _conv(self.h_planes, 3, d)
        self.convr = _conv(self.h_planes, 3, d)
        self.convq = _conv(self.h_planes, 3, d)
        self.w = _conv(self.h_planes, 1, d)
        self.convz_glo = _conv(self.h_planes, 1, d)
        self.convr_glo = _conv(self.h_planes, 1, d)
        self.convq_glo = _conv(self.h_planes, 1, d)

    def _sliced(self, conv, x, c0, c1, with_bias):
        """Apply ``conv`` restricted to input channels [c0, c1) (two
        ranges when c1 is a tuple: [0, h) ++ [c0, c1)) by slicing its
        kernel.  The full conv equals the sum of its channel-slice
        parts, so a CONSTANT input block's contribution can be hoisted
        out of the GRU iteration loop (the frontend runs 4-8 iterations
        per update round with the same context input)."""
        k = conv.variables["params"]["kernel"]
        if isinstance(c1, tuple):        # [0:h] ++ [c1[0]:c1[1]]
            k = jnp.concatenate([k[:, :, :c0], k[:, :, c1[0]:c1[1]]],
                                axis=2)
        else:
            k = k[:, :, c0:c1]
        # honor the module compute dtype (params are stored f32; nn.Conv
        # with dtype=bf16 promotes to bf16 for compute -- so must we, or
        # the GRU's bf16 hidden state silently becomes f32)
        cd = self.dtype or k.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(cd), k.astype(cd), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if with_bias:
            y = y + conv.variables["params"]["bias"].astype(cd)
        return y

    def precompute_inp(self, inp):
        """Per-round constants: each gate conv's contribution from the
        context block ``inp`` (channels h..h+ci of the concatenated GRU
        input).  Returns (z_inp, r_inp, q_inp)."""
        h = self.h_planes
        ci = inp.shape[-1]
        return (self._sliced(self.convz, inp, h, h + ci, False),
                self._sliced(self.convr, inp, h, h + ci, False),
                self._sliced(self.convq, inp, h, h + ci, False))

    def __call__(self, net, *inputs, gates_inp=None):
        """net: (E, H, W, 128); inputs concatenated to (E, H, W, i_planes).

        ``gates_inp``: optional (z_inp, r_inp, q_inp) from
        :meth:`precompute_inp` -- then ``inputs`` must EXCLUDE the
        context block, and each gate runs ONE conv over the varying
        channels [net ++ rest] with the context part added back as a
        precomputed constant (mathematically identical, ~30% fewer conv
        FLOPs per iteration)."""
        glo = jax.nn.sigmoid(self.w(net)) * net
        glo = jnp.mean(glo, axis=(-3, -2), keepdims=True)   # (E,1,1,128)

        if gates_inp is not None:
            z_i, r_i, q_i = gates_inp
            h = self.h_planes
            rest = jnp.concatenate(inputs, axis=-1)
            ci = self.i_planes - rest.shape[-1]
            ztot = self.i_planes + h
            net_rest = jnp.concatenate([net, rest], axis=-1)
            rng = (h + ci, ztot)
            z = jax.nn.sigmoid(
                self._sliced(self.convz, net_rest, h, rng, True) + z_i
                + self.convz_glo(glo))
            r = jax.nn.sigmoid(
                self._sliced(self.convr, net_rest, h, rng, True) + r_i
                + self.convr_glo(glo))
            rnet_rest = jnp.concatenate([r * net, rest], axis=-1)
            q = jnp.tanh(
                self._sliced(self.convq, rnet_rest, h, rng, True) + q_i
                + self.convq_glo(glo))
            return (1 - z) * net + z * q

        inp = jnp.concatenate(inputs, axis=-1)
        net_inp = jnp.concatenate([net, inp], axis=-1)
        z = jax.nn.sigmoid(self.convz(net_inp) + self.convz_glo(glo))
        r = jax.nn.sigmoid(self.convr(net_inp) + self.convr_glo(glo))
        q = jnp.tanh(self.convq(jnp.concatenate([r * net, inp], axis=-1))
                     + self.convq_glo(glo))
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Pool hidden states per source view -> damping eta + upsample mask
    (droid_net.py:44-75).  ``seg`` assigns each edge to its source-view
    slot (0..n_seg-1, or <0 for padded edges); replaces scatter_mean."""
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = self.dtype
        self.conv1 = _conv(128, 3, d)
        self.conv2 = _conv(128, 3, d)
        self.eta_0 = _conv(1, 3, d)
        self.upmask_0 = _conv(8 * 8 * 9, 1, d)

    def _pooled(self, net, seg, n_seg: int, axis_name=None):
        """``axis_name``: edges sharded over a mesh axis (shard_map) --
        the per-view mean pools across all shards via psum."""
        E = net.shape[0]
        x = nn.relu(self.conv1(net))
        safe = jnp.where(seg < 0, n_seg, seg)
        summed = jax.ops.segment_sum(x, safe, num_segments=n_seg + 1)[:n_seg]
        count = jax.ops.segment_sum(jnp.ones((E,), x.dtype), safe,
                                    num_segments=n_seg + 1)[:n_seg]
        if axis_name is not None:
            summed, count = jax.lax.psum((summed, count), axis_name)
        mean = summed / jnp.maximum(count, 1.0)[:, None, None, None]
        return nn.relu(self.conv2(mean))

    def eta(self, net, seg, n_seg: int, axis_name=None):
        y = self._pooled(net, seg, n_seg, axis_name)
        e = self.eta_0(y)
        return 0.01 * jax.nn.softplus(
            gradient_clip(e.astype(jnp.float32)))[..., 0]

    def __call__(self, net, seg, n_seg: int, axis_name=None):
        y = self._pooled(net, seg, n_seg, axis_name)
        e = self.eta_0(y)
        eta = 0.01 * jax.nn.softplus(
            gradient_clip(e.astype(jnp.float32)))[..., 0]
        upmask = self.upmask_0(y).astype(jnp.float32)
        return eta, upmask   # (K,H,W), (K,H,W,576)


class UpdateModule(nn.Module):
    """RAFT-SLAM update operator (droid_net.py:78-150)."""
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = self.dtype
        self.corr_encoder_0 = _conv(128, 1, d)
        self.corr_encoder_2 = _conv(128, 3, d)
        self.flow_encoder_0 = _conv(128, 7, d)
        self.flow_encoder_2 = _conv(64, 3, d)
        self.weight_0 = _conv(128, 3, d)
        self.weight_2 = _conv(2, 3, d)
        self.delta_0 = _conv(128, 3, d)
        self.delta_2 = _conv(2, 3, d)
        self.gru = ConvGRU(128, 320, dtype=d)
        self.agg = GraphAgg(dtype=d)

    def precompute_inp(self, inp):
        """Hoistable per-round GRU gate constants for context ``inp``
        (see ConvGRU.precompute_inp); call once per update round, pass
        the result as ``gates_inp`` to every iteration."""
        return self.gru.precompute_inp(inp)

    def __call__(self, net, inp, corr, flow=None, seg=None,
                 n_seg: int | None = None, with_upmask: bool = True,
                 axis_name=None, gates_inp=None):
        """net/inp: (E, H, W, 128) hidden/context; corr: (E, H, W, 196);
        flow: (E, H, W, 4) motion features.  Returns (net, delta, weight
        [, eta[, upmask]]) with delta/weight (E, H, W, 2) fp32.

        ``gates_inp``: precomputed context gate constants -- ``inp`` is
        then ignored (may be None)."""
        E, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((E, H, W, 4), dtype=net.dtype)

        c = nn.relu(self.corr_encoder_0(corr))
        c = nn.relu(self.corr_encoder_2(c))
        f = nn.relu(self.flow_encoder_0(flow))
        f = nn.relu(self.flow_encoder_2(f))

        if gates_inp is not None:
            net = self.gru(net, c, f, gates_inp=gates_inp)
        else:
            net = self.gru(net, inp, c, f)

        d = nn.relu(self.delta_0(net))
        d = self.delta_2(d)
        delta = gradient_clip(d.astype(jnp.float32))

        w = nn.relu(self.weight_0(net))
        w = self.weight_2(w)
        weight = jax.nn.sigmoid(gradient_clip(w.astype(jnp.float32)))

        if seg is not None:
            if with_upmask:
                eta, upmask = self.agg(net, seg, n_seg, axis_name)
                return net, delta, weight, eta, upmask
            eta = self.agg.eta(net, seg, n_seg, axis_name)
            return net, delta, weight, eta
        return net, delta, weight

    def aggregate(self, net, seg, n_seg: int, axis_name=None):
        """GraphAgg only (for post-loop upsample-mask extraction)."""
        return self.agg(net, seg, n_seg, axis_name)


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

    def update(self, net, inp, corr, flow=None, seg=None, n_seg=None,
               with_upmask=True, axis_name=None, gates_inp=None):
        return self.update_net(net, inp, corr, flow, seg, n_seg,
                               with_upmask, axis_name, gates_inp)

    def update_precompute(self, inp):
        """Per-round GRU context gate constants (UpdateModule
        .precompute_inp)."""
        return self.update_net.precompute_inp(inp)

    def aggregate(self, net, seg, n_seg, axis_name=None):
        return self.update_net.aggregate(net, seg, n_seg, axis_name)

    def init_params(self, key, H: int, W: int):
        """Parameter init under ONE jitted program.  Eager flax init
        dispatches every layer's rng/conv as its own single-op XLA
        program (~150 compiles, minutes of cold warmup on a tunneled
        device); jitting collapses them into one."""
        import functools

        h, w = H // 8, W // 8

        @functools.partial(jax.jit, static_argnums=0)
        def _init(net, key):
            return net.init(key, jnp.zeros((1, H, W, 3)),
                            jnp.zeros((1, h, w, 128)),
                            jnp.zeros((1, h, w, 128)),
                            jnp.zeros((1, h, w, 196)),
                            jnp.zeros((1, h, w, 4)),
                            jnp.array([0]), 1)

        return _init(self, key)

    def __call__(self, images, net, inp, corr, flow, seg, n_seg):
        """init-shape driver (used for parameter initialization only)."""
        f = self.features(images)
        c, ci = self.context(images)
        out = self.update_net(net, inp, corr, flow, seg, n_seg)
        return f, c, ci, out
