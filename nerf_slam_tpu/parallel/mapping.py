"""Multi-chip mapping: data-parallel NGP training over a device mesh.

The reference scales by pinning tracking and mapping to two GPUs and
bouncing tensors through the CPU (SURVEY.md 2.3).  TPU-native scaling is
collective-based instead: rays are sharded over the mesh's ``data`` axis,
every device holds a replica of the hash table + MLPs, and gradients are
averaged with one ``psum`` over ICI per step -- classic DP, which is the
right decomposition for NGP training (compute scales with rays; params
are only ~70 MB).

Written with ``shard_map`` so the collective is explicit and the code
runs identically on a real TPU pod slice or on N virtual CPU devices
(the driver's dryrun).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import optax

from ..fusion.ngp import (NGPConfig, NGPParams, init_ngp, render_rays,
                          sample_along_rays)


def make_dp_train_step(mesh: Mesh, field, cfg: NGPConfig, optimizer):
    """Build a jitted data-parallel NGP train step over ``mesh``.

    Step signature: (params, opt_state, batch, key) -> (params, opt_state,
    loss).  ``batch`` is a dict of ray arrays sharded along axis 0:
    origins/dirs (R,3), rgb (R,3), depth (R,), depth_w (R,).
    """
    axis = "data"

    def local_loss(params, batch, key):
        o, d = batch["origins"], batch["dirs"]
        t = sample_along_rays(key, o, d, batch["depth"],
                              (batch["depth"] > 0).astype(jnp.float32),
                              cfg)
        rgb, depth, acc, _ = render_rays(params, field, cfg, o, d, t)
        l_rgb = jnp.mean((rgb - batch["rgb"]) ** 2)
        dv = (batch["depth"] > 0).astype(jnp.float32)
        l_d = jnp.sum(batch["depth_w"] * dv * (depth - batch["depth"]) ** 2
                      ) / jnp.maximum(jnp.sum(dv), 1.0)
        return cfg.rgb_weight * l_rgb + cfg.depth_weight * l_d

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), {"origins": P(axis), "dirs": P(axis),
                                  "rgb": P(axis), "depth": P(axis),
                                  "depth_w": P(axis)}, P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, batch, key):
        # decorrelate sampling across shards
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, grads = jax.value_and_grad(local_loss)(params, batch, key)
        grads = jax.lax.pmean(grads, axis)      # one ICI collective
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def dryrun(n_devices: int) -> float:
    """Compile + run ONE sharded mapping train step on tiny shapes.
    Used by the driver's multi-chip validation (works on CPU devices)."""
    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("data",))

    cfg = NGPConfig(n_uniform=8, n_depth=4, encoding="hash")._replace(
        grid=__import__("nerf_slam_tpu.fusion.hashgrid",
                        fromlist=["HashGridConfig"]).HashGridConfig(
            n_levels=2, log2_table_size=8, base_resolution=4,
            finest_resolution=8))
    params, field = init_ngp(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    R = 8 * n_devices
    key = jax.random.PRNGKey(1)
    batch = {
        "origins": jnp.full((R, 3), 0.5),
        "dirs": jax.random.normal(key, (R, 3)) * 0.3,
        "rgb": jax.random.uniform(key, (R, 3)),
        "depth": jnp.full((R,), 0.4),
        "depth_w": jnp.ones((R,)),
    }
    step = make_dp_train_step(mesh, field, cfg, opt)
    params, opt_state, loss = step(params, opt_state, batch, key)
    return float(loss)
