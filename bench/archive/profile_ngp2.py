"""Drill into the NGP train step's unaccounted ~39 ms."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from _proftools import timeit
from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
from nerf_slam_tpu.fusion import ngp as ngp_mod
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

H, W, B = 336, 640, 24


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    fus = NerfFusion(NerfFusionConfig(buffer=B, height=H, width=W,
                                      batch_rays=4096, iters_per_spin=10),
                     seed=0)
    ids = np.arange(8)
    c2w = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    c2w[:, 2, 3] = np.linspace(0, 0.5, 8)
    imgs = (rng.rand(8, H, W, 3) * 255).astype(np.uint8)
    depths = (1.0 + rng.rand(8, H, W)).astype(np.float32)
    covs = (0.01 * rng.rand(8, H, W)).astype(np.float32)
    intr = np.tile(np.array([300.0, 300.0, W / 2, H / 2], np.float32),
                   (8, 1))
    fus.update_training_images(ids, jnp.asarray(c2w), imgs,
                               jnp.asarray(depths), jnp.asarray(covs),
                               jnp.asarray(intr))

    cfg = fus.cfg
    R = cfg.batch_rays
    ts = fus.train_set
    keys = {i: jax.random.PRNGKey(i + 100) for i in range(-1, 9)}

    def ray_prep(key):
        kimg, kuv, ksamp = jax.random.split(key, 3)
        p = ts.valid / jnp.maximum(ts.valid.sum(), 1.0)
        img_idx = jax.random.choice(kimg, cfg.buffer, (R,), p=p)
        u = jax.random.uniform(kuv, (R, 2))
        xi = jnp.round(u[:, 0] * (cfg.width - 1)).astype(jnp.int32)
        yi = jnp.round(u[:, 1] * (cfg.height - 1)).astype(jnp.int32)
        c2w_r = ts.c2w[img_idx]
        fx, fy, cx, cy = jnp.moveaxis(ts.intrinsics[img_idx], -1, 0)
        dirs_cam = jnp.stack([(xi + 0.5 - cx) / fx,
                              (yi + 0.5 - cy) / fy, jnp.ones((R,))], -1)
        dirs = jnp.einsum("rij,rj->ri", c2w_r[:, :3, :3],
                          dirs_cam) * cfg.scale
        origins = c2w_r[:, :3, 3]
        tgt_rgb = ts.images[img_idx, yi, xi]
        tgt_depth = ts.depths[img_idx, yi, xi]
        tgt_cov = ts.depths_cov[img_idx, yi, xi]
        return origins, dirs, tgt_rgb, tgt_depth, tgt_cov

    timeit("ray_prep (choice+gathers)", jax.jit(ray_prep),
           lambda i: (keys[i],))

    args0 = jax.block_until_ready(jax.jit(ray_prep)(keys[0]))
    origins, dirs, tgt_rgb, tgt_depth, tgt_cov = args0
    d_valid = (tgt_depth > 0).astype(jnp.float32)
    t0 = jax.block_until_ready(jax.jit(
        lambda k: ngp_mod.sample_along_rays(k, origins, dirs, tgt_depth,
                                            d_valid, cfg.ngp))(keys[0]))

    def loss_grad(params, key):
        def loss_fn(params):
            rgb, depth, acc, _ = ngp_mod.render_rays(
                params, fus.field, cfg.ngp, origins, dirs, t0)
            l_rgb = jnp.mean((rgb - tgt_rgb) ** 2)
            w = d_valid / (tgt_cov / (cfg.scale ** 2) + 1e-2)
            l_d = jnp.sum(w * (depth - tgt_depth) ** 2) / \
                jnp.maximum(jnp.sum(d_valid), 1.0)
            return cfg.ngp.rgb_weight * l_rgb + cfg.ngp.depth_weight * l_d
        return jax.grad(loss_fn)(params)
    timeit("loss grad (fixed rays)", jax.jit(loss_grad),
           lambda i: (fus.params, keys[i]))

    g0 = jax.block_until_ready(jax.jit(loss_grad)(fus.params, keys[0]))

    def opt_step(g, key):
        upd, new_state = fus.opt.update(g, fus.opt_state, fus.params)
        return optax.apply_updates(fus.params, upd)
    timeit("optimizer update", jax.jit(opt_step),
           lambda i: (jax.tree.map(lambda x: x * (1 + 0.001), g0),
                      keys[i]))


if __name__ == "__main__":
    main()


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))