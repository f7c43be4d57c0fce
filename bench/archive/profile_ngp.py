"""NGP mapping-step stage costs on TPU (varied inputs per rep)."""
import numpy as np
import jax
import jax.numpy as jnp

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
    # fake training set
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

    keys = {i: jax.random.PRNGKey(i + 100) for i in range(-1, 9)}

    # full train step (params/opt donated -> copy fresh per call to keep
    # the benchmark stateless; measures one step)
    p0, o0 = fus.params, fus.opt_state
    d0, po0 = fus.pose_deltas, fus.pose_opt_state
    one = jnp.float32(1.0)

    def step(key):
        (p, d, o, po, loss, _, _) = fus._train_step(
            jax.tree.map(lambda x: x + 0, p0),
            d0 + 0,
            jax.tree.map(lambda x: x + 0, o0),
            jax.tree.map(lambda x: x + 0, po0),
            fus.train_set, key, one, one)
        return loss
    timeit("train_step(4096x128)", step, lambda i: (keys[i],))

    cfg = fus.cfg
    R = cfg.batch_rays

    def make_rays(i):
        r = np.random.RandomState(i + 1)
        origins = jnp.asarray(0.5 + 0.01 * r.randn(R, 3).astype(np.float32))
        dirs = jnp.asarray(r.randn(R, 3).astype(np.float32))
        tgt_depth = jnp.asarray((0.3 + 0.2 * r.rand(R)).astype(np.float32))
        return origins, dirs, tgt_depth

    samp = jax.jit(lambda o, d, td, k: ngp_mod.sample_along_rays(
        k, o, d, td, jnp.ones((R,)), cfg.ngp))
    timeit("sample_along_rays", samp,
           lambda i: make_rays(i) + (keys[i],))

    t0 = jax.block_until_ready(samp(*make_rays(0), keys[0]))

    fwd = jax.jit(lambda p, o, d, t: ngp_mod.render_rays(
        p, fus.field, cfg.ngp, o, d, t))
    timeit("render_rays fwd", fwd,
           lambda i: (p0,) + make_rays(i)[:2] + (t0,))

    def fwdbwd(p, o, d, t):
        def lf(p):
            rgb, depth, acc, _ = ngp_mod.render_rays(p, fus.field,
                                                     cfg.ngp, o, d, t)
            return jnp.sum(rgb) + jnp.sum(depth)
        return jax.grad(lf)(p)
    timeit("render_rays fwd+bwd", jax.jit(fwdbwd),
           lambda i: (p0,) + make_rays(i)[:2] + (t0,))


if __name__ == "__main__":
    main()


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))