"""Steady-state fit_volume cost: repeated same-size calls (production
pattern: FusionModule calls fit_volume(iters_per_spin) every spin)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
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

    float(fus.fit_volume(10))      # compile + warm
    for rep in range(6):
        t0 = time.perf_counter()
        loss = fus.fit_volume(10)
        float(loss)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"rep {rep}: fit_volume(10) {dt:8.1f} ms "
              f"({dt/10:6.2f} ms/iter)", flush=True)
    # unsynced (production never fetches the loss)
    t0 = time.perf_counter()
    for rep in range(6):
        loss = fus.fit_volume(10)
    float(loss)
    dt = (time.perf_counter() - t0) * 1e3 / 6
    print(f"unsynced mean: {dt:8.1f} ms per fit_volume(10)", flush=True)


if __name__ == "__main__":
    main()
