"""NGP _train_scan cost vs scan length: splits the per-dispatch fixed
cost from the per-iteration marginal (scan(10) measures ~17 ms/iter in
the pipeline while scan(100) runs ~6.6 ms/iter -- something fixed is
burning ~100 ms per dispatch).

Run from the repo root: python bench/profile_ngp6.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

H, W, B = 336, 640, 24


def main():
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.RandomState(0)
    fus = NerfFusion(NerfFusionConfig(buffer=B, height=H, width=W,
                                      batch_rays=4096,
                                      iters_per_spin=10), seed=0)
    n_img = 8
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    c2w[:, 2, 3] = np.linspace(0, 0.5, n_img)
    fus.update_training_images(
        np.arange(n_img), c2w,
        (rng.rand(n_img, H, W, 3) * 255).astype(np.uint8),
        (1.5 + rng.rand(n_img, H, W)).astype(np.float32),
        0.01 * np.ones((n_img, H, W), np.float32),
        np.tile(np.array([300.0, 300.0, W / 2, H / 2], np.float32),
                (n_img, 1)))

    for n in (1, 5, 10, 25, 50, 100):
        loss = fus.fit_volume(n)             # compile this scan length
        jax.block_until_ready(loss)
        reps = max(3, 200 // n)
        losses = []
        t0 = time.perf_counter()
        for _ in range(reps):
            # sync on the LOSS SCALAR each call: per-call latency, and
            # the evolving loss proves the step really executed (the
            # tunnel memoizes dispatches whose donated buffer handles
            # repeat -- async timing measured 0.04 ms/iter garbage)
            losses.append(float(fus.fit_volume(n)))
        ms = (time.perf_counter() - t0) / reps * 1e3
        moved = len(set(f"{x:.6f}" for x in losses)) > 1
        print(f"scan({n:3d}): {ms:8.2f} ms/call  {ms / n:6.2f} ms/iter"
              f"  loss {losses[0]:.4f}->{losses[-1]:.4f}"
              f" {'ok' if moved else 'STATIC (dedupe?)'}", flush=True)


if __name__ == "__main__":
    main()
