"""Lookup benchmark with a data-dependency chain: each call consumes the
previous output, so the device must execute them sequentially; one D2H
sync at the end.  RTT measured separately and subtracted."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time
import numpy as np


def main():
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from nerf_slam_tpu.geometry import camera
    from nerf_slam_tpu.ops import corr, corr_pallas

    h, w = 42, 80
    E = 48
    ks = jax.random.split(jax.random.PRNGKey(0), 24)
    f1 = jax.random.normal(ks[0], (E, 128, h, w), jnp.bfloat16) * 0.5
    f2 = jax.random.normal(ks[1], (E, 128, h, w), jnp.bfloat16) * 0.5

    @jax.jit
    def build(f1, f2):
        vol = corr.build_volume(f1, f2)
        return tuple(lv.astype(jnp.bfloat16)
                     for lv in corr.build_pyramid(vol))

    levels = jax.block_until_ready(build(f1, f2))
    coords0 = camera.coords_grid(h, w)[None] + \
        jax.random.normal(ks[2], (E, h, w, 2)) * 3.0

    # RTT of a trivial chain element
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(())
    float(tiny(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = tiny(y)
    float(y)
    rtt = (time.perf_counter() - t0)
    print(f"20-op trivial chain + sync: {rtt*1e3:.1f} ms", flush=True)

    onehot_c = jax.jit(
        lambda lv, c: corr.CorrPyramid(list(lv))(c)
        .transpose(0, 2, 3, 1))
    pallas_c = jax.jit(
        lambda lv, c: corr_pallas.CorrPyramidPallas(list(lv)).nhwc(c))

    def timeit(fn, name, K=20):
        c = coords0
        # warm
        out = fn(levels, c)
        float(out.sum())
        t0 = time.perf_counter()
        c = coords0
        for _ in range(K):
            out = fn(levels, c)
            c = coords0 + 1e-9 * out[..., :2]   # data dependency
        float(out.sum())
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{name}: {dt/K:7.2f} ms/call (chained x{K})", flush=True)

    timeit(onehot_c, "onehot")
    timeit(pallas_c, "pallas")


if __name__ == "__main__":
    main()
