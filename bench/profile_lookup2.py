"""Grouped4 lookup kernel timing at the PRODUCTION frontend shape
(E=48, 42x80), with slabs passed as jit ARGUMENTS (bench/profile_lookup
closes over them -- 2.9 GB of captured constants make its compiles
glacial).

Run from the repo root: python bench/profile_lookup2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

E, H1, W1 = 48, 42, 80


def main():
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.ops import corr, corr_pallas
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.RandomState(0)

    f1 = jnp.asarray(rng.randn(E, 128, H1, W1).astype(np.float32) * 0.1)
    f2 = jnp.asarray(rng.randn(E, 128, H1, W1).astype(np.float32) * 0.1)
    build = jax.jit(lambda a, b: tuple(
        corr.build_pyramid_bf16(a, b, pad_rows_to=8)))
    levels = jax.block_until_ready(build(f1, f2))

    coords = [jnp.asarray(
        (rng.rand(E, H1, W1, 2) * np.array([W1 - 1, H1 - 1])
         ).astype(np.float32)) for _ in range(4)]
    dims = corr_pallas.pyramid_dims(H1, W1)

    def fetch(x):
        """Force REAL completion: block_until_ready resolves before the
        device has actually run on this tunnel (measured 0.06 ms for a
        kernel whose DMA floor alone is ~2 ms); fetching a scalar VALUE
        is the only trustworthy sync."""
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf))

    def timeit(name, fn, reps=12):
        """Every call gets a UNIQUE traced scalar folded into its
        inputs: the tunnel memoizes byte-identical dispatches, so
        repeating the same arguments measures the cache, not the
        kernel."""
        fetch(fn(0, jnp.float32(-1.0)))
        t0 = time.perf_counter()
        for i in range(reps):
            fetch(fn(i % 4, jnp.float32(i) * 1e-5))
        print(f"{name:>28s}: "
              f"{(time.perf_counter()-t0)/reps*1e3:7.2f} ms",
              flush=True)

    bld = jax.jit(lambda a, b, s: tuple(
        corr.build_pyramid_bf16(a + s, b, pad_rows_to=8)))
    timeit("build_pyramid_bf16", lambda i, s: bld(f1, f2, s))

    g4 = jax.jit(lambda lv, c, s:
                 corr_pallas.lookup_pyramid_grouped4_nhwc(
                     lv, c + s, dims))
    timeit("grouped4 (ungated)", lambda i, s: g4(levels, coords[i], s))

    n_act = jnp.int32(30)
    g4g = jax.jit(lambda lv, c, s, n:
                  corr_pallas.lookup_pyramid_grouped4_nhwc(
                      lv, c + s, dims, n_act=n))
    timeit("grouped4 (gated n=30)",
           lambda i, s: g4g(levels, coords[i], s, n_act))

    # the kernel as the update loop uses it: inside a lax.while_loop
    # with the slabs as loop-free constants (the in-program marginal
    # measures ~15 ms/iter vs ~0.5 ms standalone -- this isolates
    # whether the loop context itself adds the cost)
    def loop_n(n_iters):
        @jax.jit
        def f(lv, c, s, n):
            def body(carry):
                i, cc, acc = carry
                out = corr_pallas.lookup_pyramid_grouped4_nhwc(
                    lv, cc, dims, n_act=n)
                return (i + 1, cc + out[..., :2] * 1e-6,
                        acc + out.sum())

            carry = (jnp.zeros((), jnp.int32), c + s,
                     jnp.zeros((), jnp.float32))
            carry = jax.lax.while_loop(lambda t: t[0] < n_iters, body,
                                       carry)
            return carry[2]
        return f

    l1 = loop_n(1)
    l4 = loop_n(4)
    timeit("while_loop x1 lookup", lambda i, s: l1(levels, coords[i],
                                                   s, n_act))
    timeit("while_loop x4 lookup", lambda i, s: l4(levels, coords[i],
                                                   s, n_act))


if __name__ == "__main__":
    main()
