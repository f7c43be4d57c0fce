"""Standalone TPU timing: per-pixel vs grouped pallas corr lookup.

Inputs vary per rep (the tunnel dedupes identical dispatches; see
_proftools).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from _proftools import timeit
from nerf_slam_tpu.ops import corr, corr_pallas
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

E, H1, W1 = 96, 42, 80


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)

    fsets = {}
    csets = {}
    for i in range(-1, 9):
        fsets[i] = (
            jnp.asarray(rng.randn(E, 128, H1, W1).astype(np.float32)
                        * 0.1),
            jnp.asarray(rng.randn(E, 128, H1, W1).astype(np.float32)
                        * 0.1))
        csets[i] = jnp.asarray(
            (rng.rand(E, H1, W1, 2) * np.array([W1 - 1, H1 - 1])
             ).astype(np.float32))

    build = jax.jit(lambda a, b: tuple(corr.build_pyramid_bf16(a, b)))
    timeit("build_pyramid_bf16", build, lambda i: fsets[i])

    levels = jax.block_until_ready(build(*fsets[0]))
    pp = corr_pallas.CorrPyramidPallas(list(levels))
    gp = corr_pallas.CorrPyramidPallas(list(levels), grouped=True)
    oh = corr.CorrPyramid(list(levels))

    timeit("pallas per-pixel (4 levels)",
           jax.jit(lambda c: pp.nhwc(c)), lambda i: (csets[i],))
    timeit("pallas grouped  (4 levels)",
           jax.jit(lambda c: gp.nhwc(c)), lambda i: (csets[i],))
    timeit("xla onehot      (4 levels)",
           jax.jit(lambda c: oh(c)), lambda i: (csets[i],))

    for lvl in range(4):
        v = levels[lvl]
        timeit(f"per-pixel level {lvl} {tuple(v.shape[-2:])}",
               jax.jit(lambda c, v=v, s=2 ** lvl:
                       corr_pallas.lookup_level_pallas_nhwc(v, c / s)),
               lambda i: (csets[i],))
        timeit(f"grouped   level {lvl} {tuple(v.shape[-2:])}",
               jax.jit(lambda c, v=v, s=2 ** lvl:
                       corr_pallas.lookup_level_pallas_grouped_nhwc(
                           v, c / s)),
               lambda i: (csets[i],))


if __name__ == "__main__":
    main()
