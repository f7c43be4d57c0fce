"""Which slab layout can the TPU actually stream?  Sum-only kernels over
candidate correlation-slab layouts at frontend sizes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_slam_tpu.utils.runtime import enable_compilation_cache

E, H1, W1 = 48, 42, 80


def make_stream(shape4, R=3):
    """shape4: per-pixel trailing dims (d0, d1) -> slab (E,H1,W1,d0,d1)."""
    def kernel(v, out):
        out[0, 0] = jnp.sum(v[:], dtype=jnp.float32)

    @jax.jit
    def run(v):
        grid = (E, H1 // R)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, R, W1) + shape4,
                                   lambda e, y: (e, y, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda e, y: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(v)
    return run


def main():
    enable_compilation_cache()
    cands = [
        ("lvl0 (48,80)", (48, 80)),
        ("lvl0 reshaped (30,128)", (30, 128)),
        ("lvl0 padded (48,128)", (48, 128)),
        ("packed all-lvls (40,128)", (40, 128)),
        ("lvl1 (24,40)", (24, 40)),
        ("lvl123 packed (24,128)", (24, 128)),
    ]
    for name, s4 in cands:
        v = jnp.zeros((E, H1, W1) + s4, jnp.bfloat16)
        run = make_stream(s4, R=3 if s4[0] * s4[1] >= 3000 else 6)
        r = run(v)
        float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(8):
            r = run(v)
        float(r[0, 0])
        dt = (time.perf_counter() - t0) / 8 * 1e3
        gb = E * H1 * W1 * s4[0] * s4[1] * 2 / 1e9
        print(f"{name:>28s}: {dt:7.2f} ms  {gb:5.2f} GB  "
              f"{gb/(dt/1e3):6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
