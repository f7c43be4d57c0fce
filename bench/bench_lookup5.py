"""Lookup-kernel bandwidth floor + current-kernel timing at frontend
sizes (E=48, 42x80): a stripped Pallas kernel that only streams the four
slabs (sum-reduce, no selects) bounds what ANY slab-streaming lookup can
achieve; compare against the production grouped4 kernel."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_slam_tpu.ops import corr, corr_pallas
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

E, H1, W1 = 48, 42, 80


def floor_kernel(v0, v1, v2, v3, out):
    acc = jnp.zeros((), jnp.float32)
    for v in (v0, v1, v2, v3):
        acc = acc + jnp.sum(v[:], dtype=jnp.float32)
    out[0, 0] = acc


@jax.jit
def stream_floor(levels):
    R = 3
    grid = (E, H1 // R)
    specs = [pl.BlockSpec((1, R, W1, v.shape[-2], v.shape[-1]),
                          lambda e, y: (e, y, 0, 0, 0),
                          memory_space=pltpu.VMEM) for v in levels]
    return pl.pallas_call(
        floor_kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1), lambda e, y: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(*levels)


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, 128, H1, W1), jnp.float32)
    f2 = jnp.asarray(rng.randn(E, 128, H1, W1), jnp.float32)
    levels = tuple(corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8))
    nbytes = sum(int(np.prod(v.shape)) * 2 for v in levels)
    print(f"slab bytes: {nbytes/1e9:.3f} GB", flush=True)
    coords = jnp.asarray(
        rng.rand(E, H1, W1, 2) * np.array([W1 - 1, H1 - 1]), jnp.float32)
    dims = corr_pallas.pyramid_dims(H1, W1)

    def timed(name, fn, reps=8):
        r = fn()
        jax.block_until_ready(r)
        float(jnp.sum(r.ravel()[0]).astype(jnp.float32))
        outs = []
        t0 = time.perf_counter()
        for i in range(reps):
            outs.append(fn())
        float(jnp.asarray(outs[-1]).ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:>28s}: {dt:7.2f} ms "
              f"({nbytes/1e9/(dt/1e3):6.0f} GB/s)", flush=True)

    timed("stream floor (sum only)", lambda: stream_floor(levels))
    n48 = jnp.int32(48)
    timed("grouped4 gated n=48",
          lambda: corr_pallas.lookup_pyramid_grouped4_nhwc(
              levels, coords, dims, n_act=n48))
    timed("grouped4 ungated",
          lambda: corr_pallas.lookup_pyramid_grouped4_nhwc(
              levels, coords, dims))


if __name__ == "__main__":
    main()
