"""Standalone lookup-kernel shootout at frontend sizes (E=48, 42x80)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerf_slam_tpu.ops import corr, corr_pallas
from nerf_slam_tpu.utils.runtime import enable_compilation_cache


RTT_MS = None


def measure_rtt():
    """Tunnel round-trip: block_until_ready is optimistic through axon,

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
    so all timing fetches a scalar; subtract the fetch round-trip."""
    global RTT_MS
    x = jnp.ones((8,))
    f = jax.jit(lambda v: jnp.sum(v))
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    RTT_MS = float(np.median(ts))
    print(f"tunnel RTT ~ {RTT_MS:.1f} ms", flush=True)


_SUM = None


def bench(fn, coords, reps=10):
    """Sequential dispatches (they pipeline; ~2 ms submit overhead
    each), one scalar fetch at the end; time = (total - RTT) / reps."""
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda o: jnp.sum(o[:, ::8, ::8, 0]))
    j = jax.jit(fn)
    float(_SUM(j(coords)))         # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = j(coords)
    v = float(_SUM(out))
    dt = (time.perf_counter() - t0) * 1e3 - RTT_MS
    assert np.isfinite(v)
    return dt / reps


def main():
    enable_compilation_cache()
    measure_rtt()
    E, C, H, W = 48, 128, 42, 80
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.2)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.2)
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W - 1, H - 1])).astype(
            np.float32))
    dims = corr_pallas.pyramid_dims(H, W)

    lv1 = jax.jit(lambda a, b: tuple(
        corr.build_pyramid_bf16(a, b, 1, pad_rows_to=8)))(f1, f2)
    lv4 = jax.jit(lambda a, b: tuple(
        corr.build_pyramid_bf16(a, b, 4, pad_rows_to=8)))(f1, f2)

    t_l0 = bench(
        lambda c: corr_pallas.lookup_pyramid_l0_nhwc(lv1[0], c, dims),
        coords)
    print(f"l0 single-slab (current default): {t_l0:6.1f} ms", flush=True)

    t_g4 = bench(
        lambda c: corr_pallas.lookup_pyramid_grouped4_nhwc(lv4, c, dims),
        coords)
    print(f"grouped4 pooled slabs:            {t_g4:6.1f} ms", flush=True)

    t_p4 = bench(
        lambda c: corr_pallas.lookup_pyramid_pallas_nhwc(lv4, c), coords)
    print(f"per-pixel 4-slab:                 {t_p4:6.1f} ms", flush=True)

    # correctness spot-check on device
    a = corr_pallas.lookup_pyramid_l0_nhwc(lv1[0], coords, dims)
    b = corr_pallas.lookup_pyramid_grouped4_nhwc(lv4, coords, dims)
    err = float(jnp.abs(a - b).max())
    print(f"max |l0 - grouped4| = {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
