"""Isolate DBA stage costs on the TPU at frontend sizes.

Inputs vary per rep and syncing pulls one scalar (see _proftools) --
the remote tunnel dedupes identical dispatches and its
block_until_ready does not force execution, which silently turns
naive microbenchmarks into dispatch-latency measurements.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from _proftools import timeit
from nerf_slam_tpu.solver import dba
from nerf_slam_tpu.geometry import camera
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

E, P, K, H, W = 96, 24, 28, 42, 80
HW = H * W
N = 24


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (N, 1))
    poses[:, :3] = 0.1 * rng.randn(N, 3)
    disps = np.clip(1.0 + 0.2 * rng.randn(N, H, W), 0.1,
                    None).astype(np.float32)
    intr = np.tile(np.array([40.0, 40.0, W / 2, H / 2], np.float32),
                   (N, 1))
    targets = (rng.randn(E, H, W, 2) * 2 +
               np.asarray(camera.coords_grid(H, W))[None]
               ).astype(np.float32)
    weights = np.abs(rng.rand(E, H, W, 2)).astype(np.float32)
    return (jnp.asarray(poses.astype(np.float32)), jnp.asarray(disps),
            jnp.asarray(intr), jnp.asarray(targets), jnp.asarray(weights))


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(99)
    ii = rng.randint(0, 16, E)
    jj = np.clip(ii + rng.randint(1, 4, E), 0, 15)
    p = dba.plan(ii, jj, 0, 16, E, P, K)
    eta = jnp.asarray(0.05 * np.ones((K, H, W), np.float32))
    sens = jnp.asarray(np.zeros((K, H, W), np.float32))

    sets = {i: make_inputs(i + 1) for i in range(-1, 9)}

    def args_i(i):
        return sets[i]

    lin = jax.jit(lambda po, di, it, tg, wt: dba.linearize(
        po, di, it, tg, wt, p))
    timeit("linearize(cm)", lin, args_i)

    lin_ref = jax.jit(lambda po, di, it, tg, wt: dba._linearize_nhwc_ref(
        po, di, it, tg, wt, p))
    timeit("linearize(nhwc ref)", lin_ref, args_i)

    def lin_asm(po, di, it, tg, wt):
        blocks = dba.linearize(po, di, it, tg, wt, p)
        return dba.assemble(blocks, p, di, eta, sens)
    timeit("linearize+assemble", jax.jit(lin_asm), args_i)

    def full(po, di, it, tg, wt, iters, cov):
        return dba.dba_iterations(po, di, it, tg, wt, eta, sens, p,
                                  iters=iters, compute_covariances=cov,
                                  with_final=False)
    for iters in (1, 2):
        f = jax.jit(lambda po, di, it, tg, wt, n=iters: full(
            po, di, it, tg, wt, n, False))
        timeit(f"dba_iterations({iters})", f, args_i)
    f = jax.jit(lambda po, di, it, tg, wt: full(po, di, it, tg, wt, 2,
                                                True))
    timeit("dba_iterations(2)+cov", f, args_i)


if __name__ == "__main__":
    main()
