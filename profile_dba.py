"""Isolate DBA stage costs on the TPU at frontend sizes.

Times each stage as a separate jit over synthetic inputs; dispatches are
queued back-to-back (async) and synchronized once, so the tunnel's
per-call latency amortizes across reps.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerf_slam_tpu.solver import dba
from nerf_slam_tpu.geometry import camera, se3
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

E, P, K, H, W = 96, 24, 28, 42, 80
HW = H * W
N = 24


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (N, 1))
    poses[:, :3] = 0.1 * rng.randn(N, 3)
    disps = np.clip(1.0 + 0.2 * rng.randn(N, H, W), 0.1, None)
    intr = np.tile(np.array([40.0, 40.0, W / 2, H / 2], np.float32),
                   (N, 1))
    ii = rng.randint(0, 16, E)
    jj = np.clip(ii + rng.randint(1, 4, E), 0, 15)
    p = dba.plan(ii, jj, 0, 16, E, P, K)
    targets = rng.randn(E, H, W, 2).astype(np.float32) * 2 + \
        camera.coords_grid(H, W)[None]
    weights = np.abs(rng.rand(E, H, W, 2)).astype(np.float32)
    eta = 0.05 * np.ones((K, H, W), np.float32)
    sens = np.zeros((K, H, W), np.float32)
    return (jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
            jnp.asarray(targets), jnp.asarray(weights), jnp.asarray(eta),
            jnp.asarray(sens), p)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:>28s}: {dt:8.3f} ms", flush=True)
    return dt


def main():
    enable_compilation_cache()
    poses, disps, intr, targets, weights, eta, sens, p = make_inputs()

    lin = jax.jit(lambda po, di: dba.linearize(po, di, intr, targets,
                                               weights, p))
    timeit("linearize", lin, poses, disps)

    def lin_asm(po, di):
        blocks = dba.linearize(po, di, intr, targets, weights, p)
        return dba.assemble(blocks, p, di, eta, sens)
    lin_asm_j = jax.jit(lin_asm)
    timeit("linearize+assemble", lin_asm_j, poses, disps)

    Hd, vd, Ehat, C, w = jax.jit(lin_asm)(poses, disps)
    Hd, vd, Ehat, C, w = map(jax.block_until_ready, (Hd, vd, Ehat, C, w))

    solve_d = jax.jit(lambda: dba.solve_system(Hd, vd, Ehat, C, w, p,
                                               E_blocks=None))
    timeit("solve_system(dense S)", solve_d)

    # cholesky + trisolve only
    RCM = jax.block_until_ready(
        jax.jit(lambda: Hd + jnp.eye(Hd.shape[0]) * 1.0)())

    chol = jax.jit(lambda A: jnp.linalg.cholesky(A))
    timeit("cholesky 144x144", chol, RCM)

    from jax.scipy.linalg import solve_triangular
    L = jax.block_until_ready(chol(RCM))

    tri = jax.jit(lambda L, b: solve_triangular(
        L.T, solve_triangular(L, b, lower=True), lower=False))
    timeit("2x trisolve", tri, L, vd)

    # dense schur contraction alone
    def schur(Ehat, C, w):
        Q = 1.0 / C
        EQ = Ehat * Q[None, :, None, :]
        S = jnp.einsum("pkdh,qkeh->pdqe", EQ, Ehat)
        vs = jnp.einsum("pkdh,kh->pd", EQ, w)
        return S, vs
    timeit("dense schur contraction", jax.jit(schur), Ehat, C, w)

    # full GN bodies
    for it in (1, 2):
        f = jax.jit(lambda po, di, it=it: dba.dba_iterations(
            po, di, intr, targets, weights, eta, sens, p, iters=it,
            compute_covariances=False, with_final=False))
        timeit(f"dba_iterations({it})", f, poses, disps)

    f = jax.jit(lambda po, di: dba.dba_iterations(
        po, di, intr, targets, weights, eta, sens, p, iters=2,
        compute_covariances=True))
    timeit("dba_iterations(2)+cov", f, poses, disps)

    cov = jax.jit(lambda L, Ehat: dba.covariances(L, Ehat, 1.0 / C, p))
    timeit("covariances", cov, L, Ehat)


if __name__ == "__main__":
    main()
