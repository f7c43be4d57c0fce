"""NGP train-step internals: sampling (incl. the per-ray sort) vs MLP
forward vs full value_and_grad step.

The step measures ~17 ms at 4096 rays x 128 samples; the bf16 MLP alone
should run in ~4-6 ms, so this isolates where the rest goes.

Run from the repo root: python bench/profile_ngp5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, reps=10):
    import jax
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(i % 4)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:>34s}: {ms:7.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.fusion.ngp import (NGPConfig, init_ngp, query,
                                          render_rays, sample_along_rays)
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfg = NGPConfig()
    R = 4096
    S = cfg.n_uniform + cfg.n_depth
    params, field = init_ngp(jax.random.PRNGKey(0), cfg)
    keys = [jax.random.PRNGKey(i) for i in range(4)]
    rng = np.random.RandomState(0)
    origins = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 0.2 + 0.4)
    dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    depth = jnp.asarray(0.3 + 0.2 * rng.rand(R).astype(np.float32))
    valid = jnp.ones((R,), jnp.float32)

    samp = jax.jit(lambda k: sample_along_rays(k, origins, dirs, depth,
                                               valid, cfg))
    timeit("sample_along_rays (sort)", lambda i: samp(keys[i]))

    def samp_nosort(k):
        t = sample_along_rays(k, origins, dirs, depth, valid, cfg)
        return t        # includes the sort; compare against below

    su = jax.jit(lambda k: jax.random.uniform(k, (R, S)) * 1.1 + 0.05)
    timeit("unsorted sample (control)", lambda i: su(keys[i]))

    t0 = jax.block_until_ready(samp(keys[0]))
    fwd = jax.jit(lambda t: render_rays(params, field, cfg, origins,
                                        dirs, t)[0])
    timeit("render_rays forward", lambda i: fwd(t0 + i * 1e-6))

    qry = jax.jit(lambda p: query(params, field, cfg,
                                  p, jnp.broadcast_to(
                                      jnp.asarray([0., 0., 1.]),
                                      p.shape))[0])
    pos = jnp.asarray(rng.rand(R * S, 3).astype(np.float32))
    timeit("MLP query fwd (R*S pts)", lambda i: qry(pos + i * 1e-6))

    def loss(params, t):
        rgb, d, acc, _ = render_rays(params, field, cfg, origins, dirs,
                                     t)
        return jnp.mean(rgb ** 2) + jnp.mean(d ** 2)

    grad = jax.jit(jax.grad(loss))
    timeit("render grad (fwd+bwd)", lambda i: grad(params, t0 + i * 1e-6))

    full = jax.jit(lambda k: jax.grad(loss)(
        params, sample_along_rays(k, origins, dirs, depth, valid, cfg)))
    timeit("sort + grad (full-ish step)", lambda i: full(keys[i]))


if __name__ == "__main__":
    main()
