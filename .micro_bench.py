"""Micro-benchmark of the fused update's components at bench shapes
(run on TPU after bench finishes, to target optimization/Pallas work)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nerf_slam_tpu.utils.runtime as rt
rt.enable_compilation_cache()

from nerf_slam_tpu.geometry import camera, se3
from nerf_slam_tpu.solver import dba
from nerf_slam_tpu.ops import corr
from nerf_slam_tpu.models import DroidNet

H, W = 336, 640
h, w = H // 8, W // 8
B, Ea, Ei = 24, 48, 48
P, K = 24, 28

key = jax.random.PRNGKey(0)
poses = se3.exp(0.02 * jax.random.normal(key, (B, 6)))
disps = 0.8 * jnp.ones((B, h, w))
intr = jnp.tile(jnp.array([[80.0, 80.0, w / 2, h / 2]]), (B, 1))

rng = np.random.RandomState(0)
ii = rng.randint(0, 20, Ea + Ei)
jj = (ii + 1 + rng.randint(0, 3, Ea + Ei)) % 21
plan = dba.plan(ii, jj, 0, 21, E=Ea + Ei, P=P, K=K)
targets = jnp.zeros((Ea + Ei, h, w, 2)) + camera.coords_grid(h, w)
weights = 0.9 * jnp.ones_like(targets)
eta = 1e-4 * jnp.ones((K, h, w))
sens = jnp.zeros((K, h, w))


def timeit(name, fn, *args, n=5):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)


lin = jax.jit(lambda po, di: dba.linearize(po, di, intr, targets,
                                           weights, plan))
timeit("linearize (96 edges)", lin, poses, disps)


def full_iter(po, di):
    blocks = dba.linearize(po, di, intr, targets, weights, plan)
    Hd, vd, Ehat, C, wv = dba.assemble(blocks, plan, di, eta, sens)
    dx, dz, L, Q = dba.solve_system(Hd, vd, Ehat, C, wv, plan,
                                    E_blocks=blocks[2])
    return dx, dz


timeit("linearize+assemble+solve", jax.jit(full_iter), poses, disps)


def with_cov(po, di):
    blocks = dba.linearize(po, di, intr, targets, weights, plan)
    Hd, vd, Ehat, C, wv = dba.assemble(blocks, plan, di, eta, sens)
    _, _, L, Q = dba.solve_system(Hd, vd, Ehat, C, wv, plan,
                                  E_blocks=blocks[2])
    return dba.covariances(L, Ehat, Q, plan)


timeit("  + covariances", jax.jit(with_cov), poses, disps)

res = jax.jit(lambda po, di: dba.dba_iterations(
    po, di, intr, targets, weights, eta, sens, plan, iters=2))
timeit("dba_iterations(2)+cov", res, poses, disps)

# corr lookup at active size
f1 = jax.random.normal(key, (Ea, 128, h, w), dtype=jnp.bfloat16)
vol_build = jax.jit(lambda a, b: corr.build_pyramid(corr.build_volume(a, b)))
levels = jax.block_until_ready(vol_build(f1, f1))
timeit("corr volume build (48 edges)", vol_build, f1, f1)

coords = jnp.broadcast_to(camera.coords_grid(h, w), (Ea, h, w, 2))
lookup = jax.jit(lambda lv, c: corr.CorrPyramid(list(lv))(c))
timeit("corr lookup 4 levels (48 edges)", lookup, levels, coords)

# GRU update at active size
net = DroidNet(dtype=jnp.bfloat16)
params = net.init(key, jnp.zeros((1, H, W, 3)), jnp.zeros((1, h, w, 128)),
                  jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 196)),
                  jnp.zeros((1, h, w, 4)), jnp.array([0]), 1)
hidden = jnp.zeros((Ea, h, w, 128), jnp.bfloat16)
ctx = jnp.zeros((Ea, h, w, 128), jnp.bfloat16)
cvals = jnp.zeros((Ea, h, w, 196), jnp.bfloat16)
motion = jnp.zeros((Ea, h, w, 4), jnp.bfloat16)
seg = jnp.asarray(np.arange(Ea) % K)
gru = jax.jit(lambda p, n_, c_, cv, m: net.apply(
    p, n_, c_, cv, m, seg, K, False, method=DroidNet.update))
timeit("GRU update (48 edges)", gru, params, hidden, ctx, cvals, motion)

enc = jax.jit(lambda p, x: net.apply(p, x, method=DroidNet.features))
img = jnp.zeros((1, H, W, 3))
timeit("feature encoder (1 frame)", enc, params, img)
print("done", flush=True)
