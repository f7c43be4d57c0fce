"""Split the per-frame ingest cost: encoders vs motion filter vs store.

The breakdown pass attributes ~70 ms/frame to ingest; this isolates the
BasicEncoder forwards (batch-1, 3-input-channel convs are the classic
MXU-underutilization case), the motion-filter magnitude (1-edge corr
volume + lookup + GRU), and the fused _ingest dispatch.

Run from the repo root: python bench/profile_ingest.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

H, W = 336, 640


def timeit(name, fn, reps=8):
    import jax
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(i % 4)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:>28s}: {ms:7.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    fe = RaftVisualFrontend(params, FrontendConfig(
        buffer=8, e_active=48, e_inactive=48, p_window=8, k_depth=12,
        motion_filter_thresh=2.4, keyframe_thresh=4.0), (H, W))

    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.randint(0, 255, (H, W, 3), np.uint8))
            for _ in range(4)]
    norms = [fe._normalize(np.asarray(i)) for i in imgs]
    gt16 = jnp.zeros((H, W), jnp.float16)
    small = jnp.asarray(np.zeros(23, np.float32))

    feat = jax.jit(lambda p, x: net.apply(p, x, method=DroidNet.features))
    ctx = jax.jit(lambda p, x: net.apply(p, x, method=DroidNet.context))

    timeit("feature encoder (1 img)", lambda i: feat(params, norms[i]))
    timeit("context encoder (1 img)", lambda i: ctx(params, norms[i]))

    # seed keyframe 0 so the motion filter has a reference frame
    f0 = feat(params, norms[0])[0]
    c0, ci0 = ctx(params, norms[0])
    st = fe.state
    fe.state = st._replace(
        features=st.features.at[0].set(f0.astype(jnp.bfloat16)),
        contexts=st.contexts.at[0].set(c0[0].astype(jnp.bfloat16)),
        cst_contexts=st.cst_contexts.at[0].set(
            ci0[0].astype(jnp.bfloat16)))

    mm = jax.jit(lambda p, fl, fc, c, ic: fe._motion_mag_inline(
        p, fl, fc, c, ic))
    timeit("motion magnitude (1 edge)", lambda i: mm(
        params, fe.state.features[0].astype(jnp.float32),
        feat(params, norms[i])[0], fe.state.contexts[0],
        fe.state.cst_contexts[0]))

    def ingest(i):
        st, mag = fe._ingest(fe.state, params, imgs[i], gt16, small,
                             jnp.int32(1), True, None)
        fe.state = st
        return mag

    timeit("fused _ingest (enc+motion)", ingest)


if __name__ == "__main__":
    main()
