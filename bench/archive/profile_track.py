"""Wall time per keyframe for the tracking frontend alone (no fusion),
with a per-segment breakdown from a second instrumented pass."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.models import DroidNet
from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

H, W = 336, 640
BUFFER = 24


def main():
    enable_compilation_cache()
    ds = SyntheticDataset(SyntheticConfig(n_frames=22, height=H, width=W))
    frames = [ds[k] for k in range(len(ds))]
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)

    def build():
        cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                             p_window=BUFFER, k_depth=BUFFER + 4,
                             motion_filter_thresh=-1.0,
                             keyframe_thresh=-1.0)
        return RaftVisualFrontend(params, cfg, (H, W))

    fe = build()
    t0 = time.time()
    for k in range(len(frames)):
        fe(k, frames[k])
    print(f"pass 1 (compile): {time.time()-t0:.1f}s", flush=True)

    fe = build()
    times = []
    for k in range(len(frames)):
        t0 = time.perf_counter()
        fe(k, frames[k])
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.array(times)
    steady = arr[12:-1]
    print("per-frame ms:", np.array2string(arr, precision=0), flush=True)
    print(f"steady-state mean {steady.mean():.1f} ms/kf "
          f"-> {1000.0/steady.mean():.2f} kf/s (tracking only)",
          flush=True)


if __name__ == "__main__":
    main()
