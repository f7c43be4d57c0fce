"""Fetch-synced per-stage breakdown of the tracking frontend.

On the axon remote-TPU platform, ``block_until_ready`` does NOT block;
only a host fetch (``np.asarray``) round-trips.  Each wrapped stage
fetches one scalar from its output, so a stage's time = (device queue
drain up to that output) + ~28 ms RTT.  Subtract the RTT per stage for
device-time estimates; the unsynced pass gives the true total.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.models import DroidNet
from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
from nerf_slam_tpu.utils.runtime import enable_compilation_cache

H, W = 336, 640
BUFFER = 24

STATS = defaultdict(list)
ENABLED = [False]


def _fetch_sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[0]))
            return


def wrap(fe, name):
    orig = getattr(fe, name)

    def timed(*args, **kw):
        if not ENABLED[0]:
            return orig(*args, **kw)
        t0 = time.perf_counter()
        out = orig(*args, **kw)
        _fetch_sync(out)
        STATS[name].append((time.perf_counter() - t0) * 1e3)
        return out

    setattr(fe, name, timed)


def build(params):
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=-1.0,
                         keyframe_thresh=-1.0)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    for name in ("_ingest", "_encode", "_store_frame_jit",
                 "_refresh_edges", "_update_n", "_gather_viz",
                 "_distance", "_append_inactive"):
        wrap(fe, name)
    return fe


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

    fe = build(params)
    t0 = time.time()
    for k in range(len(frames)):
        fe(k, frames[k])
    print(f"pass 1 (compile): {time.time()-t0:.1f}s", flush=True)

    # pass 2: per-frame fetch-synced total (true per-kf wall)
    fe = build(params)
    times = []
    for k in range(len(frames)):
        t0 = time.perf_counter()
        out = fe(k, frames[k])
        _fetch_sync(fe.state.cam_T_world)
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.array(times)
    steady = arr[12:-1]
    print(f"frame-synced steady-state: {steady.mean():.1f} ms/kf "
          f"-> {1000.0/steady.mean():.2f} kf/s", flush=True)

    # pass 3: stage-synced
    fe = build(params)
    ENABLED[0] = True
    t_frame = defaultdict(list)
    for k in range(len(frames)):
        STATS.clear()
        t0 = time.perf_counter()
        fe(k, frames[k])
        total = (time.perf_counter() - t0) * 1e3
        if k >= 12:
            for name, ts in STATS.items():
                t_frame[name].append((len(ts), sum(ts)))
            t_frame["TOTAL"].append((1, total))
    print("\nstage-(fetch)synced steady-state per keyframe "
          "(each stage includes ~28ms RTT):")
    for name, rows in sorted(t_frame.items(),
                             key=lambda kv: -np.mean([s for _, s in kv[1]])):
        calls = np.mean([c for c, _ in rows])
        ms = np.mean([s for _, s in rows])
        print(f"  {name:20s} {calls:4.1f} calls  {ms:7.1f} ms")


if __name__ == "__main__":
    main()
