"""Per-segment wall-time profile of the tracking hot path on the TPU.

Builds the frontend at bench shapes, replays a synthetic sequence until
the graph is warm, then times each jitted segment (encode, motion
filter, edge refresh, fused update_n, distance, viz gather) and the NGP
train step.  Prints a ms-per-call table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def timeit(fn, n=5):
    import jax
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig

    H, W = 336, 640
    BUFFER = 24
    ds = SyntheticDataset(SyntheticConfig(n_frames=20, height=H, width=W))

    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=-1.0, keyframe_thresh=-1.0)
    fe = RaftVisualFrontend(params, cfg, (H, W))

    # replay frames through the state machine until initialized + steady
    print("warming state machine...", flush=True)
    t0 = time.time()
    for k in range(14):
        batch = ds[k]
        fe(k, batch)
        print(f"  frame {k} kf={fe.kf_idx} edges={fe.graph.n_edges} "
              f"({time.time()-t0:.1f}s)", flush=True)

    st, ed = fe.state, fe.edges
    batch = ds[14]
    img = np.ascontiguousarray(np.asarray(batch["images"])[..., :3])
    img_dev = jnp.asarray(img, jnp.uint8)

    res = {}
    res["encode"] = timeit(
        lambda: fe._encode(fe.params, fe._normalize_dev(img_dev)))
    enc = fe._encode(fe.params, fe._normalize_dev(img_dev))
    feat = enc[0].astype(jnp.float32)
    res["motion_mag"] = timeit(lambda: fe._motion_mag(
        fe.params, st.features[fe.last_kf_idx].astype(jnp.float32),
        feat, st.contexts[fe.last_kf_idx],
        st.cst_contexts[fe.last_kf_idx]))

    # distance (256-pad class, as used by proximity)
    ii = np.repeat(np.arange(10), 10)
    jj = np.tile(np.arange(10), 10)
    res["distance(100@256)"] = timeit(lambda: fe.distance(ii, jj))

    # edge refresh (worst case: all edges rebuilt)
    g = fe.graph
    n = g.n_edges
    Ea = cfg.e_active
    gather = np.zeros(Ea, np.int32)
    newm = np.zeros(Ea, np.int32)
    iip = np.zeros(Ea, np.int32)
    jjp = np.zeros(Ea, np.int32)
    iip[:n] = g.ii
    jjp[:n] = g.jj
    packed_r = jnp.asarray(np.concatenate([gather, newm, iip, jjp]))
    def run_refresh():
        fe.edges = fe._refresh_edges(fe.params, fe.state, fe.edges,
                                     packed_r)
        return fe.edges.flow
    res["refresh_edges"] = timeit(run_refresh, n=3)

    # fused update (the big one): n_iters=1 and 4
    def mk_packed(n_iters):
        Ea, Ei = cfg.e_active, cfg.e_inactive
        ii_all = np.zeros(Ea + Ei, np.int64)
        jj_all = np.zeros(Ea + Ei, np.int64)
        valid_all = np.zeros(Ea + Ei, bool)
        ii_all[:n] = g.ii
        jj_all[:n] = g.jj
        valid_all[:n] = True
        kf0 = max(0, int(g.ii.min()))
        kf1 = max(int(g.ii.max()), int(g.jj.max())) + 1
        pa = fe._slot_aligned_plan_np(ii_all, jj_all, valid_all, kf0, kf1)
        from nerf_slam_tpu.solver import dba
        L = pa["pair_a"].shape[0]
        packed = dba.pack_plan(pa, Ea + Ei, cfg.p_window, cfg.k_depth, L)
        prefix = np.zeros(fe._prefix_len(), np.int32)
        # tail layout (frontend._update_core): [n_iters, n_iters2, thr,
        # mthr, ingest_slot, seed_slot, d_a, d_b, seed_next, t_g,
        # kf0_g, kf1_g]
        return jnp.asarray(np.concatenate(
            [prefix, packed,
             np.array([n_iters, 0, 0, 0, 0, -1, 0, 1, -1, 0, 0, -1],
                      np.int32)]))

    import jax.tree_util as jtu

    def run_update(n_iters):
        pk = mk_packed(n_iters)
        s, e, ia, rms, _, _, _, _ = fe._update_n(fe.params, fe.state,
                                              fe.edges, fe.inactive, pk)
        fe.state, fe.edges, fe.inactive = s, e, ia
        return rms

    res["update_n(1)"] = timeit(lambda: run_update(1), n=3)
    res["update_n(4)"] = timeit(lambda: run_update(4), n=3)
    res["update_n(2)"] = timeit(lambda: run_update(2), n=3)

    sel = np.arange(16, dtype=np.int32)
    res["gather_viz(16)"] = timeit(
        lambda: fe._gather_viz(fe.state, jnp.asarray(sel)))

    print()
    for k, v in res.items():
        print(f"{k:>20s}   {v:8.1f} ms")
    print(flush=True)

    # NGP train step
    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
    fu = NerfFusion(NerfFusionConfig(buffer=BUFFER, height=H, width=W,
                                     batch_rays=4096, iters_per_spin=10),
                    seed=0)
    fe.viz_idx[: fe.kf_idx] = True
    pkt = fe.get_viz_out(dict(batch, is_last_frame=False))
    fu.fuse(pkt)
    res["ngp_fit(10 iters)"] = timeit(lambda: fu.fit_volume(), n=3)

    print()
    print(f"{'segment':>20s}   ms/call")
    for k, v in res.items():
        print(f"{k:>20s}   {v:8.1f}")
    tot = (res["encode"] + res["motion_mag"] + res["refresh_edges"]
           + res["update_n(4)"] + res["update_n(2)"]
           + 2 * res["distance(100@256)"] + res["gather_viz(16)"])
    print(f"\nper-keyframe tracking estimate: {tot:.0f} ms "
          f"-> {1000.0 / tot:.2f} kf/s (excl. mapping)")


if __name__ == "__main__":
    main()
