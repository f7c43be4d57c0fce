"""In-situ component costs: compile update_n variants and compare.

The tunnel adds ~30-40 ms per host sync and distorts standalone
micro-benchmarks, so components are measured as DIFFERENCES between
fused update_n compilations:
  - n_iters marginal    -> one (lookup + GRU + DBA) iteration
  - onehot vs pallas    -> lookup cost
  - gn_iters 1 vs 2     -> one DBA Gauss-Newton step
  - covariances on/off  -> covariance extraction cost
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_frontend(cfg_kwargs):
    import jax
    import jax.numpy as jnp
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig

    H, W = 336, 640
    BUFFER = 24
    ds = SyntheticDataset(SyntheticConfig(n_frames=16, height=H, width=W))
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=-1.0, keyframe_thresh=-1.0,
                         **cfg_kwargs)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    for k in range(13):
        fe(k, ds[k])
    return fe


def time_update(fe, n_iters, reps=6):
    import jax
    import jax.numpy as jnp
    from nerf_slam_tpu.solver import dba
    g = fe.graph
    cfg = fe.cfg
    Ea, Ei = cfg.e_active, cfg.e_inactive
    n = g.n_edges
    ii_all = np.zeros(Ea + Ei, np.int64)
    jj_all = np.zeros(Ea + Ei, np.int64)
    valid_all = np.zeros(Ea + Ei, bool)
    ii_all[:n] = g.ii
    jj_all[:n] = g.jj
    valid_all[:n] = True
    kf0 = max(0, int(g.ii.min()))
    kf1 = max(int(g.ii.max()), int(g.jj.max())) + 1
    pa = fe._slot_aligned_plan_np(ii_all, jj_all, valid_all, kf0, kf1)
    L = pa["pair_a"].shape[0]
    packed = dba.pack_plan(pa, Ea + Ei, cfg.p_window, cfg.k_depth, L)
    prefix = np.zeros(fe._prefix_len(), np.int32)
    # tail layout (frontend._update_core): [n_iters, n_iters2, thr,
    # mthr, ingest_slot, seed_slot, d_a, d_b, seed_next, t_g, kf0_g,
    # kf1_g]
    pk = jnp.asarray(np.concatenate(
        [prefix, packed,
         np.array([n_iters, 0, 0, 0, 0, -1, 0, 1, -1, 0, 0, -1],
                  np.int32)]))

    def run():
        s, e, ia, rms, _, _, _, _ = fe._update_n(
            fe.params, fe.state, fe.edges, fe.inactive, pk)
        fe.state, fe.edges, fe.inactive = s, e, ia
        return rms

    float(run())  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        rms = run()
    float(rms)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    res = {}
    import gc
    import os
    variants = [
        ("baseline", dict()),
        ("skip_lookup", dict(debug_skip_lookup=True)),
        ("cheap_lookup", dict(debug_skip_lookup="cheap")),
        ("skip_gru", dict(debug_skip_gru=True)),
        ("skip_dba", dict(debug_skip_dba=True)),
        ("gn1", dict(gn_iters=1)),
        ("no_cov", dict(compute_covariances=False)),
    ]
    sel = os.environ.get("VARIANTS")
    if sel:
        want = sel.split(",")
        variants = [v for v in variants if v[0] in want]
    for name, kwargs in variants:
        t0 = time.time()
        fe = None
        gc.collect()
        import jax
        jax.clear_caches()   # method jits key on static self: drop refs
        fe = build_frontend(kwargs)
        t1 = time_update(fe, 1)
        t4 = time_update(fe, 4)
        res[name] = (t1, t4, (t4 - t1) / 3)
        print(f"{name:>20s}: n=1 {t1:7.1f}  n=4 {t4:7.1f}  "
              f"per-iter {(t4-t1)/3:6.1f} ms   "
              f"[setup {time.time()-t0:.0f}s]", flush=True)

    for k, v in res.items():
        print(f"  {k:<12s}: n1 {v[0]:6.1f}  per-iter {v[2]:6.1f} ms")


if __name__ == "__main__":
    main()
