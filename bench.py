"""End-to-end benchmark: tracking + mapping keyframes/sec on one chip.

Runs the full pipeline (synthetic Replica-like sequence at ~340x640,
DROID-style frontend + PE-NeRF mapping) and reports keyframes/sec.  The
baseline is the reference paper's ~15 Hz keyframe throughput on two
RTX-class GPUs (BASELINE.md north star: >= 15 kf/s on one chip).

Phases:
  0. sequential warm-up pass -- compiles every program (concurrent
     first-compiles from multiple threads stall the remote-TPU client);
  1. timed parallel pass on the SAME (reset) objects, so compiled
     executables are reused -- every jit keys on the instance, and the
     deployment shape is one long-lived instance;
  2. instrumented sequential pass with per-stage syncs: per-keyframe
     ingest / update / fusion-ingest / NGP-step milliseconds, plus an
     XLA cost-analysis FLOP count -> estimated MXU utilization.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"detail": {..., per-stage breakdown}}.
"""
import json
import os
import sys
import time

BASELINE_KF_PER_S = 15.0
V5E_PEAK_BF16 = 197e12          # TPU v5e peak bf16 FLOP/s (one chip)

H, W = 336, 640          # nerf-dataset operating resolution (<=341x640)
N_FRAMES = 30
BUFFER = 24


def build_core():
    """Frontend + fusion (the long-lived, jit-owning objects)."""
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig

    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=-1.0,   # take every frame:
                         keyframe_thresh=-1.0,        # measures full path
                         )
    frontend = RaftVisualFrontend(params, cfg, (H, W))
    fusion = NerfFusion(NerfFusionConfig(
        buffer=BUFFER, height=H, width=W, batch_rays=4096,
        iters_per_spin=10), seed=0)
    return frontend, fusion


def build_modules(ds, frontend, fusion, verbose=False):
    from nerf_slam_tpu.pipeline.modules import (DataModule, EvalSink,
                                                FusionModule, SlamModule)
    from nerf_slam_tpu.pipeline.runner import connect

    data_m = DataModule(ds)
    slam_m = SlamModule(frontend)
    fusion_m = FusionModule(fusion, mode="nerf", extra_spins_after_done=5)
    sink = EvalSink()
    connect(data_m, slam_m, "data")
    connect(slam_m, sink, "slam")
    connect(slam_m, fusion_m, "slam")
    modules = [data_m, slam_m, fusion_m, sink]

    if verbose:
        t0 = time.time()
        slam_m.register_output_callback(
            lambda pkt: print(
                f"[{time.time()-t0:7.1f}s] kf={frontend.kf_idx} "
                f"ngp_it={fusion.iteration}", flush=True))
    return modules, slam_m, fusion_m


def breakdown_pass(frames, frontend, fusion):
    """Sequential instrumented pass: per-stage wall ms with a sync after
    each stage (syncing distorts totals, so this pass is NOT the
    headline -- it answers 'where does the time go')."""
    import jax
    import numpy as np

    frontend.reset()
    fusion.reset()
    t_ingest, t_update, t_fuse, t_ngp10 = [], [], [], []
    specs = {}

    orig_update_n = frontend._update_n
    orig_scan = fusion._train_scan

    def spec_of(x):
        return (jax.ShapeDtypeStruct(x.shape, x.dtype)
                if isinstance(x, jax.Array) else x)

    def timed_update_n(*a, **kw):
        if "update" not in specs:
            specs["update"] = (orig_update_n, frontend,
                               jax.tree.map(spec_of, a),
                               jax.tree.map(spec_of, kw))
        t0 = time.perf_counter()
        out = orig_update_n(*a, **kw)
        jax.block_until_ready(out[0].cam_T_world)
        t_update.append(time.perf_counter() - t0)
        return out

    def spying_scan(*a, **kw):
        if "ngp" not in specs:
            specs["ngp"] = (orig_scan, fusion,
                            jax.tree.map(spec_of, a),
                            jax.tree.map(spec_of, kw))
        return orig_scan(*a, **kw)

    frontend._update_n = timed_update_n
    fusion._train_scan = spying_scan
    try:
        for k, pkt in enumerate(frames):
            pkt = dict(pkt)
            pkt["k"] = k
            pkt["is_last_frame"] = k == len(frames) - 1
            n_upd0 = len(t_update)
            t0 = time.perf_counter()
            out = frontend(k, pkt)
            t_all = time.perf_counter() - t0
            # ingest ~= everything outside the timed update dispatches
            t_ingest.append(t_all - sum(t_update[n_upd0:]))
            if out is not None and "cam0_poses" in out:
                t0 = time.perf_counter()
                fusion.fuse(out)
                jax.block_until_ready(fusion.train_set.images)
                t_fuse.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                loss = fusion.fit_volume(10)
                jax.block_until_ready(loss)
                t_ngp10.append(time.perf_counter() - t0)
    finally:
        frontend._update_n = orig_update_n
        fusion._train_scan = orig_scan

    ms = lambda xs: round(1e3 * float(np.mean(xs)), 1) if xs else 0.0
    # steady-state update cost: skip the two init updates (8+8 iters)
    upd_steady = t_update[2:] if len(t_update) > 2 else t_update
    out = {
        "ingest_ms": ms(t_ingest),
        "update_ms": ms(upd_steady),
        "update_init_ms": ms(t_update[:2]),
        "fusion_ingest_ms": ms(t_fuse),
        "ngp10_ms": ms(t_ngp10),
        "n_updates": len(t_update),
    }
    out.update(utilization_estimate(
        specs.get("update"), out["update_ms"],
        specs.get("ngp"), out["ngp10_ms"]))
    return out


def utilization_estimate(update_spec, update_ms, ngp_spec, ngp10_ms):
    """XLA cost-analysis FLOPs / measured time -> estimated chip
    utilization for the two hot programs (VERDICT r2 missing #2: at
    1.85 kf/s nobody could say if the chip was 2% or 60% busy)."""
    import jax
    out = {}
    for name, spec, t_ms in (("update", update_spec, update_ms),
                             ("ngp10", ngp_spec, ngp10_ms)):
        if spec is None or not t_ms:
            continue
        fn, inst, args, kwargs = spec
        try:
            # .lower on a jit-wrapped METHOD does not bind self -- pass
            # the instance explicitly (self is a static argnum).
            cost = (fn.lower(inst, *args, **kwargs).compile()
                    .cost_analysis())
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops = float(cost.get("flops", 0.0))
            out[f"{name}_gflops"] = round(flops / 1e9, 1)
            out[f"{name}_util_pct"] = round(
                100.0 * flops / (t_ms * 1e-3) / V5E_PEAK_BF16, 1)
        except Exception:
            pass
    return out


def production_phase(frames, frontend, fusion, weights_path):
    """Production-policy phase: trained weights + motion filter +
    keyframe rejection ENABLED (VERDICT r2 #3: the bench must measure
    the real configuration, with quality riding along).

    Reuses the SAME frontend/fusion instances so phase-0's compiled
    executables are reused: params is a traced jit argument (same pytree
    shapes, no recompile) and both thresholds are host-side floats.
    Only the rejection branches (rm_keyframe roll, light-update reject)
    compile anew, in this phase's own warm-up pass.
    """
    import dataclasses

    import numpy as np

    from nerf_slam_tpu.pipeline.runner import run_parallel, run_sequential
    from nerf_slam_tpu.utils.checkpoint import load_arrays, unflatten_into
    from nerf_slam_tpu.utils.evaluation import (ate_rmse,
                                                trajectory_from_packet)

    flat, _ = load_arrays(weights_path)
    frontend.params = unflatten_into(frontend.params, flat)
    frontend.cfg = dataclasses.replace(
        frontend.cfg, motion_filter_thresh=2.4, keyframe_thresh=4.0)

    class Cached:
        def __len__(self):
            return len(frames)

        def __getitem__(self, k):
            return frames[k]

    # warm-up (compiles the rejection-path programs), then timed pass
    frontend.reset()
    fusion.reset()
    modules, *_ = build_modules(Cached(), frontend, fusion)
    run_sequential(modules)

    frontend.reset()
    fusion.reset()
    modules, slam_m, fusion_m = build_modules(Cached(), frontend, fusion)
    sink = modules[-1]
    t0 = time.time()
    run_parallel(modules, timeout_s=1800.0)
    wall = time.time() - t0

    n_kf = frontend.kf_idx + 1
    out = {
        "kf_per_s": round(n_kf / wall, 3),
        "n_keyframes": int(n_kf),
        "frames_in": len(frames),
        "wall_s": round(wall, 2),
        "ngp_iters": int(fusion.iteration),
        "slam_mean_ms": round(slam_m.stats()["mean_ms"], 1),
        "fusion_mean_ms": round(fusion_m.stats()["mean_ms"], 1),
    }
    if sink.last_full is not None:
        est, gt = trajectory_from_packet(sink.last_full)
        if est.shape[0] >= 3 and np.isfinite(gt).all():
            out["ate_rmse_m"] = round(ate_rmse(est, gt), 4)
    return out


def main():
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.pipeline.runner import run_parallel, run_sequential

    verbose = bool(os.environ.get("BENCH_VERBOSE"))
    ds = SyntheticDataset(SyntheticConfig(n_frames=N_FRAMES, height=H,
                                          width=W))
    # pre-render frames so dataset IO is out of both passes
    frames = [ds[k] for k in range(len(ds))]

    class Cached:
        def __len__(self):
            return len(frames)

        def __getitem__(self, k):
            return frames[k]

    cds = Cached()

    # phase 0: sequential warm-up (compiles everything, untimed)
    t0 = time.time()
    frontend, fusion = build_core()
    modules, *_ = build_modules(cds, frontend, fusion, verbose=verbose)
    run_sequential(modules)
    warm_s = time.time() - t0
    if verbose:
        print(f"warmup done in {warm_s:.1f}s", flush=True)

    # phase 1: timed parallel pass, SAME core objects with fresh state
    # (compiled executables are reused -- jits key on the instance)
    frontend.reset()
    fusion.reset()
    modules, slam_m, fusion_m = build_modules(cds, frontend, fusion,
                                              verbose=verbose)
    t0 = time.time()
    run_parallel(modules, timeout_s=1800.0)
    wall = time.time() - t0

    n_kf = frontend.kf_idx + 1
    kf_per_s = n_kf / wall
    detail = {
        "n_keyframes": int(n_kf),
        "wall_s": round(wall, 2),
        "warmup_s": round(warm_s, 2),
        "ngp_iters": int(fusion.iteration),
        "slam_mean_ms": round(slam_m.stats()["mean_ms"], 1),
        "fusion_mean_ms": round(fusion_m.stats()["mean_ms"], 1),
    }

    # phase 2: per-stage breakdown (instrumented, synced -- not headline)
    detail.update(breakdown_pass(frames, frontend, fusion))

    # phase 3: production policy (trained weights, filters ON, ATE)
    wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "weights_synthetic.npz")
    if os.path.exists(wpath):
        detail["production"] = production_phase(frames, frontend, fusion,
                                                wpath)

    out = {
        "metric": "synthetic-room 336x640 tracking+mapping keyframes/sec"
                  " (one chip, steady state)",
        "value": round(kf_per_s, 3),
        "unit": "keyframes/s",
        "vs_baseline": round(kf_per_s / BASELINE_KF_PER_S, 3),
        "detail": detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
