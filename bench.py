"""End-to-end benchmark: tracking + mapping keyframes/sec on one chip.

Runs the full pipeline (synthetic Replica-like sequence at ~340x640,
DROID-style frontend + PE-NeRF mapping) and reports keyframes/sec.  The
baseline is the reference paper's ~15 Hz keyframe throughput on two
RTX-class GPUs (BASELINE.md north star: >= 15 kf/s on one chip).

The HEADLINE (``value``) is the PRODUCTION policy: trained weights,
motion filter + keyframe rejection ON -- the configuration a user runs
(reference demo config README.md:117), with ATE riding along.  The
filters-off maximum-throughput figure is reported alongside it.

Output protocol (survives any budget): ONE JSON line is printed
IMMEDIATELY after the timed production pass, then RE-printed enriched
after each later phase -- the driver takes the last line, so a timeout
mid-phase still leaves a parseable headline behind.  Phases:

  0. sequential warm-up pass -- compiles every program (concurrent
     first-compiles from multiple threads stall the remote-TPU client);
  1. timed parallel pass on the SAME (reset) objects, so compiled
     executables are reused -> print headline JSON;
  2. filters-off maximum-throughput pass -> re-print;
  3. instrumented sequential pass with per-stage syncs -> re-print.

Budget: env BENCH_BUDGET_S (default 1200 s) -- later phases are skipped
when the elapsed time approaches it.
"""
import dataclasses
import json
import os
import sys
import time

BASELINE_KF_PER_S = 15.0

# operating resolution (<=341x640 nerf-dataset class); env overrides
# exist so the bench structure can be smoke-tested quickly on CPU
H = int(os.environ.get("BENCH_H", 336))
W = int(os.environ.get("BENCH_W", 640))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", 30))
BUFFER = int(os.environ.get("BENCH_BUFFER", 24))

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1200.0))


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def emit(out: dict) -> None:
    """(Re-)print the result line; the driver takes the LAST line."""
    print(json.dumps(out), flush=True)


def log(msg: str) -> None:
    print(f"[bench {time.time()-T_START:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def build_core(production: bool):
    """Frontend + fusion (the long-lived, jit-owning objects)."""
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig

    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    damping_kw = {}
    if production:
        from nerf_slam_tpu.utils.checkpoint import (load_arrays,
                                                    unflatten_into)
        wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "weights_synthetic.npz")
        flat, meta = load_arrays(wpath)
        params = unflatten_into(params, flat)
        mft, kft = 2.4, 4.0          # reference thresholds (BASELINE.md)
        # BA damping recipe rides the weights sidecar (training uses
        # 1.0*eta + 1e-4; the 0.2/1e-7 default belongs to droid.pth)
        for k in ("damping_scale", "damping_offset"):
            if k in meta:
                damping_kw[k] = float(meta[k])
    else:
        mft, kft = -1.0, -1.0        # take every frame
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=mft, keyframe_thresh=kft,
                         **damping_kw)
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


def timed_pass(frames, frontend, fusion, ate: bool):
    """Reset state, run the parallel pipeline, return throughput stats +
    per-keyframe dispatch/sync counts (VERDICT r3 #2: the number that
    decides everything on the tunneled link)."""
    import numpy as np
    from nerf_slam_tpu.pipeline.runner import run_parallel
    from nerf_slam_tpu.utils import runtime

    class Cached:
        def __len__(self):
            return len(frames)

        def __getitem__(self, k):
            return frames[k]

    frontend.reset()
    fusion.reset()
    modules, slam_m, fusion_m = build_modules(Cached(), frontend, fusion)
    sink = modules[-1]
    snap = runtime.dispatch_snapshot()
    t0 = time.time()
    run_parallel(modules, timeout_s=max(60.0, min(900.0, remaining())))
    wall = time.time() - t0
    delta = runtime.dispatch_delta(snap)

    n_kf = frontend.kf_idx + 1
    out = {
        "kf_per_s": round(n_kf / wall, 3),
        "n_keyframes": int(n_kf),
        "frames_in": len(frames),
        "wall_s": round(wall, 2),
        "ngp_iters": int(fusion.iteration),
        "slam_mean_ms": round(slam_m.stats()["mean_ms"], 1),
        "fusion_mean_ms": round(fusion_m.stats()["mean_ms"], 1),
        "dispatches_per_kf": round(delta["dispatch_total"] / n_kf, 2),
        "syncs_per_kf": round(delta["sync_total"] / n_kf, 2),
        "dispatch_breakdown": delta["dispatch"],
    }
    if ate and sink.last_full is not None:
        from nerf_slam_tpu.utils.evaluation import (ate_rmse,
                                                    trajectory_from_packet)
        est, gt = trajectory_from_packet(sink.last_full)
        if est.shape[0] >= 3 and np.isfinite(gt).all():
            out["ate_rmse_m"] = round(ate_rmse(est, gt), 4)
    return out


def breakdown_pass(frames, frontend, fusion, peak_flops):
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
        specs.get("ngp"), out["ngp10_ms"], peak_flops))
    return out


def utilization_estimate(update_spec, update_ms, ngp_spec, ngp10_ms,
                         peak_flops):
    """XLA cost-analysis FLOPs / measured time -> estimated chip
    utilization for the two hot programs, against the ACTUAL attached
    chip's peak (VERDICT r3 weak #3)."""
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
                100.0 * flops / (t_ms * 1e-3) / peak_flops, 2)
        except Exception:
            pass
    return out


def main():
    from nerf_slam_tpu.utils.runtime import (enable_compilation_cache,
                                             enable_compile_counting,
                                             compile_stats,
                                             device_peak_flops)
    enable_compilation_cache()
    enable_compile_counting()

    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.pipeline.runner import run_sequential

    verbose = bool(os.environ.get("BENCH_VERBOSE"))
    chip, peak = device_peak_flops()
    log(f"chip={chip} budget={BUDGET_S:.0f}s")

    ds = SyntheticDataset(SyntheticConfig(n_frames=N_FRAMES, height=H,
                                          width=W))
    # pre-render frames so dataset IO is out of both passes
    frames = [ds[k] for k in range(len(ds))]

    class Cached:
        def __len__(self):
            return len(frames)

        def __getitem__(self, k):
            return frames[k]

    wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "weights_synthetic.npz")
    production = os.path.exists(wpath)

    # phase 0: sequential warm-up (compiles everything, untimed)
    t0 = time.time()
    frontend, fusion = build_core(production=production)
    modules, *_ = build_modules(Cached(), frontend, fusion,
                                verbose=verbose)
    run_sequential(modules)
    warm_s = time.time() - t0
    log(f"warmup done in {warm_s:.1f}s ({compile_stats()})")

    # phase 1: timed PRODUCTION pass -> headline, printed immediately
    prod = timed_pass(frames, frontend, fusion, ate=production)
    detail = {
        "config": ("production: trained weights, motion filter 2.4px, "
                   "keyframe rejection 4.0" if production
                   else "filters off (weights file missing)"),
        "chip": chip,
        "peak_bf16_flops": peak,
        "warmup_s": round(warm_s, 2),
        **prod,
    }
    detail.update(compile_stats())
    out = {
        "metric": "synthetic-room 336x640 tracking+mapping keyframes/sec"
                  " (one chip, production policy)",
        "value": prod["kf_per_s"],
        "unit": "keyframes/s",
        "vs_baseline": round(prod["kf_per_s"] / BASELINE_KF_PER_S, 3),
        "detail": detail,
    }
    emit(out)

    # phase 2: filters-off maximum-throughput pass (the r1-r3 headline
    # config, kept for comparability; merged-update path compiles here)
    if production and remaining() > 240:
        log("phase 2: max-throughput (filters off)")
        try:
            frontend.cfg = dataclasses.replace(
                frontend.cfg, motion_filter_thresh=-1.0,
                keyframe_thresh=-1.0)
            frontend.reset()
            fusion.reset()
            modules, *_ = build_modules(Cached(), frontend, fusion)
            run_sequential(modules)          # warm the merged-path jits
            mt = timed_pass(frames, frontend, fusion, ate=False)
            detail["max_throughput"] = mt
            out["max_throughput_kf_per_s"] = mt["kf_per_s"]
            detail.update(compile_stats())
            emit(out)
        except Exception as e:
            log(f"phase 2 failed: {e!r}")

    # phase 3: per-stage breakdown (instrumented, synced -- not headline)
    if remaining() > 180:
        log("phase 3: per-stage breakdown")
        try:
            detail["breakdown"] = breakdown_pass(frames, frontend,
                                                 fusion, peak)
            detail.update(compile_stats())
            emit(out)
        except Exception as e:
            log(f"phase 3 failed: {e!r}")

    log(f"done in {time.time()-T_START:.1f}s")


if __name__ == "__main__":
    main()
