"""nerf_slam_tpu SLAM demo CLI.

Flag-compatible rebuild of the reference entry point
(/root/reference/examples/slam_demo.py:20-60): dataset selection, buffer,
stride, fusion mode, parallel vs sequential spin.  TPU replaces the
two-GPU split: tracking and mapping share one chip with async dispatch
instead of CPU-bounced queues.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="nerf_slam_tpu demo")
    p.add_argument("--dataset_dir", type=str, default=None,
                   help="path to dataset (None -> synthetic room)")
    p.add_argument("--dataset_name", type=str, default="synthetic",
                   choices=["synthetic", "nerf", "replica", "tum",
                            "euroc", "realsense"])
    p.add_argument("--buffer", type=int, default=32,
                   help="max keyframes")
    p.add_argument("--img_stride", type=int, default=1)
    p.add_argument("--initial_k", type=int, default=0)
    p.add_argument("--final_k", type=int, default=-1)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--rgbd", action="store_true",
                   help="seed metric sensed depths from packet depths "
                        "(reference cam0_idepths_sensed path for "
                        "TUM/RealSense RGB-D, visual_frontend.py:598-602)")
    p.add_argument("--vio", action="store_true",
                   help="visual-inertial: wrap the frontend in VioSLAM "
                        "and feed imu_t0_t1 packets to the inertial "
                        "frontend (reference slam/vio_slam.py)")
    p.add_argument("--weights", type=str, default=None,
                   help="droid.pth checkpoint (torch) to convert")
    p.add_argument("--fusion", type=str, default="nerf",
                   choices=["nerf", "sigma", "tsdf", "none"])
    p.add_argument("--mask_type", type=str, default="ours",
                   choices=["ours", "raw", "ours_w_thresh", "no_depth"],
                   help="depth-uncertainty masking ablation (reference "
                        "fusion/nerf_fusion.py:173-183)")
    p.add_argument("--fit_iters", type=int, default=0,
                   help="continue mapping to this TOTAL iteration count "
                        "after the sequence ends (convergence-horizon "
                        "runs; reference evaluates to 25k iters)")
    p.add_argument("--eval_every", type=int, default=200,
                   help="iterations between online-eval rows under "
                        "--eval (reference :304-306)")
    p.add_argument("--eval_views", type=int, default=8)
    p.add_argument("--parallel_run", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--gui", action="store_true",
                   help="headless render dumps instead of a window")
    p.add_argument("--viewer_port", type=int, default=0,
                   help="with --gui: serve a live HTTP viewer on this "
                        "port (latest keyframe/depth/sigma/render "
                        "JPEGs, trajectory, point cloud, and M/N/A/S/T "
                        "command back-channel)")
    p.add_argument("--device_split", action="store_true",
                   help="pin mapping to a second TPU device (the "
                        "reference's two-GPU tracking||mapping split, "
                        "slam_demo.py:63-71); handoff rides ICI")
    p.add_argument("--viz_out", type=str, default="viz_out",
                   help="directory for headless GUI exports")
    p.add_argument("--out", type=str, default="results.csv")
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--n_frames", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--global_ba", action="store_true",
                   help="run global bundle adjustment at termination")
    p.add_argument("--edge_shards", type=int, default=1,
                   help="shard the fused GRU+DBA update over this many "
                        "devices (edge-axis shard_map; e_active and "
                        "e_inactive must divide it)")
    p.add_argument("--profile", action="store_true",
                   help="write a JAX profiler trace around the run")
    return p.parse_args(argv)


def build_dataset(args):
    from ..datasets import build_dataset as factory
    return factory(args.dataset_name, args.dataset_dir,
                   n_frames=args.n_frames, height=args.height,
                   width=args.width, initial_k=args.initial_k,
                   final_k=args.final_k, buffer=args.buffer,
                   stereo=getattr(args, "stereo", False),
                   imu=getattr(args, "vio", False))


def build_frontend(args, image_size):
    import jax
    import jax.numpy as jnp
    from ..models import DroidNet, weights as W
    from ..tracking import RaftVisualFrontend, FrontendConfig

    H, Wd = image_size
    h, w = H // 8, Wd // 8
    net = DroidNet(dtype=jnp.bfloat16)
    damping_kw = {}
    if args.weights and args.weights.endswith(".npz"):
        # nerf_slam_tpu-native checkpoint (e.g. from
        # scripts/train_droid_synthetic.py)
        from ..utils.checkpoint import load_arrays, unflatten_into
        template = net.init_params(jax.random.PRNGKey(0), H, Wd)
        flat, meta = load_arrays(args.weights)
        params = unflatten_into(template, flat)
        # the BA damping recipe the weights were trained with rides the
        # sidecar (training runs 1.0*eta + 1e-4; the reference default
        # 0.2*eta + 1e-7 belongs to droid.pth)
        for k in ("damping_scale", "damping_offset"):
            if k in meta:
                damping_kw[k] = float(meta[k])
    elif args.weights:
        params = W.load_droid_pth(args.weights)
    else:
        params = net.init_params(jax.random.PRNGKey(args.seed), H, Wd)
        print("WARNING: no --weights given; using random network weights "
              "(tracking quality will be poor)")
    stereo = bool(getattr(args, "stereo", False))
    stereo_rel = getattr(args, "_stereo_rel", None)
    kw = {}
    if stereo and stereo_rel is not None:
        kw["stereo_rel"] = tuple(float(v) for v in stereo_rel)
    cfg = FrontendConfig(buffer=args.buffer,
                         p_window=min(args.buffer, 32),
                         k_depth=min(args.buffer + 8, 40),
                         global_ba=getattr(args, "global_ba", False),
                         stereo=stereo,
                         rgbd=getattr(args, "rgbd", False),
                         edge_shards=getattr(args, "edge_shards", 1),
                         **damping_kw, **kw)
    return RaftVisualFrontend(params, cfg, image_size)


def build_fusion(args):
    if args.fusion == "none":
        return None, None
    if args.fusion == "nerf":
        from ..fusion import NerfFusion, NerfFusionConfig
        from ..utils.runtime import fusion_device
        cfg = NerfFusionConfig(
            buffer=args.buffer, height=args.height, width=args.width,
            mask_type=getattr(args, "mask_type", "ours"),
            eval_every=(getattr(args, "eval_every", 200)
                        if args.eval else 0),
            eval_views=getattr(args, "eval_views", 8))
        dev = fusion_device(getattr(args, "device_split", False))
        return NerfFusion(cfg, seed=args.seed, device=dev), "nerf"
    from ..fusion.tsdf_fusion import TsdfFusion, TsdfFusionConfig
    mask = "weighted" if args.fusion == "sigma" else "uniform"
    return TsdfFusion(TsdfFusionConfig(depth_mask_type=mask)), args.fusion


def run(args) -> dict:
    from ..utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    from ..pipeline.modules import (DataModule, EvalSink, FusionModule,
                                    GuiModule, SlamModule)
    from ..pipeline.runner import connect, run_parallel, run_sequential
    from ..utils.evaluation import ate_rmse, trajectory_from_packet

    dataset = build_dataset(args)
    probe = dataset[0]
    image_size = probe["images"].shape[:2]
    if getattr(args, "stereo", False):
        # rig calibration rides the packets (cam1_T_cam0 7-vec)
        assert probe.get("images_right") is not None, \
            "--stereo needs a dataset providing images_right"
        args._stereo_rel = probe.get("stereo_rel")

    frontend = build_frontend(args, image_size)
    fusion, fusion_mode = build_fusion(args)

    tracker = frontend
    if getattr(args, "vio", False):
        # VioSLAM: visual frontend + inertial factors into the backend
        # (reference slam/vio_slam.py:78-127)
        import numpy as _np
        from ..datasets.base import ImuCalibration
        from ..geometry import se3 as _se3
        from ..slam.imu import NavState, PreIntegrationInertialFrontend
        from ..slam.meta_slam import VioSLAM
        calib = getattr(dataset, "imu", None) or ImuCalibration()
        pose0 = _np.array([0, 0, 0, 0, 0, 0, 1.0])
        if probe.get("poses") is not None:
            pose0 = _np.asarray(_se3.from_matrix(
                _np.asarray(probe["poses"], _np.float64)))
        vel0 = _np.zeros(3)
        if hasattr(dataset, "velocity_at"):
            vel0 = dataset.velocity_at(float(probe["t_cams"]))
        inertial = PreIntegrationInertialFrontend(
            calib, NavState(pose=pose0, vel=vel0),
            timestamps_ns=True)
        tracker = VioSLAM(frontend, inertial)

    data_m = DataModule(dataset, img_stride=args.img_stride)
    slam_m = SlamModule(tracker)
    sink = EvalSink()
    modules = [data_m, slam_m, sink]
    connect(data_m, slam_m, "data")
    connect(slam_m, sink, "slam")
    fusion_m = None
    if fusion is not None:
        fusion_m = FusionModule(fusion, mode=fusion_mode)
        connect(slam_m, fusion_m, "slam")
        modules.insert(2, fusion_m)
    if args.gui:
        from ..gui.headless import HeadlessGui
        gui = HeadlessGui(out_dir=args.viz_out)
        if getattr(args, "viewer_port", 0):
            from ..gui.viewer import LiveViewer
            gui = LiveViewer(gui, port=args.viewer_port)
            print(f"live viewer at http://localhost:{gui.port}/",
                  flush=True)
        gui_m = GuiModule(gui)
        connect(slam_m, gui_m, "slam")
        if fusion_m is not None:
            # GUI->fusion command back-channel (reference
            # examples/slam_demo.py:124-125)
            connect(gui_m, fusion_m, "gui")
        modules.append(gui_m)

    t0 = time.time()
    if getattr(args, "profile", False):
        from ..utils.runtime import profile_trace
        with profile_trace():
            if args.parallel_run:
                run_parallel(modules, timeout_s=3600.0)
            else:
                run_sequential(modules)
    elif args.parallel_run:
        run_parallel(modules, timeout_s=3600.0)
    else:
        run_sequential(modules)
    wall = time.time() - t0

    results = {"wall_s": wall, "n_keyframes": frontend.kf_idx + 1,
               "kf_per_s": (frontend.kf_idx + 1) / wall}
    for m in modules:
        results[f"{m.name}_mean_ms"] = m.stats()["mean_ms"]

    if sink.last_full is not None:
        est, gt = trajectory_from_packet(sink.last_full)
        if est.shape[0] >= 3:
            results["ate_rmse_m"] = ate_rmse(est, gt)

    if getattr(args, "vio", False) and tracker.backend.estimate is not None:
        ks = sorted(i.idx for i in tracker.backend.estimate.keys()
                    if i.name == "x")
        results["vio_states"] = len(ks)
        results["vio_relinearized"] = tracker.backend.stats["relinearized"]

    fit_iters = getattr(args, "fit_iters", 0)
    if fit_iters and fusion is not None and \
            hasattr(fusion, "fit_volume") and \
            fusion.iteration < fit_iters:
        # convergence-horizon training after the sequence (reference
        # eval runs to 25k iterations, fusion/nerf_fusion.py:54,264-265);
        # fit_volume itself appends an online-eval row every eval_every
        fusion.fit_volume(fit_iters - fusion.iteration)
        print(f"[fit] reached iter {fusion.iteration}", flush=True)

    if args.eval and fusion is not None:
        if hasattr(fusion, "evaluate_training_views"):
            # evaluate in the map's own frame at the (refined) training
            # views -- immune to monocular scale/gauge drift (reference
            # nerf_fusion.py:411 set_camera_to_training_view)
            row = fusion.evaluate_training_views()
            if row:
                results.update({f"fusion_{k}": v for k, v in row.items()})
            fusion.write_results_csv(args.out)
        elif sink.last_full is not None:
            pkt = sink.last_full
            n = min(4, int(pkt.get("viz_count",
                                   len(np.asarray(pkt["gt_poses"])))))
            gt_imgs = np.asarray(pkt["cam0_images"])[:n]
            gt_depths = np.asarray(pkt["gt_depths"])[:n]
            c2ws = np.asarray(pkt["gt_poses"])[:n]
            intr = np.asarray(pkt["cam0_intrinsics"])[:n] * 8.0
            row = fusion.evaluate(gt_imgs, gt_depths, c2ws, intr)
            results.update({f"fusion_{k}": v for k, v in row.items()})

    print(json.dumps(results))
    return results


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
