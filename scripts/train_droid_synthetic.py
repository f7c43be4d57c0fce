"""Train DROID weights from scratch on procedural synthetic scenes.

The reference ships a pretrained ``droid.pth`` (a missing blob in this
checkout); this driver exercises the full differentiable training path
(BA-in-the-loop, models/training.py -- the realization of the
reference's training forward, networks/droid_net.py:181-230) to produce
weights that actually track, and validates them by ATE on a held-out
synthetic sequence against random initialization.

Usage (from the repo root):
    python scripts/train_droid_synthetic.py --steps 400 \
        --out weights_synthetic.npz [--eval]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def make_batch(seed, n_frames, H, W):
    import jax.numpy as jnp
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.geometry import se3
    from nerf_slam_tpu.models.training import TrainBatch

    r = np.random.RandomState(seed + 17)
    ds = SyntheticDataset(SyntheticConfig(
        n_frames=n_frames, height=H, width=W, seed=seed,
        orbit_radius=r.uniform(0.7, 1.4),
        deg_per_frame=r.uniform(2.0, 8.0),
        start_deg=r.uniform(0.0, 360.0)))
    imgs, poses, disps, intr = [], [], [], []
    for k in range(n_frames):
        p = ds[k]
        imgs.append(p["images"])
        poses.append(np.linalg.inv(p["poses"]))
        d = p["depths"][::8, ::8]
        disps.append(1.0 / np.maximum(d, 0.1))
        intr.append(p["intrinsics"] / 8.0)
    return TrainBatch(
        images=jnp.asarray(np.stack(imgs)),
        poses_gt=se3.from_matrix(jnp.asarray(np.stack(poses))),
        disps_gt=jnp.asarray(np.stack(disps), np.float32),
        intrinsics=jnp.asarray(np.stack(intr), np.float32))


def run_tracking_ate(params, n_frames=60, H=96, W=128):
    """Track a held-out synthetic sequence with the production keyframe
    policy (motion filter + redundancy rejection); return ATE-RMSE (m)."""
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.utils.evaluation import ate_rmse
    from nerf_slam_tpu.geometry import se3
    import jax.numpy as jnp

    ds = SyntheticDataset(SyntheticConfig(n_frames=n_frames, height=H,
                                          width=W, seed=1234,
                                          orbit_radius=1.2,
                                          deg_per_frame=1.5))
    cfg = FrontendConfig(buffer=32, e_active=48, e_inactive=48,
                         p_window=32, k_depth=36,
                         damping_scale=1.0, damping_offset=1e-4)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    for k in range(n_frames):
        fe(k, ds[k])
    n = min(fe.kf_idx + 1, cfg.buffer)
    est_w2c = np.asarray(fe.state.cam_T_world[:n])
    est_c2w = np.asarray(se3.matrix(se3.inv(jnp.asarray(est_w2c))))
    gt_c2w = np.asarray(fe.state.gt_poses[:n])
    return ate_rmse(est_c2w[:, :3, 3], gt_c2w[:, :3, 3])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--gru_steps", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default="weights_synthetic.npz")
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.models.training import make_train_step
    from nerf_slam_tpu.utils.checkpoint import save_arrays, load_arrays, \
        unflatten_into
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    H, W = args.height, args.width
    h, w = H // 8, W // 8
    N = args.frames
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)

    # radius-3 neighborhood, matching the frontend's __initialize graph
    ii, jj = [], []
    for a in range(N):
        for b in range(N):
            if a != b and abs(a - b) <= 3:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(np.array(ii))
    jj = jnp.asarray(np.array(jj))

    print(f"generating {args.scenes} scenes "
          f"({N} frames at {H}x{W})...", flush=True)
    batches = [make_batch(s, N, H, W) for s in range(args.scenes)]

    sched = optax.linear_schedule(0.0, args.lr, 50)
    # BA-in-the-loop training occasionally produces NaN grads (singular
    # reduced systems while the weight head is untrained); zero them so
    # Adam state survives and training recovers
    opt = optax.chain(optax.zero_nans(),
                      optax.clip_by_global_norm(1.0),
                      optax.adam(sched))
    opt_state = opt.init(params)
    step = make_train_step(net, opt, ii, jj, num_steps=args.gru_steps)

    t0 = time.time()
    for it in range(args.steps):
        batch = batches[it % len(batches)]
        params, opt_state, metrics = step(params, opt_state, batch)
        if it % 20 == 0 or it == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"[{time.time()-t0:7.1f}s] step {it:4d} "
                  f"loss {m['loss']:.4f} geo {m['geodesic']:.4f} "
                  f"flow {m['flow']:.3f} res {m['residual']:.3f}",
                  flush=True)

    save_arrays(args.out, jax.device_get(params),
                meta={"steps": args.steps, "height": H, "width": W})
    print(f"saved {args.out}", flush=True)

    if args.eval:
        flat, _ = load_arrays(args.out)
        params_loaded = unflatten_into(params, flat)
        ate_trained = run_tracking_ate(params_loaded)
        rnd = net.init_params(jax.random.PRNGKey(7), H, W)
        ate_random = run_tracking_ate(rnd)
        print(f"ATE-RMSE held-out synthetic: trained {ate_trained:.4f} m"
              f" vs random-init {ate_random:.4f} m", flush=True)


if __name__ == "__main__":
    main()
