"""Train DROID weights from scratch on procedural synthetic scenes.

The reference ships a pretrained ``droid.pth`` (a missing blob in this
checkout); this driver exercises the full differentiable training path
(BA-in-the-loop, models/training.py -- the realization of the
reference's training forward, networks/droid_net.py:181-230) to produce
weights that actually track under the production policy.

Round-5 curriculum (VERDICT r4 #1: "cut ATE below 0.1 m via a stronger
synthetic training curriculum"): multiple phases of increasing
resolution and motion magnitude, so the flow statistics the net sees
match deployment (the 336x640 bench sequence moves ~12 deg/frame =
~14 px/frame at feature resolution; the old single-phase 96x128 recipe
never saw more than ~4).  Scenes now carry interior objects (parallax,
occlusion, depth discontinuities) and jittered trajectories.

Each phase runs in its OWN subprocess: compiling two heavy program
geometries in one process wedges the tunneled dev TPU
(docs/platform_notes.md #4).  Phases checkpoint every ``save_every``
steps and resume from the newest in-phase checkpoint, so an interrupted
run loses at most a few minutes.

Usage (from the repo root):
    python scripts/train_droid_synthetic.py --out weights_synthetic.npz
    python scripts/train_droid_synthetic.py --phases quick --eval
Child mode (internal): --phase-json '<spec>'
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# curriculum: resolution and per-frame motion ramp toward the bench
# cell's statistics (336x640, 12 deg/frame).  steps are per phase.
PHASES = {
    # step counts exploit the measured economics of the tunneled chip:
    # one-time compile dominates (~8-20 min/phase) while a training step
    # costs only ~15-300 ms, so each phase trains LONG once compiled
    "full": [
        dict(name="p1", H=96, W=128, frames=7, scenes=64, steps=8000,
             gru_steps=8, lr=2e-4, deg_lo=2.0, deg_hi=14.0,
             max_objects=8, remat=False),
        dict(name="p2", H=192, W=320, frames=7, scenes=48, steps=3000,
             gru_steps=8, lr=1e-4, deg_lo=3.0, deg_hi=16.0,
             max_objects=8, remat=True),
        dict(name="p3", H=256, W=448, frames=5, scenes=32, steps=1500,
             gru_steps=6, lr=5e-5, deg_lo=6.0, deg_hi=18.0,
             max_objects=8, remat=True),
    ],
    # deployment-statistics fine-tune: the bench cell's exact resolution
    # and motion (336x640, ~12 deg/frame); warm-start from a full-run
    # phase via --init
    "finetune": [
        dict(name="p4", H=336, W=640, frames=5, scenes=16, steps=600,
             gru_steps=4, lr=3e-5, deg_lo=8.0, deg_hi=16.0,
             max_objects=6, remat=True),
    ],
    # round-5 stabilized finetune: measured p4 was too noisy to keep the
    # p2 optimum (bench ATE 0.37 -> 0.71; loss oscillating 7 <-> 45).
    # Fixes: 4-scene gradient accumulation, weight EMA, held-out
    # checkpoint selection, and a plain-orbit scene share matching the
    # bench cell's legacy trajectory
    "stable": [
        dict(name="p2b", H=192, W=320, frames=7, scenes=64, steps=600,
             gru_steps=8, lr=3e-5, deg_lo=3.0, deg_hi=16.0,
             max_objects=8, remat=True, accum=4, ema=0.998,
             holdout=8, plain_frac=0.3),
        dict(name="p4b", H=336, W=640, frames=5, scenes=48, steps=400,
             gru_steps=4, lr=1e-5, deg_lo=8.0, deg_hi=16.0,
             max_objects=6, remat=True, accum=4, ema=0.998,
             holdout=8, plain_frac=0.4),
    ],
    "quick": [
        dict(name="q1", H=96, W=128, frames=5, scenes=4, steps=30,
             gru_steps=4, lr=2e-4, deg_lo=2.0, deg_hi=12.0,
             max_objects=4, remat=False),
    ],
    # p2b continuation: its held-out score was still improving at the
    # step-600 horizon (1.75 -> 1.43 over the last 100 steps)
    "stable2": [
        dict(name="p2c", H=192, W=320, frames=7, scenes=64, steps=700,
             gru_steps=8, lr=1.5e-5, deg_lo=3.0, deg_hi=16.0,
             max_objects=8, remat=True, accum=4, ema=0.998,
             holdout=8, plain_frac=0.3),
    ],
    # CI smoke for the accumulation/EMA/held-out path
    "quick2": [
        dict(name="q2", H=96, W=128, frames=5, scenes=4, steps=4,
             gru_steps=4, lr=2e-4, deg_lo=2.0, deg_hi=12.0,
             max_objects=4, remat=False, accum=2, ema=0.99,
             holdout=2, plain_frac=0.5),
    ],
}


def _quat_from_matrix(R):
    """(3,3) rotation -> [x,y,z,w] quaternion, pure numpy (Shepperd).
    Scene generation must not touch jax: on the tunneled chip every
    eager op is a ~1 s round trip, which turned 64-scene generation
    into tens of minutes."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        x = 0.25 * s
        w = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        y = 0.25 * s
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        z = 0.25 * s
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
    return np.array([x, y, z, w])


def _se3_from_matrix_np(Ts):
    """(N,4,4) -> (N,7) [t, q] numpy (matches geometry/se3.from_matrix)."""
    out = np.zeros((Ts.shape[0], 7), np.float32)
    for i, T in enumerate(Ts):
        out[i, :3] = T[:3, 3]
        out[i, 3:] = _quat_from_matrix(T[:3, :3])
    return out


def make_batch(seed, spec):
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.models.training import TrainBatch

    H, W, n_frames = spec["H"], spec["W"], spec["frames"]
    r = np.random.RandomState(seed + 17)
    deg = r.uniform(spec["deg_lo"], spec["deg_hi"])
    if r.rand() < 0.5:
        deg = -deg                       # both orbit directions
    # plain_frac: share of clean orbit scenes (no objects, no jitter),
    # the bench cell's trajectory family
    plain = r.rand() < spec.get("plain_frac", 0.0)
    ds = SyntheticDataset(SyntheticConfig(
        n_frames=n_frames, height=H, width=W, seed=seed + 1,
        fov_deg=r.uniform(60.0, 80.0),
        orbit_radius=r.uniform(0.6, 1.4),
        room_half=r.uniform(1.6, 2.6),
        room_height=r.uniform(2.0, 3.0),
        deg_per_frame=deg,
        start_deg=r.uniform(0.0, 360.0),
        n_objects=0 if plain else r.randint(0, spec["max_objects"] + 1),
        bob_amp=0.0 if plain else r.uniform(0.0, 0.35),
        target_jitter=0.0 if plain else r.uniform(0.0, 0.35)))
    imgs, poses, disps, intr = [], [], [], []
    for k in range(n_frames):
        p = ds[k]
        imgs.append(p["images"])
        poses.append(np.linalg.inv(p["poses"]))
        d = p["depths"][::8, ::8]
        disps.append(1.0 / np.maximum(d, 0.1))
        intr.append(p["intrinsics"] / 8.0)
    # numpy throughout: the jitted train step device_puts its args once
    # per call; eager jnp conversion here costs a tunnel RTT per op
    return TrainBatch(
        images=np.stack(imgs),
        poses_gt=_se3_from_matrix_np(np.stack(poses)),
        disps_gt=np.stack(disps).astype(np.float32),
        intrinsics=np.stack(intr).astype(np.float32))


def neighborhood_graph(N, radius=3):
    import jax.numpy as jnp
    ii, jj = [], []
    for a in range(N):
        for b in range(N):
            if a != b and abs(a - b) <= radius:
                ii.append(a)
                jj.append(b)
    return jnp.asarray(np.array(ii)), jnp.asarray(np.array(jj))


def run_phase(spec, init_path, out_path, save_every=100):
    """Child: train one curriculum phase, resumable via checkpoints."""
    import jax
    import jax.numpy as jnp
    import optax
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.models.training import make_train_step
    from nerf_slam_tpu.utils.checkpoint import (load_arrays, save_arrays,
                                                unflatten_into)
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    H, W = spec["H"], spec["W"]
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)

    ckpt = out_path + f".{spec['name']}.ckpt.npz"
    start_step = 0
    if os.path.exists(ckpt):
        flat, meta = load_arrays(ckpt)
        params = unflatten_into(params, flat)
        start_step = int(meta.get("step", 0))
        print(f"[{spec['name']}] resume from step {start_step}",
              flush=True)
    elif init_path and os.path.exists(init_path):
        flat, _ = load_arrays(init_path)
        params = unflatten_into(params, flat)
        print(f"[{spec['name']}] warm-start from {init_path}",
              flush=True)

    ii, jj = neighborhood_graph(spec["frames"])

    print(f"[{spec['name']}] generating {spec['scenes']} scenes "
          f"({spec['frames']} frames at {H}x{W})...", flush=True)
    batches = [make_batch(1000 * (1 + PHASE_INDEX.get(spec['name'], 0))
                          + s, spec) for s in range(spec["scenes"])]

    steps = spec["steps"]
    accum = int(spec.get("accum", 1))
    ema_decay = float(spec.get("ema", 0.0))
    n_hold = int(spec.get("holdout", 0))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, spec["lr"], min(100, steps // 4), steps,
        end_value=0.05 * spec["lr"])
    # BA-in-the-loop training occasionally produces NaN grads (singular
    # reduced systems while the weight head is untrained); zero them so
    # Adam state survives and training recovers
    opt = optax.chain(optax.zero_nans(),
                      optax.clip_by_global_norm(1.0),
                      optax.adam(sched))
    opt_state = opt.init(params)

    hold = [make_batch(900000 + s, spec) for s in range(n_hold)]

    t0 = time.time()
    best = (float("inf"), None)          # (held-out geodesic, flat)

    def holdout_score(p, it):
        if not hold:
            return None
        ms = [ev_fn(p, b) for b in hold]
        geo = float(np.mean([float(m["geodesic"]) for m in ms]))
        rot = float(np.mean([float(m["rot_error_deg"]) for m in ms]))
        print(f"[{spec['name']} {time.time()-t0:7.1f}s] step {it:4d} "
              f"HELD-OUT geo {geo:.4f} rot {rot:.2f}deg", flush=True)
        return geo

    if accum > 1 or ema_decay > 0 or n_hold > 0:
        from nerf_slam_tpu.models.training import (make_apply_fn,
                                                   make_eval_fn,
                                                   make_grad_fn)
        gstep = make_grad_fn(net, ii, jj, num_steps=spec["gru_steps"],
                             remat=spec.get("remat", False),
                             bf16_pyramid=True)
        apply_fn = make_apply_fn(opt, ema_decay)
        ev_fn = make_eval_fn(net, ii, jj,
                             num_steps=spec["gru_steps"],
                             remat=spec.get("remat", False),
                             bf16_pyramid=True)
        ema = jax.tree.map(jnp.asarray, params)
        zeros = jax.tree.map(jnp.zeros_like, params)
        rs = np.random.RandomState(7)
        inv_n = jnp.float32(1.0 / accum)
        for it in range(start_step, steps):
            g_sum = zeros
            mss = []
            for a in range(accum):
                b = batches[rs.randint(len(batches))]
                g_sum, metrics = gstep(params, b, g_sum)
                mss.append(metrics)
            params, opt_state, ema = apply_fn(params, opt_state, g_sum,
                                              inv_n, ema)
            if it % 20 == 0 or it == steps - 1:
                m = {k: float(np.mean([float(ms[k]) for ms in mss]))
                     for k in mss[0]}
                print(f"[{spec['name']} {time.time()-t0:7.1f}s] "
                      f"step {it:4d} loss {m['loss']:.4f} "
                      f"geo {m['geodesic']:.4f} flow {m['flow']:.3f} "
                      f"res {m['residual']:.3f} "
                      f"rot {m['rot_error_deg']:.2f}deg", flush=True)
            if ((it + 1) % save_every == 0 or it == steps - 1) and hold:
                cand = ema if ema_decay > 0 else params
                geo = holdout_score(cand, it + 1)
                if geo is not None and geo < best[0]:
                    best = (geo, jax.device_get(cand))
            if (it + 1) % save_every == 0 and it != steps - 1:
                save_arrays(ckpt, jax.device_get(params),
                            meta={"step": it + 1, "height": H,
                                  "width": W})
        final = best[1] if best[1] is not None else \
            jax.device_get(ema if ema_decay > 0 else params)
        if best[1] is not None:
            print(f"[{spec['name']}] shipping best held-out "
                  f"checkpoint (geo {best[0]:.4f})", flush=True)
    else:
        step = make_train_step(net, opt, ii, jj,
                               num_steps=spec["gru_steps"],
                               remat=spec.get("remat", False),
                               bf16_pyramid=True)

        order = np.random.RandomState(7).permutation(
            np.arange(len(batches) * (1 + steps // max(1, len(batches)))))
        for it in range(start_step, steps):
            batch = batches[order[it % len(order)] % len(batches)]
            params, opt_state, metrics = step(params, opt_state, batch)
            if it % 20 == 0 or it == steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"[{spec['name']} {time.time()-t0:7.1f}s] "
                      f"step {it:4d} loss {m['loss']:.4f} "
                      f"geo {m['geodesic']:.4f} flow {m['flow']:.3f} "
                      f"res {m['residual']:.3f} "
                      f"rot {m['rot_error_deg']:.2f}deg", flush=True)
            if (it + 1) % save_every == 0 and it != steps - 1:
                save_arrays(ckpt, jax.device_get(params),
                            meta={"step": it + 1, "height": H,
                                  "width": W})
        final = jax.device_get(params)

    # deployment recipe rides the weights: the training BA runs
    # damping = 1.0*eta + 1e-4 (models/training.py droid_forward), so
    # the production frontend must too -- consumers (CLI/bench/evals)
    # read these from the .json sidecar
    save_arrays(out_path, final,
                meta={"phase": spec["name"], "steps": steps,
                      "height": H, "width": W,
                      "damping_scale": 1.0, "damping_offset": 1e-4})
    if os.path.exists(ckpt):
        os.remove(ckpt)
    print(f"[{spec['name']}] saved {out_path}", flush=True)


PHASE_INDEX = {"p1": 0, "p2": 1, "p3": 2, "p4": 3, "q1": 0,
               "p2b": 4, "p4b": 5, "p2c": 6, "q2": 0}


def eval_bench_cell(weights_path):
    """Parent: ATE on the bench cell (336x640 legacy orbit, production
    policy) in a fresh process."""
    env = dict(os.environ, WEIGHTS=weights_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench", "diag_ate.py"),
         "336", "640", "12.0"], capture_output=True, text=True,
        timeout=1800, cwd=ROOT, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("ROW:"):
            return json.loads(line[4:])
    print(f"[eval failed rc={proc.returncode}] {proc.stderr[-600:]}",
          flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="full",
                    choices=sorted(PHASES.keys()))
    ap.add_argument("--out", default="weights_synthetic.npz")
    ap.add_argument("--init", default=None,
                    help="warm-start weights for the first phase")
    ap.add_argument("--eval", action="store_true",
                    help="bench-cell ATE after each phase")
    ap.add_argument("--phase-json", default=None, help="internal")
    ap.add_argument("--start-phase", type=int, default=0)
    args = ap.parse_args()

    if args.phase_json:
        spec = json.loads(args.phase_json)
        run_phase(spec, args.init, args.out)
        return

    out = os.path.abspath(args.out)
    prev = args.init and os.path.abspath(args.init)
    for pi, spec in enumerate(PHASES[args.phases]):
        if pi < args.start_phase:
            prev = out + f".{spec['name']}.npz"
            continue
        phase_out = out + f".{spec['name']}.npz"
        print(f"=== phase {spec['name']}: {spec} ===", flush=True)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--phase-json", json.dumps(spec), "--out", phase_out]
        if prev:
            cmd += ["--init", prev]
        t0 = time.time()
        # retry once: a faulted tunnel device poisons the process
        # (docs/platform_notes.md #7) but checkpoints make retries cheap
        for attempt in range(3):
            rc = subprocess.call(cmd, cwd=ROOT)
            if rc == 0:
                break
            print(f"[{spec['name']}] attempt {attempt} rc={rc}; "
                  "retrying from checkpoint", flush=True)
        print(f"=== phase {spec['name']} done in "
              f"{time.time()-t0:.0f}s ===", flush=True)
        prev = phase_out
        if args.eval:
            row = eval_bench_cell(phase_out)
            print(f"[{spec['name']}] bench-cell ATE: {row}", flush=True)

    if prev and os.path.exists(prev):
        import shutil
        shutil.copyfile(prev, out)
        if os.path.exists(prev + ".json"):
            shutil.copyfile(prev + ".json", out + ".json")
        print(f"final weights -> {out}", flush=True)


if __name__ == "__main__":
    main()
