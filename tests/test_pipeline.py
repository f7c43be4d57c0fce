"""End-to-end pipeline: data -> SLAM -> fusion -> eval, sequential and
parallel (BASELINE.json config #4 in miniature)."""
import numpy as np
import pytest

from nerf_slam_tpu.utils.evaluation import ate_rmse, umeyama_alignment


def test_umeyama_exact_recovery():
    rng = np.random.RandomState(0)
    src = rng.randn(30, 3)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    s, t = 2.3, np.array([0.5, -1.0, 2.0])
    dst = s * src @ Q.T + t
    R, t2, s2 = umeyama_alignment(src, dst)
    np.testing.assert_allclose(s2, s, rtol=1e-6)
    np.testing.assert_allclose(R, Q, atol=1e-8)
    assert ate_rmse(src, dst) < 1e-8


def test_ate_detects_error():
    rng = np.random.RandomState(1)
    gt = rng.randn(20, 3)
    est = gt + 0.1 * rng.randn(20, 3)
    e = ate_rmse(est, gt)
    assert 0.01 < e < 0.3


@pytest.mark.parametrize(
    "parallel",
    [pytest.param(False, marks=pytest.mark.slow), True])
def test_pipeline_end_to_end(parallel):
    from nerf_slam_tpu.cli.slam_demo import parse_args, run

    argv = ["--n_frames", "10", "--height", "48", "--width", "64",
            "--buffer", "10", "--fusion", "tsdf"]
    if parallel:
        argv.append("--parallel_run")
    args = parse_args(argv)

    # shrink the frontend for CPU test speed
    import nerf_slam_tpu.cli.slam_demo as demo
    orig = demo.build_frontend

    def small_frontend(args_, image_size):
        import jax
        import jax.numpy as jnp
        from nerf_slam_tpu.models import DroidNet
        from nerf_slam_tpu.tracking import (RaftVisualFrontend,
                                            FrontendConfig)
        H, W = image_size
        h, w = H // 8, W // 8
        net = DroidNet(dtype=jnp.bfloat16)
        params = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
            jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
            jnp.array([0]), 1)
        cfg = FrontendConfig(
            buffer=10, e_active=24, e_inactive=16, p_window=10,
            k_depth=12, keyframe_warmup=4, max_factors=20,
            motion_filter_thresh=-1.0, keyframe_thresh=-1.0,
            iters1=1, iters2=1, gn_iters=1)
        return RaftVisualFrontend(params, cfg, image_size)

    demo.build_frontend = small_frontend
    try:
        results = run(args)
    finally:
        demo.build_frontend = orig

    assert results["n_keyframes"] >= 5
    assert "ate_rmse_m" in results
    assert np.isfinite(results["ate_rmse_m"])


@pytest.mark.parametrize("parallel", [False, True])
def test_pipeline_stage_failure_tears_down(parallel):
    """A stage whose spin_once raises must fail the whole run instead of
    starving its consumers until a timeout (a crashed SLAM stage
    previously left fusion training forever)."""
    from nerf_slam_tpu.pipeline.module import PipelineModule
    from nerf_slam_tpu.pipeline.runner import (connect, run_parallel,
                                               run_sequential)

    class Source(PipelineModule):
        def __init__(self):
            super().__init__("src", parallel)
            self.n = 0

        def spin_once(self, _):
            self.n += 1
            if self.n > 50:
                self.shutdown_module()
            return {"k": self.n}

    class Boom(PipelineModule):
        def spin_once(self, packet):
            raise ValueError("boom")

    class Sink(PipelineModule):
        def spin_once(self, packet):
            return packet   # never sees is_last_frame: would spin forever

    src = Source()
    boom = Boom("boom", parallel)
    sink = Sink("sink", parallel, input_timeout=1e-3)
    connect(src, boom, "data")
    connect(boom, sink, "data")
    import time
    t0 = time.time()
    with pytest.raises(RuntimeError, match="boom"):
        if parallel:
            run_parallel([src, boom, sink], timeout_s=30.0)
        else:
            run_sequential([src, boom, sink])
    assert time.time() - t0 < 20.0
    assert boom.failed and all(m.shutdown for m in (src, boom, sink))


def test_cli_flag_wiring_mask_and_horizon():
    """--mask_type / --fit_iters / --eval_every / --eval_views reach the
    fusion config (sweep + convergence drivers depend on these; the
    reference threads mask ablations through fusion/nerf_fusion.py:173-183
    and evaluates to 25k iters)."""
    from nerf_slam_tpu.cli.slam_demo import parse_args, build_fusion

    args = parse_args(["--fusion", "nerf", "--eval",
                       "--mask_type", "raw", "--fit_iters", "500",
                       "--eval_every", "100", "--eval_views", "3",
                       "--height", "48", "--width", "64"])
    assert args.fit_iters == 500
    fusion, mode = build_fusion(args)
    assert mode == "nerf"
    assert fusion.cfg.mask_type == "raw"
    assert fusion.cfg.eval_every == 100
    assert fusion.cfg.eval_views == 3
    # without --eval the online cadence is disabled
    args2 = parse_args(["--fusion", "nerf", "--mask_type", "no_depth",
                        "--height", "48", "--width", "64"])
    fusion2, _ = build_fusion(args2)
    assert fusion2.cfg.eval_every == 0
    assert fusion2.cfg.mask_type == "no_depth"
