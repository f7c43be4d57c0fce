"""Frontend state-machine mechanics on tiny synthetic data (CPU).

With randomly initialized network weights the tracking *quality* is
meaningless; these tests validate the machinery: keyframe lifecycle,
graph bookkeeping, jit-stability of the fused update, finite outputs,
and the viz packet contract.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.models import DroidNet
from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig


@pytest.fixture(scope="module")
def small_frontend():
    H, W = 48, 64
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = net.init(
        rng, jnp.zeros((1, H, W, 3)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 196)),
        jnp.zeros((1, h, w, 4)), jnp.array([0]), 1)
    cfg = FrontendConfig(
        buffer=12, e_active=24, e_inactive=16, p_window=12, k_depth=14,
        keyframe_warmup=4, max_factors=20, motion_filter_thresh=-1.0,
        keyframe_thresh=-1.0, iters1=1, iters2=1, gn_iters=1)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    return fe


def test_frontend_runs_sequence(small_frontend):
    fe = small_frontend
    ds = SyntheticDataset(SyntheticConfig(n_frames=10, height=48, width=64))
    packets = []
    for k, pkt in enumerate(ds):
        out = fe(k, pkt)
        if out is not None:
            packets.append(out)

    assert fe.kf_idx >= 5              # enough keyframes accepted
    assert fe.is_initialized
    assert fe.stop                     # last frame triggers terminate
    assert len(packets) >= 2

    final = packets[-1]
    assert "cam0_poses" in final
    poses = np.asarray(final["cam0_poses"])
    assert np.isfinite(poses).all()
    idepths = np.asarray(final["cam0_idepths"])
    assert np.isfinite(idepths).all() and (idepths >= 0).all()
    cov = np.asarray(final["cam0_depths_cov"])
    assert np.isfinite(cov).all()
    up = np.asarray(final["cam0_idepths_up"])
    assert up.shape[-2:] == (48, 64)
    pose_cov = np.asarray(final["world_T_body_cov"])
    assert np.isfinite(pose_cov).all()
    # covariance diagonals are non-negative
    diags = np.diagonal(pose_cov, axis1=-2, axis2=-1)
    assert (diags >= -1e-6).all()


def test_graph_state_is_consistent(small_frontend):
    fe = small_frontend
    g = fe.graph
    assert g.n_edges <= fe.cfg.e_active
    assert g.n_inactive <= fe.cfg.e_inactive
    # no self edges in mono mode
    assert (g.ii != g.jj).all()
    # ages aligned
    assert g.age.shape == g.ii.shape


@pytest.mark.slow
def test_global_ba_runs(small_frontend):
    """Global BA (terminate path) on the already-tracked sequence."""
    fe = small_frontend
    import jax.numpy as jnp
    # perturb the scale so normalize() has visible work to do
    fe.state = fe.state._replace(idepths=fe.state.idepths * 2.0)
    fe.global_ba(steps=1, chunk=8, thresh=1e6)  # accept all edges
    poses_after = np.asarray(fe.state.cam_T_world)
    disps_after = np.asarray(fe.state.idepths)
    assert np.isfinite(poses_after).all()
    assert np.isfinite(disps_after).all()
    # normalize() rescales mean inverse depth back toward 1
    kf = fe.kf_idx
    mean_idepth = disps_after[:kf + 1].mean()
    assert 0.5 < mean_idepth < 1.5, mean_idepth


@pytest.mark.slow
def test_global_ba_rollback_guard(small_frontend, monkeypatch):
    """A backend run that WRECKS the map (divergent GRU refinement with
    self-trained weights, QUALITY.md) must be rolled back by the
    depth-consistency guard; global_ba may only improve the map."""
    from nerf_slam_tpu.tracking import frontend as fe_mod
    from nerf_slam_tpu.geometry import se3
    fe = small_frontend
    if fe.kf_idx < 2:   # fixture not yet tracked (isolated -k run)
        ds = SyntheticDataset(SyntheticConfig(n_frames=10, height=48,
                                              width=64))
        for k, pkt in enumerate(ds):
            fe(k, pkt)
    # seed the map with GT geometry so the pre-backend consistency
    # score is genuinely high (random-weight tracking output may not be)
    n = fe.kf_idx + 1
    st = fe.state
    gt_w2c = se3.from_matrix(jnp.linalg.inv(st.gt_poses))
    gt_disp = 1.0 / jnp.maximum(st.gt_depths[:, ::8, ::8], 0.1)
    mask = (jnp.arange(st.idepths.shape[0]) < n)
    fe.state = st._replace(
        cam_T_world=jnp.where(mask[:, None], gt_w2c, st.cam_T_world),
        idepths=jnp.where(mask[:, None, None], gt_disp, st.idepths))
    poses0 = np.asarray(fe.state.cam_T_world).copy()
    disps0 = np.asarray(fe.state.idepths).copy()

    real_dba = fe_mod.dba.dba_iterations

    def wrecking_dba(poses, disps, *a, **kw):
        res = real_dba(poses, disps, *a, **kw)
        # scramble: scale translations x6 and collapse depths -- the
        # measured failure signature of the divergent backend
        return res._replace(poses=res.poses.at[:, :3].multiply(6.0),
                            disps=res.disps * 0.1)

    monkeypatch.setattr(fe_mod.dba, "dba_iterations", wrecking_dba)
    fe.global_ba(steps=1, chunk=8, thresh=1e6)
    assert fe.last_gba_scores is not None
    pre, post = fe.last_gba_scores
    assert post < pre                      # the wreck was detected
    # state restored to the (normalized) pre-backend snapshot: relative
    # geometry of the ACTIVE prefix unchanged up to the global gauge
    # rescale (normalize_map only touches slots < n_kf)
    disps1 = np.asarray(fe.state.idepths)[:n]
    d0 = disps0[:n]
    s = d0.mean() / disps1.mean()
    np.testing.assert_allclose(disps1 * s, d0, rtol=1e-4, atol=1e-5)
    poses1 = np.asarray(fe.state.cam_T_world)[:n]
    np.testing.assert_allclose(poses1[:, :3] / s, poses0[:n, :3],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(poses1[:, 3:], poses0[:n, 3:],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_production_policy_fused_motion_filter():
    """The fully-fused production path: ingest + motion decision +
    two-phase update in ONE dispatch.  Thresholds at the extremes make
    both cond branches deterministic: 1e9 rejects every frame (the host
    snapshot/restore path), 0.0 accepts every frame."""
    import dataclasses

    H, W = 48, 64
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    cfg = FrontendConfig(
        buffer=12, e_active=24, e_inactive=16, p_window=12, k_depth=14,
        keyframe_warmup=4, max_factors=20, motion_filter_thresh=0.0,
        keyframe_thresh=0.0, iters1=1, iters2=1, gn_iters=1)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    ds = SyntheticDataset(SyntheticConfig(n_frames=14, height=H,
                                          width=W))

    # accept-everything until initialized + a couple of fused keyframes
    for k in range(7):
        fe(k, dict(ds[k], k=k))
    assert fe.is_initialized
    kf_after_init = fe.kf_idx
    assert kf_after_init >= 5

    # reject-everything: ON-DEVICE motion rejects; the host snapshot
    # must restore graph / pending / kf maps each time
    fe.cfg = dataclasses.replace(fe.cfg, motion_filter_thresh=1e9)
    g_before = (fe.graph.ii.copy(), fe.graph.jj.copy(),
                fe.graph.age.copy())
    maps_before = dict(fe.kf_idx_to_f_idx)
    for k in range(7, 11):
        out = fe(k, dict(ds[k], k=k))
        assert out is None
    assert fe.kf_idx == kf_after_init
    np.testing.assert_array_equal(fe.graph.ii, g_before[0])
    np.testing.assert_array_equal(fe.graph.jj, g_before[1])
    np.testing.assert_array_equal(fe.graph.age, g_before[2])
    assert dict(fe.kf_idx_to_f_idx) == maps_before

    # accept again: keyframes resume and the packet contract holds
    fe.cfg = dataclasses.replace(fe.cfg, motion_filter_thresh=0.0)
    out = None
    for k in range(11, 14):
        out = fe(k, dict(ds[k], k=k,
                         is_last_frame=(k == 13))) or out
    assert fe.kf_idx > kf_after_init
    assert out is not None and "cam0_poses" in out
    assert np.isfinite(
        np.asarray(out["cam0_poses"])[: out["viz_count"]]).all()


def test_rgbd_mode_seeds_sensed_depths():
    """cfg.rgbd derives feature-res sensed inverse depths from packet
    depths (reference cam0_idepths_sensed, visual_frontend.py:598-602):
    the buffers must hold metric 1/depth where the monocular path keeps
    zeros, and new-keyframe idepths must seed from them."""
    H, W = 48, 64
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    cfg = FrontendConfig(
        buffer=8, e_active=24, e_inactive=16, p_window=8, k_depth=10,
        keyframe_warmup=4, max_factors=20, motion_filter_thresh=-1.0,
        keyframe_thresh=-1.0, iters1=1, iters2=1, gn_iters=1, rgbd=True)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    ds = SyntheticDataset(SyntheticConfig(n_frames=6, height=H, width=W))
    for k in range(6):
        fe(k, ds[k])
    n = fe.kf_idx
    sens = np.asarray(fe.state.idepths_sensed[:n])
    assert (sens > 0).mean() > 0.95, "sensed depths not populated"
    gt = 1.0 / np.maximum(np.asarray(ds[0]["depths"])[4::8, 4::8], 1e-3)
    assert np.allclose(sens[0], gt, rtol=1e-3, atol=1e-3)
    # seeded idepths are metric-anchored (mean within 30% of sensed
    # mean even after GN iterations with random weights)
    disp = np.asarray(fe.state.idepths[:n])
    assert 0.5 < disp.mean() / sens.mean() < 2.0, \
        (disp.mean(), sens.mean())


def test_incremental_corr_rebuild_matches_full():
    """e_rebuild>0 (gather surviving volumes + build only new slots)
    must produce the same trajectory/depths as the full per-sync
    rebuild: volume content depends on keyframe identity, which edge
    compaction preserves."""
    H, W = 48, 64
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(3), H, W)
    ds = SyntheticDataset(SyntheticConfig(n_frames=10, height=H,
                                          width=W))
    outs = {}
    modes = {}
    for kr in (0, 16):
        cfg = FrontendConfig(
            buffer=12, e_active=24, e_inactive=16, p_window=12,
            k_depth=14, keyframe_warmup=4, max_factors=20,
            motion_filter_thresh=-1.0, keyframe_thresh=-1.0,
            iters1=1, iters2=1, gn_iters=1, e_rebuild=kr)
        fe = RaftVisualFrontend(params, cfg, (H, W))
        seen = []
        orig = fe._update_n

        def spy(params, state, edges, inactive, packed_plan, *a,
                _orig=orig, _seen=seen, **kw):
            _seen.append(int(np.asarray(packed_plan[0])))
            return _orig(params, state, edges, inactive, packed_plan,
                         *a, **kw)

        fe._update_n = spy
        for k in range(10):
            fe(k, ds[k])
        n = fe.kf_idx
        outs[kr] = (np.asarray(fe.state.cam_T_world[:n]),
                    np.asarray(fe.state.idepths[:n]))
        modes[kr] = seen
    # the incremental branch must actually fire (steady-state syncs add
    # few edges), with the big init sync falling back to full
    assert modes[16].count(2) >= 3, modes
    assert 2 not in modes[0], modes
    np.testing.assert_allclose(outs[0][0], outs[16][0], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[16][1], rtol=1e-3,
                               atol=1e-4)
