"""Checkpoint / resume round-trips."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.utils import checkpoint as ckpt


def test_flatten_unflatten_namedtuple(tmp_path):
    from nerf_slam_tpu.fusion.ngp import NGPParams
    p = NGPParams(table=jnp.ones((2, 4, 2)),
                  mlp={"params": {"a": {"kernel": jnp.zeros((3, 3))}}})
    path = str(tmp_path / "x.npz")
    ckpt.save_arrays(path, {"params": p._asdict()}, {"it": 3})
    flat, meta = ckpt.load_arrays(path)
    assert meta["it"] == 3
    p2 = NGPParams(table=jnp.asarray(flat["params.table"]),
                   mlp=ckpt.unflatten_into(p.mlp, flat, "params.mlp."))
    np.testing.assert_allclose(p2.table, p.table)
    np.testing.assert_allclose(p2.mlp["params"]["a"]["kernel"],
                               p.mlp["params"]["a"]["kernel"])


@pytest.mark.slow
def test_nerf_checkpoint_roundtrip(tmp_path):
    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig, NGPConfig
    from nerf_slam_tpu.fusion.hashgrid import HashGridConfig
    cfg = NerfFusionConfig(
        buffer=2, height=16, width=16, batch_rays=64,
        ngp=NGPConfig(n_uniform=8, n_depth=4, encoding="hash",
                      grid=HashGridConfig(n_levels=2, log2_table_size=8,
                                          base_resolution=4,
                                          finest_resolution=8)))
    f = NerfFusion(cfg, seed=0)
    f.update_training_images(
        [0], [np.eye(4)], [np.random.randint(0, 255, (16, 16, 3),
                                             np.uint8)],
        [np.full((16, 16), 2.0)], [np.full((16, 16), 0.01)],
        [np.array([8.0, 8.0, 8.0, 8.0])])
    f.fit_volume(5)
    path = str(tmp_path / "nerf.npz")
    ckpt.save_nerf(path, f)

    f2 = NerfFusion(cfg, seed=99)
    ckpt.load_nerf(path, f2)
    np.testing.assert_allclose(np.asarray(f2.params.table),
                               np.asarray(f.params.table))
    assert f2.iteration == f.iteration
    # resumed training continues without error and matches valid-count
    assert float(f2.train_set.valid.sum()) == 1
    f2.fit_volume(2)


@pytest.mark.slow
def test_frontend_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig

    H, W = 48, 64
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    cfg = FrontendConfig(buffer=8, e_active=16, e_inactive=8, p_window=8,
                         k_depth=10, keyframe_warmup=3, max_factors=12,
                         motion_filter_thresh=-1.0, keyframe_thresh=-1.0,
                         iters1=1, iters2=1, gn_iters=1)
    fe = RaftVisualFrontend(params, cfg, (H, W))
    ds = SyntheticDataset(SyntheticConfig(n_frames=5, height=H, width=W))
    for k in range(4):
        fe(k, ds[k])

    path = str(tmp_path / "fe.npz")
    ckpt.save_frontend(path, fe)

    fe2 = RaftVisualFrontend(params, cfg, (H, W))
    ckpt.load_frontend(path, fe2)
    assert fe2.kf_idx == fe.kf_idx
    assert fe2.is_initialized == fe.is_initialized
    np.testing.assert_allclose(np.asarray(fe2.state.cam_T_world),
                               np.asarray(fe.state.cam_T_world))
    np.testing.assert_array_equal(fe2.graph.ii, fe.graph.ii)
    # resumed frontend keeps tracking
    out = fe2(4, ds[4])
    assert fe2.kf_idx >= fe.kf_idx
