"""Hash-grid NeRF: encoding properties and a tiny synthetic fit
(BASELINE.json config #3 in miniature)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.fusion.hashgrid import (HashGridConfig, encode,
                                           init_table, sh_encode_deg4)
from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig, NGPConfig
from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig


def test_hash_encode_shapes_and_continuity():
    cfg = HashGridConfig(n_levels=4, log2_table_size=12,
                         base_resolution=4, finest_resolution=32)
    table = init_table(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
    out = encode(table, pos, cfg)
    assert out.shape == (100, 8)
    # trilinear interpolation => small position deltas give small changes
    out2 = encode(table, pos + 1e-5, cfg)
    assert float(jnp.abs(out - out2).max()) < 1e-5


def test_hash_encode_differentiable():
    cfg = HashGridConfig(n_levels=2, log2_table_size=10,
                         base_resolution=4, finest_resolution=8)
    table = init_table(jax.random.PRNGKey(0), cfg)

    def loss(tab):
        pos = jnp.array([[0.3, 0.5, 0.7], [0.1, 0.9, 0.2]])
        return jnp.sum(encode(tab, pos, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encode_chunked_matches_monolithic():
    """encode_chunked (bounded per-op gathers/scatters for the faulting
    dev-TPU runtime) must be bit-equivalent to encode() in values AND
    table/position gradients, including the ragged final chunk."""
    from nerf_slam_tpu.fusion.hashgrid import encode_chunked
    cfg = HashGridConfig(n_levels=4, log2_table_size=12,
                         base_resolution=4, finest_resolution=32)
    table = init_table(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (103, 3))  # ragged

    out_ref = encode(table, pos, cfg)
    out_chk = encode_chunked(table, pos, cfg, chunk=32)
    np.testing.assert_allclose(np.asarray(out_chk), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-7)

    def loss_ref(tab, p):
        return jnp.sum(jnp.sin(encode(tab, p, cfg)) ** 2)

    def loss_chk(tab, p):
        return jnp.sum(jnp.sin(encode_chunked(tab, p, cfg, 32)) ** 2)

    gt_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(table, pos)
    gt_c, gp_c = jax.grad(loss_chk, argnums=(0, 1))(table, pos)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_r),
                               rtol=1e-5, atol=1e-6)


def test_sh_encoding_constant_and_norm():
    dirs = jax.random.normal(jax.random.PRNGKey(0), (50, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    sh = sh_encode_deg4(dirs)
    assert sh.shape == (50, 16)
    np.testing.assert_allclose(sh[:, 0], 0.28209479, atol=1e-6)


@pytest.mark.slow
def test_nerf_fit_synthetic_views():
    """Fit a few posed RGB-D views of the synthetic room; PSNR must climb
    well above the initial render and depth-L1 must shrink."""
    ds = SyntheticDataset(SyntheticConfig(n_frames=8, height=60, width=80))
    ngp = NGPConfig(n_uniform=48, n_depth=16, encoding="hash",
                    grid=__import__("nerf_slam_tpu.fusion.hashgrid",
                                    fromlist=["HashGridConfig"]
                                    ).HashGridConfig(
                        n_levels=8, log2_table_size=15,
                        base_resolution=4, finest_resolution=128))
    cfg = NerfFusionConfig(buffer=8, height=60, width=80,
                           batch_rays=1024, ngp=ngp,
                           scale=0.2, offset=(0.5, 0.5, 0.25))
    fusion = NerfFusion(cfg, seed=0)

    ids, c2ws, imgs, depths, covs, intrs = [], [], [], [], [], []
    for k in range(8):
        p = ds[k]
        ids.append(k)
        c2ws.append(p["poses"])
        imgs.append(p["images"])
        depths.append(p["depths"])
        covs.append(0.01 * np.ones_like(p["depths"]))
        intrs.append(p["intrinsics"])
    fusion.update_training_images(np.array(ids), np.stack(c2ws),
                                  np.stack(imgs), np.stack(depths),
                                  np.stack(covs), np.stack(intrs))

    row0 = fusion.evaluate(imgs[:2], depths[:2], c2ws[:2], intrs[:2],
                           max_views=2)
    fusion.fit_volume(300)
    row1 = fusion.evaluate(imgs[:2], depths[:2], c2ws[:2], intrs[:2],
                           max_views=2)

    assert row1["psnr"] > row0["psnr"] + 5.0, (row0, row1)
    assert row1["psnr"] > 16.0, row1
    assert row1["depth_l1_cm"] < 30.0, row1


@pytest.mark.slow
def test_fuse_packet_contract():
    """fuse() consumes a frontend-style viz packet."""
    cfg = NerfFusionConfig(buffer=4, height=48, width=64, batch_rays=256)
    fusion = NerfFusion(cfg)
    h, w = 6, 8
    packet = {
        "viz_idx": np.array([0, 1]),
        "cam0_poses": np.tile(
            np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (2, 1)),
        "cam0_images": np.random.randint(
            0, 255, (2, 48, 64, 3), np.uint8),
        "cam0_idepths_up": np.full((2, 48, 64), 0.5, np.float32),
        "cam0_depths_cov_up": np.full((2, 48, 64), 0.04, np.float32),
        "cam0_intrinsics": np.tile(
            np.array([5.0, 5.0, 4.0, 3.0], np.float32), (2, 1)),
        "is_last_frame": False,
    }
    done = fusion.fuse(packet)
    assert not done
    assert float(fusion.train_set.valid.sum()) == 2
    # depth = 1/idepth scaled
    d = np.asarray(fusion.train_set.depths[0])
    np.testing.assert_allclose(d, 2.0 * cfg.scale, atol=1e-5)
    loss = fusion.fit_volume(3)
    assert np.isfinite(loss)

    done = fusion.fuse({"is_last_frame": True})
    assert done


@pytest.mark.slow
def test_extrinsics_refinement_recovers_perturbed_poses():
    """Mapping-time extrinsics refinement (reference nerf_fusion.py:99).

    Protocol matching the capability's operating regime (see
    NerfFusionConfig.optimize_extrinsics): the field forms near the true
    poses first, then perturbed extrinsics are pulled back during the
    coordinate-descent pose phases.  (Field formed ON wrong poses
    co-adapts and the pose gradient becomes uninformative -- measured,
    not fixable by schedule -- hence refinement is a correction for
    drift on top of good SLAM poses, not a rescue for bad ones.)"""
    ds = SyntheticDataset(SyntheticConfig(n_frames=6, height=48, width=64))
    ngp = NGPConfig(n_uniform=32, n_depth=16, encoding="hash",
                    grid=__import__("nerf_slam_tpu.fusion.hashgrid",
                                    fromlist=["HashGridConfig"]
                                    ).HashGridConfig(
                        n_levels=6, log2_table_size=14,
                        base_resolution=4, finest_resolution=64))
    cfg = NerfFusionConfig(buffer=6, height=48, width=64,
                           batch_rays=1024, ngp=ngp,
                           scale=0.2, offset=(0.5, 0.5, 0.25),
                           optimize_extrinsics=True,
                           extrinsics_start=200, extrinsics_lr=1e-3,
                           # period == pose_iters: the field stays
                           # frozen while poses recover (measured: 10x
                           # error reduction; interleaving field updates
                           # lets the field co-adapt to the wrong poses
                           # and stalls recovery at ~1.3x)
                           extrinsics_period=50,
                           extrinsics_pose_iters=50)
    fusion = NerfFusion(cfg, seed=0)

    ids, c2ws, imgs, depths, covs, intrs = [], [], [], [], [], []
    for k in range(6):
        p = ds[k]
        ids.append(k)
        c2ws.append(np.asarray(p["poses"], np.float32))
        imgs.append(p["images"])
        depths.append(p["depths"])
        covs.append(0.01 * np.ones_like(p["depths"]))
        intrs.append(p["intrinsics"])
    fusion.update_training_images(np.array(ids), np.stack(c2ws),
                                  np.stack(imgs), np.stack(depths),
                                  np.stack(covs), np.stack(intrs))

    # phase 1: field forms at the true poses (pose opt not yet engaged)
    fusion.fit_volume(200)

    # phase 2: perturb the extrinsics deltas (view 0 anchors the gauge)
    rng = np.random.default_rng(0)
    pert = np.zeros((6, 6), np.float32)
    pert[1:] = 0.01 * rng.standard_normal((5, 6)).astype(np.float32)
    fusion.pose_deltas = jnp.asarray(pert)
    fusion.pose_opt_state = fusion.pose_opt.init(fusion.pose_deltas)

    def pose_err():
        d = np.asarray(fusion.pose_deltas)[1:]
        return float(np.abs(d).mean())

    err0 = pose_err()
    fusion.fit_volume(200)
    err1 = pose_err()
    assert float(jnp.abs(fusion.pose_deltas[1:]).max()) > 0, \
        "pose deltas never moved"
    assert err1 < 0.3 * err0, (err0, err1)
