"""DROID training path: gradients flow through BA, loss decreases."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.geometry import se3
from nerf_slam_tpu.models import DroidNet
from nerf_slam_tpu.models.training import (TrainBatch, droid_loss,
                                           make_train_step)


@pytest.fixture(scope="module")
def setup():
    H, W = 48, 64
    h, w = H // 8, W // 8
    ds = SyntheticDataset(SyntheticConfig(n_frames=4, height=H, width=W))
    imgs, poses, disps, intr = [], [], [], []
    for k in range(4):
        p = ds[k]
        imgs.append(p["images"])
        poses.append(np.linalg.inv(p["poses"]))  # cam_T_world
        d = p["depths"][::8, ::8]
        disps.append(1.0 / np.maximum(d, 0.1))
        intr.append(p["intrinsics"] / 8.0)
    batch = TrainBatch(
        images=jnp.asarray(np.stack(imgs)),
        poses_gt=se3.from_matrix(jnp.asarray(np.stack(poses))),
        disps_gt=jnp.asarray(np.stack(disps), jnp.float32),
        intrinsics=jnp.asarray(np.stack(intr), jnp.float32))

    ii, jj = [], []
    for a in range(4):
        for b in range(4):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(np.array(ii))
    jj = jnp.asarray(np.array(jj))

    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    return net, params, batch, ii, jj


@pytest.mark.slow
def test_loss_finite_and_grads_nonzero(setup):
    net, params, batch, ii, jj = setup
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: droid_loss(net, p, batch, ii, jj, num_steps=2),
        has_aux=True)(params)
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # every head got gradient signal
    flat = jax.tree.leaves(
        jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert sum(1 for v in flat if v > 0) > len(flat) * 0.8


@pytest.mark.slow
def test_train_step_reduces_loss(setup):
    net, params, batch, ii, jj = setup
    opt = optax.adam(2e-4)
    step = make_train_step(net, opt, ii, jj, num_steps=2)
    opt_state = opt.init(params)
    losses = []
    for _ in range(6):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
