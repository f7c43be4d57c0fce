"""DROID network training: BA-in-the-loop unrolled updates + losses.

Equivalent of the reference training path (networks/droid_net.py:181-230
``DroidNet.forward`` and networks/geom/losses.py): unroll N update
iterations with two differentiable BA steps each, supervise with
geodesic pose loss (scale-fitted), flow loss, and residual loss.

This matters more here than in the reference: the pretrained droid.pth
is not obtainable in a zero-egress environment, so the framework can
train its own weights on synthetic RGB-D sequences (datasets/synthetic).
Everything -- corr lookup, ConvGRU, Schur-complement BA, SE(3)
retraction -- is differentiable end to end in JAX.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from ..ops import corr
from ..solver import ba
from .update import DroidNet

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images_u8: jax.Array) -> jax.Array:
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def fit_scale(dP: jax.Array, dG: jax.Array) -> jax.Array:
    """Least-squares scale aligning estimated to GT translations
    (losses.py:21-27)."""
    t1 = dP[..., :3].reshape(-1)
    t2 = dG[..., :3].reshape(-1)
    return jnp.sum(t1 * t2) / (jnp.sum(t2 * t2) + 1e-8)


def geodesic_loss(poses_gt, poses_list, ii, jj, gamma: float = 0.9,
                  do_scale: bool = True):
    """Weighted relative-pose loss over the iteration trajectory
    (losses.py:30-75).  poses_*: (N,7) cam_T_world."""
    dP = se3.relpose(poses_gt[ii], poses_gt[jj])
    n = len(poses_list)
    loss = 0.0
    for i, Gs in enumerate(poses_list):
        w = gamma ** (n - i - 1)
        dG = se3.relpose(Gs[ii], Gs[jj])
        if do_scale:
            s = fit_scale(dP, dG)
            dG = dG.at[..., :3].multiply(s)
        d = se3.log(se3.mul(dG, se3.inv(dP)))
        tau = jnp.linalg.norm(d[..., :3], axis=-1)
        phi = jnp.linalg.norm(d[..., 3:], axis=-1)
        loss = loss + w * (tau.mean() + phi.mean())
    # metrics from the final iterate
    r_err = jnp.degrees(phi)
    t_err = tau
    return loss, {"rot_error_deg": r_err.mean(),
                  "tr_error": t_err.mean()}


def flow_loss(poses_gt, disps_gt, poses_list, disps_list, intrinsics,
              ii, jj, gamma: float = 0.9):
    """End-point-error against GT-induced flow (losses.py:91-118)."""
    coords0, val0, _ = camera.projective_transform(
        poses_gt, disps_gt, intrinsics, ii, jj)
    val0 = val0[..., 0] * (disps_gt[ii] > 0)
    n = len(poses_list)
    loss = 0.0
    epe = None
    for i, (Gs, ds) in enumerate(zip(poses_list, disps_list)):
        w = gamma ** (n - i - 1)
        coords1, val1, _ = camera.projective_transform(
            Gs, ds, intrinsics, ii, jj)
        v = val0 * val1[..., 0]
        epe = jnp.linalg.norm(coords1 - coords0, axis=-1) * v
        loss = loss + w * epe.mean()
    return loss, {"epe": epe.sum() / jnp.maximum(val0.sum(), 1.0)}


def residual_loss(residuals, gamma: float = 0.9):
    """losses.py:78-88."""
    n = len(residuals)
    loss = 0.0
    for i, r in enumerate(residuals):
        loss = loss + gamma ** (n - i - 1) * jnp.abs(r).mean()
    return loss


class TrainBatch(NamedTuple):
    images: jax.Array       # (N, H, W, 3) uint8
    poses_gt: jax.Array     # (N, 7) cam_T_world
    disps_gt: jax.Array     # (N, h, w) GT inverse depth (feature res)
    intrinsics: jax.Array   # (N, 4) feature-res intrinsics


def droid_forward(net: DroidNet, params, batch: TrainBatch,
                  ii: jax.Array, jj: jax.Array, num_steps: int = 8,
                  fixedp: int = 2, remat: bool = False,
                  bf16_pyramid: bool = False):
    """Unrolled training forward (droid_net.py:181-230 semantics).

    ``remat``: rematerialize each unrolled iteration (jax.checkpoint)
    so high-resolution curriculum phases fit in HBM.
    ``bf16_pyramid``: build the correlation pyramid in bf16 via pooled
    features (matches the production frontend's storage; halves the
    volume's HBM residency).

    Returns (poses_list, disps_list, residual_list).
    """
    N, H, W, _ = batch.images.shape
    h, w = H // 8, W // 8

    imgs = normalize_images(batch.images)
    fmaps = net.apply(params, imgs, method=DroidNet.features)
    ctx, inp = net.apply(params, imgs, method=DroidNet.context)

    f = fmaps.transpose(0, 3, 1, 2)
    if bf16_pyramid:
        cp = corr.CorrPyramid(
            list(corr.build_pyramid_bf16(f[ii], f[jj])))
    else:
        cp = corr.CorrPyramid(
            [lv for lv in
             corr.build_pyramid(corr.build_volume(f[ii], f[jj]))])

    coords0 = camera.coords_grid(h, w)
    poses = jnp.tile(se3.identity(), (N, 1))
    # initialize poses 0..fixedp-1 at GT (gauge)
    poses = poses.at[:fixedp].set(batch.poses_gt[:fixedp])
    disps = jnp.ones((N, h, w))

    net_h = ctx[ii].astype(jnp.bfloat16)
    inp_i = inp[ii].astype(jnp.bfloat16)
    # context gate constants: inp_i is constant across the unrolled
    # iterations, so its share of the GRU gate convs runs once here
    gates_inp = net.apply(params, inp_i,
                          method=DroidNet.update_precompute)

    # segment = unique source-frame slot (static from host ii)
    ii_np = np.asarray(ii)
    kx, kk_inv = np.unique(ii_np, return_inverse=True)
    seg = jnp.asarray(kk_inv.astype(np.int32))
    K = int(kx.shape[0])
    kx_j = jnp.asarray(kx.astype(np.int32))

    coords1, _, _ = camera.projective_transform(
        poses, disps, batch.intrinsics, ii, jj)
    target = coords1

    def one_step(params, net_h, coords1, target, poses, disps):
        coords1 = jax.lax.stop_gradient(coords1)
        target = jax.lax.stop_gradient(target)
        poses = jax.lax.stop_gradient(poses)
        disps = jax.lax.stop_gradient(disps)

        cvals = cp(coords1).transpose(0, 2, 3, 1).astype(jnp.bfloat16)
        motion = jnp.clip(jnp.concatenate(
            [coords1 - coords0, target - coords1], -1), -64.0, 64.0)

        net_h, delta, weight, eta, upmask = net.apply(
            params, net_h, inp_i, cvals, motion.astype(jnp.bfloat16),
            seg, K, True, None, gates_inp, method=DroidNet.update)

        target = coords1 + delta
        eta_full = jnp.full((N, h, w), 1e-4).at[kx_j].set(eta)
        for _ in range(2):
            poses, disps = ba.ba_step(
                target, weight, eta_full, poses, disps,
                batch.intrinsics, ii, jj, fixedp=fixedp,
                ep=0.1, lm=1e-4)

        coords1, valid, _ = camera.projective_transform(
            poses, disps, batch.intrinsics, ii, jj)
        residual = (target - coords1) * valid
        return net_h, coords1, target, poses, disps, residual

    if remat:
        one_step = jax.checkpoint(one_step)

    poses_list, disps_list, residual_list = [], [], []
    for _ in range(num_steps):
        (net_h, coords1, target, poses, disps, residual) = one_step(
            params, net_h, coords1, target, poses, disps)
        residual_list.append(residual)
        poses_list.append(poses)
        disps_list.append(disps)

    return poses_list, disps_list, residual_list


def droid_loss(net, params, batch: TrainBatch, ii, jj,
               num_steps: int = 8, w_pose: float = 10.0,
               w_flow: float = 0.1, w_res: float = 0.01,
               remat: bool = False, bf16_pyramid: bool = False):
    """Total training loss (weights as in the DROID paper recipe)."""
    poses_list, disps_list, residuals = droid_forward(
        net, params, batch, ii, jj, num_steps, remat=remat,
        bf16_pyramid=bf16_pyramid)
    lg, mg = geodesic_loss(batch.poses_gt, poses_list, ii, jj)
    lf, mf = flow_loss(batch.poses_gt, batch.disps_gt, poses_list,
                       disps_list, batch.intrinsics, ii, jj)
    lr = residual_loss(residuals)
    loss = w_pose * lg + w_flow * lf + w_res * lr
    metrics = {"loss": loss, "geodesic": lg, "flow": lf,
               "residual": lr, **mg, **mf}
    return loss, metrics


def make_train_step(net: DroidNet, optimizer, ii, jj, num_steps: int = 8,
                    remat: bool = False, bf16_pyramid: bool = False):
    """Jitted Adam step over droid_loss."""
    import optax

    @jax.jit
    def step(params, opt_state, batch: TrainBatch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: droid_loss(net, p, batch, ii, jj, num_steps,
                                 remat=remat,
                                 bf16_pyramid=bf16_pyramid),
            has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_grad_fn(net: DroidNet, ii, jj, num_steps: int = 8,
                 remat: bool = False, bf16_pyramid: bool = False):
    """Jitted (grads, metrics) for ONE scene -- the accumulation unit.

    BA-in-the-loop gradients are noisy across procedural scenes (one
    hard scene can throw a 10x loss spike); the curriculum trainer
    averages several scenes' grads per optimizer step."""

    @jax.jit
    def gstep(params, batch: TrainBatch, g_sum):
        """g_sum: running grad accumulator (zeros-like params to start);
        returns (g_sum + grads, metrics) in ONE dispatch."""
        (_, metrics), grads = jax.value_and_grad(
            lambda p: droid_loss(net, p, batch, ii, jj, num_steps,
                                 remat=remat,
                                 bf16_pyramid=bf16_pyramid),
            has_aux=True)(params)
        g_sum = jax.tree.map(lambda s, g: s + g, g_sum, grads)
        return g_sum, metrics

    return gstep


def make_apply_fn(optimizer, ema_decay: float = 0.0):
    """Jitted optimizer apply over pre-averaged grads; optionally
    maintains an exponential moving average of the weights (the EMA is
    what ships -- it smooths the noise floor of small-batch training)."""
    import optax

    @jax.jit
    def apply(params, opt_state, g_sum, inv_n, ema):
        """inv_n: 1/num_accumulated (traced scalar)."""
        grads = jax.tree.map(lambda g: g * inv_n, g_sum)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay > 0.0:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e
                + (1.0 - ema_decay) * p.astype(e.dtype), ema, params)
        return params, opt_state, ema

    return apply


def make_eval_fn(net: DroidNet, ii, jj, num_steps: int = 8,
                 remat: bool = False, bf16_pyramid: bool = False):
    """Jitted loss/metrics only (no grads) for held-out scenes."""

    @jax.jit
    def ev(params, batch: TrainBatch):
        _, metrics = droid_loss(net, params, batch, ii, jj, num_steps,
                                remat=remat, bf16_pyramid=bf16_pyramid)
        return metrics

    return ev
