"""Pallas TPU kernel for the windowed correlation-volume lookup.

Alternative to the XLA one-hot formulation in ``ops/corr.py``; equivalent
of the reference CUDA sampler ``corr_index_forward``
(/root/reference/src/correlation_kernels.cu:19-70), with identical
semantics: bilinear samples of a (2r+1)^2 window around per-pixel flow
coords; out-of-bounds taps contribute zero; output channels x-offset
major.

Kernel shape: grid = (E, H1) -- one program per (edge, source row).
The program's volume slab V[e, y, :, :, :] lives in VMEM; both the y
and x window selections are per-pixel one-hot contractions on the MXU
-- no gathers, no dynamic slices, and taps outside the volume select
nothing (exact zeros), so no padding or masking is needed anywhere.
All kernel tensors keep source pixels on sublanes (dim 0) and the
contraction axis on lanes, the Mosaic-friendly layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RD = 7          # window size (2r+1), r=3
_NSUP = 8        # support taps per axis (2r+2)


def pad_level(volume: jax.Array) -> jax.Array:
    """(E, H1, W1, H2, W2) -> bf16 volume for the kernel (no padding
    needed: out-of-bounds taps self-mask through the one-hot selects)."""
    return volume.astype(jnp.bfloat16)


def _bcast(v2d, shape):
    """(W1, 1) -> shape, broadcasting along trailing dims."""
    return jax.lax.broadcast_in_dim(v2d, shape, (0, 1))


def _lookup_kernel(yi_ref, xi_ref, dx_ref, dy_ref, vol_ref, out_ref):
    """One (edge, R-source-rows) program; P = R * W1 pixels.

    yi_ref:  (1, R, W1, 1) int32 VMEM  -- y window start (may be OOB)
    xi_ref:  (1, R, W1, 1) int32 VMEM  -- x window start (may be OOB)
    dx_ref:  (1, R, W1, 1) f32 VMEM
    dy_ref:  (1, R, W1, 1) f32 VMEM
    vol_ref: (1, R, W1, H2, W2) bf16 VMEM
    out_ref: (1, R, W1, NSUP, NSUP) f32 VMEM (only [:7, :7] is live;
             Mosaic cannot collapse (7, 7) lanes to 49, so the caller
             slices and reshapes)
    """
    _, R, W1, H2, W2 = vol_ref.shape
    P = R * W1

    # y one-hot: OHY[p, b, Y] = (Y == yi[p] + b)
    yi = yi_ref[0].reshape(P, 1)
    Yids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 2)
    bids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 1)
    OHY = (Yids == _bcast(yi, (P, _NSUP, H2)) + bids
           ).astype(jnp.bfloat16)

    # rows[p, b, X] = sum_Y OHY[p, b, Y] * vol[p, Y, X]
    rows = jax.lax.dot_general(
        OHY, vol_ref[0].reshape(P, H2, W2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # x one-hot with the tap axis leading: OHX[p, a, X] = (X == xi[p] + a)
    xi = xi_ref[0].reshape(P, 1)
    Xids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 2)
    aids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 1)
    OHX = (Xids == _bcast(xi, (P, _NSUP, W2)) + aids
           ).astype(jnp.bfloat16)

    # S[p, a, b] = sum_X OHX[p, a, X] * rows[p, b, X]
    S = jax.lax.dot_general(
        OHX, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (P, 8a, 8b)

    dx = dx_ref[0].reshape(P, 1)
    dy = dy_ref[0].reshape(P, 1)
    sq = (P, _RD, _RD)
    w00 = _bcast((1 - dx) * (1 - dy), sq)
    w10 = _bcast(dx * (1 - dy), sq)
    w01 = _bcast((1 - dx) * dy, sq)
    w11 = _bcast(dx * dy, sq)
    # S is [a, b]-ordered: dx shifts a (x taps), dy shifts b (y taps)
    out = (w00 * S[:, :_RD, :_RD] + w10 * S[:, 1:, :_RD]
           + w01 * S[:, :_RD, 1:] + w11 * S[:, 1:, 1:])    # (P, a, b)

    out_ref[0, :, :, : _RD, : _RD] = out.reshape(R, W1, _RD, _RD)


def _auto_interpret(interpret: bool) -> bool:
    """Pallas TPU kernels run interpreted on the CPU backend (tests)."""
    return interpret or jax.default_backend() == "cpu"


def _level_lookup_body(yi, xi, dx, dy, vol, out_ref, lvl):
    """Per-pixel batched one-hot lookup for ONE level (v1 kernel body).

    yi/xi: (P, 1) int32 window starts; dx/dy: (P, 1) f32; vol: (P, H2,
    W2) bf16 value; writes out_ref[0, :, :, lvl, :RD, :RD].
    """
    P, H2, W2 = vol.shape
    _, R, W1 = out_ref.shape[:3]

    Yids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 2)
    bids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, H2), 1)
    OHY = (Yids == _bcast(yi, (P, _NSUP, H2)) + bids
           ).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        OHY, vol, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    Xids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 2)
    aids = jax.lax.broadcasted_iota(jnp.int32, (P, _NSUP, W2), 1)
    OHX = (Xids == _bcast(xi, (P, _NSUP, W2)) + aids
           ).astype(jnp.bfloat16)
    S = jax.lax.dot_general(
        OHX, rows, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (P, 8a, 8b)

    sq = (P, _RD, _RD)
    w00 = _bcast((1 - dx) * (1 - dy), sq)
    w10 = _bcast(dx * (1 - dy), sq)
    w01 = _bcast((1 - dx) * dy, sq)
    w11 = _bcast(dx * dy, sq)
    out = (w00 * S[:, :_RD, :_RD] + w10 * S[:, 1:, :_RD]
           + w01 * S[:, :_RD, 1:] + w11 * S[:, 1:, 1:])    # (P, a, b)
    out_ref[0, :, :, lvl, : _RD, : _RD] = out.reshape(R, W1, _RD, _RD)


def _lookup_pyramid_kernel(pix_ref, v0_ref, v1_ref, v2_ref, v3_ref,
                           out_ref):
    """ALL 4 pyramid levels in one program: per-level window math on the
    VPU, then the v1 per-pixel one-hot lookups.  One grid instead of
    four slashes per-program overhead 4x -- the dominant cost at
    frontend sizes (the per-level compute is tiny)."""
    _, R, W1, _ = pix_ref.shape
    P = R * W1
    r = _RD // 2
    x0 = pix_ref[0, :, :, 0:1].reshape(P, 1)
    y0 = pix_ref[0, :, :, 1:2].reshape(P, 1)

    for lvl, vref in enumerate((v0_ref, v1_ref, v2_ref, v3_ref)):
        _, _, _, H2, W2 = vref.shape
        inv = 1.0 / (2 ** lvl)
        xl = x0 * inv
        yl = y0 * inv
        fx = jnp.floor(xl)
        fy = jnp.floor(yl)
        dx = xl - fx
        dy = yl - fy
        xi = jnp.clip(fx.astype(jnp.int32) - r, -_NSUP, W2 + _NSUP)
        yi = jnp.clip(fy.astype(jnp.int32) - r, -_NSUP, H2 + _NSUP)
        _level_lookup_body(yi, xi, dx, dy, vref[0].reshape(P, H2, W2),
                           out_ref, lvl)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lookup_pyramid_pallas_nhwc(levels, coords: jax.Array,
                               interpret: bool = False) -> jax.Array:
    """Fused 4-level windowed lookup: (E, H1, W1, 196) f32, channels
    level-major then x-offset major (the CorrBlock contract)."""
    interpret = _auto_interpret(interpret)
    E, H1, W1 = coords.shape[:3]
    assert len(levels) == 4

    def r8(n):
        return -(-n // 8) * 8

    def r128(n):
        return -(-n // 128) * 128

    slab_unit = sum(W1 * r8(v.shape[-2]) * r128(v.shape[-1]) * 2
                    for v in levels)
    # the out block pays TPU tile padding on its two minor dims
    # ((_NSUP, _NSUP) -> (8, 128)); omitting it from the row budget
    # blew the 16 MB scoped-vmem limit at small H1 where many rows fit
    # the volume budget (seen at 168x320: R=7 -> 16.41 MB)
    out_unit = W1 * 4 * r8(_NSUP) * r128(_NSUP) * 4
    R = max(1, min(H1, (14 * 1024 * 1024)
                   // max(2 * (slab_unit + out_unit), 1)))
    while R > 1 and H1 % R:
        R -= 1

    grid = (E, H1 // R)
    vol_specs = [
        pl.BlockSpec((1, R, W1, v.shape[-2], v.shape[-1]),
                     lambda e, y: (e, y, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for v in levels
    ]
    out = pl.pallas_call(
        _lookup_pyramid_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, R, W1, 2), lambda e, y: (e, y, 0, 0),
                               memory_space=pltpu.VMEM)] + vol_specs,
        out_specs=pl.BlockSpec((1, R, W1, 4, _NSUP, _NSUP),
                               lambda e, y: (e, y, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H1, W1, 4, _NSUP, _NSUP),
                                       jnp.float32),
        interpret=interpret,
    )(coords.astype(jnp.float32), *levels)
    # channel = lvl*49 + a*7 + b (level-major, x-offset major)
    out = out[..., : _RD, : _RD].reshape(E, H1, W1, 4 * _RD * _RD)
    return out


def _make_l0_kernel(dims):
    """Kernel factory: 4-level lookup from the LEVEL-0 slab only.

    Avg-pooling commutes with windowed sampling, so a level-l tap equals
    the mean of its 2^l x 2^l level-0 block: the one-hot y-select for
    level l is just ``(Y0 >> l) == yi_l + b`` (a range indicator), and
    the 4^-l normalization folds into the bilinear weights.  Levels 1-3
    never touch HBM -- one slab stream instead of four, and the edge
    state only stores level 0.  ``dims``: ((H_l, W_l) x 4) REAL (crop-
    floored) level dims; taps at or beyond H_l/W_l are masked, which
    also keeps cropped and padded level-0 rows out of the averages.
    """
    def kernel(pix_ref, vol_ref, out_ref):
        _, R, W1, H2p, W2 = vol_ref.shape
        P = R * W1
        r = _RD // 2
        x0 = pix_ref[0, :, :, 0:1].reshape(P, 1)
        y0 = pix_ref[0, :, :, 1:2].reshape(P, 1)
        vol = vol_ref[0].reshape(P, H2p, W2)

        for lvl, (Hl, Wl) in enumerate(dims):
            inv = 1.0 / (2 ** lvl)
            xl = x0 * inv
            yl = y0 * inv
            fx = jnp.floor(xl)
            fy = jnp.floor(yl)
            dx = xl - fx
            dy = yl - fy
            xi = jnp.clip(fx.astype(jnp.int32) - r, -_NSUP, Wl + _NSUP)
            yi = jnp.clip(fy.astype(jnp.int32) - r, -_NSUP, Hl + _NSUP)

            Yblk = jax.lax.broadcasted_iota(
                jnp.int32, (P, _NSUP, H2p), 2) >> lvl
            bids = jax.lax.broadcasted_iota(
                jnp.int32, (P, _NSUP, H2p), 1)
            tgt = _bcast(yi, (P, _NSUP, H2p)) + bids
            OHY = ((Yblk == tgt) & (tgt < Hl)).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                OHY, vol, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

            Xblk = jax.lax.broadcasted_iota(
                jnp.int32, (P, _NSUP, W2), 2) >> lvl
            aids = jax.lax.broadcasted_iota(
                jnp.int32, (P, _NSUP, W2), 1)
            tgx = _bcast(xi, (P, _NSUP, W2)) + aids
            OHX = ((Xblk == tgx) & (tgx < Wl)).astype(jnp.bfloat16)
            S = jax.lax.dot_general(
                OHX, rows,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (P, 8a, 8b)

            scale = inv * inv                # 4^-l block-mean norm
            sq = (P, _RD, _RD)
            w00 = _bcast(scale * (1 - dx) * (1 - dy), sq)
            w10 = _bcast(scale * dx * (1 - dy), sq)
            w01 = _bcast(scale * (1 - dx) * dy, sq)
            w11 = _bcast(scale * dx * dy, sq)
            out = (w00 * S[:, :_RD, :_RD] + w10 * S[:, 1:, :_RD]
                   + w01 * S[:, :_RD, 1:] + w11 * S[:, 1:, 1:])
            out_ref[0, :, :, lvl, : _RD, : _RD] = out.reshape(
                R, W1, _RD, _RD)

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def lookup_pyramid_l0_nhwc(vol0: jax.Array, coords: jax.Array,
                           dims, interpret: bool = False) -> jax.Array:
    """Fused 4-level lookup from the level-0 volume alone.

    vol0: (E, H1, W1, H2p, W2) bf16 (H2p >= dims[0][0], extra rows are
    never read); coords: (E, H1, W1, 2) level-0 units; dims: static
    ((H_l, W_l) x 4) real level dims.  Returns (E, H1, W1, 196).
    """
    interpret = _auto_interpret(interpret)
    E, H1, W1, H2p, W2 = vol0.shape

    def r8(n):
        return -(-n // 8) * 8

    def r128(n):
        return -(-n // 128) * 128

    # the four unrolled levels' temporaries stack on the scoped-vmem
    # stack at ~40 KB per pixel (one-hots + f32/bf16 row buffers x 4
    # levels); budget slab (double-buffered) + temporaries <= ~11 MB
    slab_unit = W1 * r8(H2p) * r128(W2) * 2
    out_unit = W1 * 4 * r8(_NSUP) * r128(_NSUP) * 4   # tile-padded out
    per_row = 2 * slab_unit + W1 * 40 * 1024 + out_unit
    R = max(1, min(H1, (11 * 1024 * 1024) // max(per_row, 1)))
    while R > 1 and H1 % R:
        R -= 1

    grid = (E, H1 // R)
    out = pl.pallas_call(
        _make_l0_kernel(tuple(dims)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, W1, 2), lambda e, y: (e, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W1, H2p, W2),
                         lambda e, y: (e, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W1, 4, _NSUP, _NSUP),
                               lambda e, y: (e, y, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H1, W1, 4, _NSUP, _NSUP),
                                       jnp.float32),
        interpret=interpret,
    )(coords.astype(jnp.float32), vol0)
    out = out[..., : _RD, : _RD].reshape(E, H1, W1, 4 * _RD * _RD)
    return out


def pyramid_dims(h: int, w: int, num_levels: int = 4):
    """Real (floor-cropped) level dims for an (h, w) level-0 volume."""
    dims = []
    for _ in range(num_levels):
        dims.append((h, w))
        h, w = h // 2, w // 2
    return tuple(dims)


# ---------------------------------------------------------------------------
# grouped weighted-hot pyramid kernel ("pallas4g")
#
# The per-pixel one-hot formulation issues (8, H2)@(H2, W2) matmuls --
# ~1.5% MXU utilization, measured 20 ms per lookup at frontend sizes
# (74% of the whole GRU+DBA iteration).  This kernel restores MXU
# utilization with three changes:
#   1. G = 16 pixels share one block-diagonal matmul (full 128-row MXU
#      ops), as in the grouped v1 kernel;
#   2. the bilinear interpolation folds INTO the selects: each one-hot
#      row carries TWO adjacent nonzeros weighted (1-d, d), so the
#      output is the interpolated 7x7 window directly -- no VPU bilinear
#      pass and one less tap row of matmul work;
#   3. all 4 levels run from their own POOLED slabs in one program
#      (3x fewer contraction FLOPs than deriving levels 1-3 from the
#      level-0 slab via range indicators).
# ---------------------------------------------------------------------------


def _make_grouped4_kernel(dims, gated: bool = False):
    """dims: ((H_l, W_l) x 4) REAL level dims (slabs may pad rows).

    ``gated``: the kernel takes a leading scalar-prefetch ref holding the
    ACTIVE edge count; programs for padded edge slots skip all compute
    (their outputs are garbage, masked downstream by edge validity), and
    their input index maps clamp to the last active edge so the pipeline
    elides the repeated DMAs."""

    def kernel(*refs):
        if gated:
            n_ref, pix_ref, v0_ref, v1_ref, v2_ref, v3_ref, out_ref = refs
        else:
            pix_ref, v0_ref, v1_ref, v2_ref, v3_ref, out_ref = refs
        _, R, W1, _ = pix_ref.shape
        out_dtype = out_ref.dtype
        G = _G
        per_row = W1 // G
        n_groups = R * per_row
        r = _RD // 2
        vrefs = (v0_ref, v1_ref, v2_ref, v3_ref)

        def io3(shape, dim):
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

        # group-invariant index/mask constants, built ONCE per program.
        # The weighted one-hots are EXACT bilinear hats:
        #   OHY[(p,b), (p2,Y)] = [p2==p][Y<Hl] relu(1 - |Y - (yi+b+dy)|)
        # (weight (1-dy) lands on Y==yi+b and dy on Y==yi+b+1, zero
        # elsewhere -- identical to the two-tap eq/where construction
        # but ~half the VPU ops, which dominate this kernel)
        consts = []
        for lvl, vref in enumerate(vrefs):
            Hl, _ = dims[lvl]
            H2p, W2 = vref.shape[-2:]
            GH = G * H2p
            colY = io3((G, 8, GH), 2)
            Yv = colY % H2p
            mY = (((colY // H2p) == io3((G, 8, GH), 0))
                  & (Yv < Hl))
            # Yv + b folded into one float constant per (b, Y) cell;
            # the validity mask folds in as a far-away base (the hat
            # then clamps to 0) -- saves one big-domain multiply per
            # level in the hot loop, where VPU elementwise work is the
            # kernel's bottleneck
            ybase = jnp.where(
                mY,
                Yv.astype(jnp.float32)
                - io3((G, 8, GH), 1).astype(jnp.float32), 1e9)
            Wl = dims[lvl][1]
            colX = io3((G, 8, W2), 2)
            mX = colX < Wl
            xbase = jnp.where(
                mX,
                colX.astype(jnp.float32)
                - io3((G, 8, W2), 1).astype(jnp.float32), 1e9)
            consts.append((ybase, xbase))
        bd = ((io3((G * 8, G * 8), 0) // 8)
              == (io3((G * 8, G * 8), 1) // 8)).astype(jnp.float32)
        SEL = (io3((G * 8, 8), 0) % 8
               == io3((G * 8, 8), 1)).astype(jnp.float32)

        def body(g, _):
            r_idx = g // per_row
            w0 = (g % per_row) * G
            sl = pl.ds(w0, G)
            x0 = pix_ref[0, r_idx, sl, 0:1]          # (G, 1)
            y0 = pix_ref[0, r_idx, sl, 1:2]

            for lvl, vref in enumerate(vrefs):
                Hl, Wl = dims[lvl]
                _, _, _, H2p, W2 = vref.shape
                GH = G * H2p
                ybase, xbase = consts[lvl]
                inv = 1.0 / (2 ** lvl)
                xl = x0 * inv
                yl = y0 * inv
                fx = jnp.floor(xl)
                fy = jnp.floor(yl)
                dx = xl - fx
                dy = yl - fy
                xi = jnp.clip(fx - r, -float(_NSUP), float(Wl + _NSUP))
                yi = jnp.clip(fy - r, -float(_NSUP), float(Hl + _NSUP))

                V = vref[0, r_idx, sl].reshape(GH, W2)   # bf16

                # y-hot as a hat around y* = yi + b + dy (see consts);
                # NaN coords must select NOTHING (the eq-based
                # construction returned zeros for NaN) -- push them far
                # out before broadcasting (cheap: (G, 1) scalars)
                ystar = jax.lax.broadcast_in_dim(
                    jnp.nan_to_num(yi + dy, nan=-1e4), (G, 8, GH),
                    (0, 1))
                OHY = jnp.maximum(
                    1.0 - jnp.abs(ybase - ystar), 0.0) \
                    .astype(jnp.bfloat16).reshape(G * 8, GH)

                rows = jax.lax.dot_general(
                    OHY, V, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)               # ((p,b), W2)

                # x-hot hat around x* = xi + a + dx
                xstar = jax.lax.broadcast_in_dim(
                    jnp.nan_to_num(xi + dx, nan=-1e4), (G, 8, W2),
                    (0, 1))
                OHX = jnp.maximum(
                    1.0 - jnp.abs(xbase - xstar), 0.0) \
                    .astype(jnp.bfloat16).reshape(G * 8, W2)

                # M[(p,b), (p2,a)]; the block diagonal (p2 == p) is the
                # live part, folded out with a masked matmul
                M = jax.lax.dot_general(
                    rows, OHX,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (G*8, G*8)
                Mbd = M * bd
                S = jax.lax.dot_general(
                    Mbd, SEL,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # ((p,b), 8a)
                S = S.reshape(G, 8, 8)                   # (p, b, a)
                # output contract is (a, b) x-offset major
                out_ref[0, r_idx, sl, lvl] = jnp.swapaxes(
                    S, -1, -2).astype(out_dtype)
            return 0

        if gated:
            # gated grid order is (y, edge): edge is the INNER dim, so
            # the clamped DMAs of consecutive padded slots repeat the
            # same block index and the pipeline elides the re-fetch
            @pl.when(pl.program_id(1) < n_ref[0])
            def _():
                jax.lax.fori_loop(0, n_groups, body, 0)
        else:
            jax.lax.fori_loop(0, n_groups, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def lookup_pyramid_grouped4_nhwc(levels, coords: jax.Array, dims,
                                 interpret: bool = False,
                                 n_act: jax.Array | None = None
                                 ) -> jax.Array:
    """Fused grouped 4-level lookup from pooled bf16 slabs.

    levels: 4 x (E, H1, W1, H2p_l, W2_l) bf16 (rows padded to 8);
    coords: (E, H1, W1, 2) level-0 [x, y]; dims: static real level dims.
    ``n_act`` (traced int32 scalar, optional): number of ACTIVE edges --
    active edges always occupy the slot prefix, so programs for slots
    >= n_act skip compute and their DMAs collapse (scalar prefetch);
    their output rows are garbage, masked downstream by edge validity.
    Returns (E, H1, W1, 196) f32, channels level-major then x-major.
    """
    interpret = _auto_interpret(interpret)
    E, H1, W1 = coords.shape[:3]
    assert len(levels) == 4
    # grouping assumes G-aligned source rows and sublane-aligned slab
    # rows (the (G, H2p, W2) -> (G*H2p, W2) collapse); tiny test images
    # fall back to the per-pixel kernels
    if (W1 % _G != 0 or any(v.shape[-2] % 8 or v.shape[-2] == 0
                            or v.shape[-1] == 0 for v in levels)):
        if all(v.shape[-2] > 0 and v.shape[-1] > 0 for v in levels):
            return lookup_pyramid_pallas_nhwc(tuple(levels), coords,
                                              interpret=interpret)
        return jnp.concatenate(
            [lookup_level_pallas_nhwc(v, coords / (2 ** lvl),
                                      interpret=interpret)
             for lvl, v in enumerate(levels)], axis=-1)

    def r128(n):
        return -(-n // 128) * 128

    # VMEM: all four slabs (double-buffered) + group temporaries + the
    # tile-padded out block ((_NSUP, _NSUP) minor dims pad to (8, 128);
    # flattening to (W1, 256) would kill the padding but Mosaic cannot
    # shape-cast (G, 8, 8) -> (G, 64) across sublane/lane tiles)
    slab_unit = sum(W1 * lv.shape[-2] * r128(lv.shape[-1]) * 2
                    for lv in levels)
    out_unit = W1 * 4 * 8 * 128 * 4
    R = max(1, min(H1, (13 * 1024 * 1024)
                   // max(2 * (slab_unit + out_unit), 1)))
    while R > 1 and H1 % R:
        R -= 1

    grid = (E, H1 // R)
    if n_act is None:
        vol_specs = [
            pl.BlockSpec((1, R, W1, v.shape[-2], v.shape[-1]),
                         lambda e, y: (e, y, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for v in levels
        ]
        out = pl.pallas_call(
            _make_grouped4_kernel(tuple(dims)),
            grid=grid,
            in_specs=[pl.BlockSpec((1, R, W1, 2),
                                   lambda e, y: (e, y, 0, 0),
                                   memory_space=pltpu.VMEM)] + vol_specs,
            out_specs=pl.BlockSpec((1, R, W1, 4, _NSUP, _NSUP),
                                   lambda e, y: (e, y, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, H1, W1, 4, _NSUP, _NSUP),
                                           jnp.float32),
            interpret=interpret,
        )(coords.astype(jnp.float32), *levels)
    else:
        # active-edge-gated variant: grid is (y, edge) -- edge INNER --
        # and padded slots clamp their input blocks to the last active
        # edge, so consecutive repeats are elided by the DMA pipeline;
        # gated programs skip all compute.  Output is bf16 (the GRU
        # consumes bf16), halving the (E, H1, W1, 256) writeback.
        def eclamp(y, e, n):
            return (jnp.minimum(e, jnp.maximum(n[0] - 1, 0)), y, 0, 0, 0)

        vol_specs = [
            pl.BlockSpec((1, R, W1, v.shape[-2], v.shape[-1]), eclamp,
                         memory_space=pltpu.VMEM)
            for v in levels
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H1 // R, E),
            in_specs=[pl.BlockSpec(
                (1, R, W1, 2),
                lambda y, e, n: (jnp.minimum(e, jnp.maximum(n[0] - 1, 0)),
                                 y, 0, 0),
                memory_space=pltpu.VMEM)] + vol_specs,
            out_specs=pl.BlockSpec((1, R, W1, 4, _NSUP, _NSUP),
                                   lambda y, e, n: (e, y, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _make_grouped4_kernel(tuple(dims), gated=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, H1, W1, 4, _NSUP, _NSUP),
                                           jnp.bfloat16),
            interpret=interpret,
        )(jnp.asarray(n_act, jnp.int32).reshape(1),
          coords.astype(jnp.float32), *levels)
    out = out[..., : _RD, : _RD].reshape(E, H1, W1, 4 * _RD * _RD)
    return out


_G = 16          # pixels per grouped matmul (G*8 = 128 MXU rows)


def _lookup_kernel_grouped(yi_ref, xi_ref, dx_ref, dy_ref, vol_ref,
                           out_ref):
    """Grouped-matmul variant: G pixels share one block-diagonal one-hot.

    The per-pixel formulation issues (8, H2)@(H2, W2) matmuls -- ~1% MXU
    utilization.  Here G=16 pixels are fused into a single
    (G*8, G*H2)@(G*H2, W2) matmul (block-diagonal one-hot selects), a
    full-height MXU op; the G-fold one-hot redundancy is far cheaper
    than the 100x utilization loss it removes.  The x-select is a second
    fused matmul producing all (pixel, y-tap) x (pixel', x-tap) cross
    terms; the block diagonal is then reduced out on the VPU.
    """
    _, R, W1, H2, W2 = vol_ref.shape
    P = R * W1
    G = _G
    n_groups = P // G
    per_row = W1 // G                 # groups per source row (W1 % G == 0)
    GH = G * H2

    def io3(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    def body(g, _):
        r_idx = g // per_row
        w0 = (g % per_row) * G
        sl = pl.ds(w0, G)
        # slice REFS with dynamic starts (Mosaic supports ref
        # ds-indexing; dynamic_slice on values is not implemented)
        yi_g = yi_ref[0, r_idx, sl]             # (G, 1)
        xi_g = xi_ref[0, r_idx, sl]
        dx_g = dx_ref[0, r_idx, sl]
        dy_g = dy_ref[0, r_idx, sl]
        V = vol_ref[0, r_idx, sl].reshape(GH, W2)   # bf16; H2 % 8 == 0

        # OHY[(p,b), (p2,Y)] = (p2 == p) & (Y == yi[p] + b), built in 3D
        # (G, 8, G*H2) and collapsed (leading-dim collapse with an
        # 8-multiple second-minor is the Mosaic-legal shape cast)
        yiB = jax.lax.broadcast_in_dim(yi_g, (G, 8, GH), (0, 1))
        tgtY = yiB + io3((G, 8, GH), 1)
        colY = io3((G, 8, GH), 2)
        OHY = ((colY % H2 == tgtY) & (colY // H2 == io3((G, 8, GH), 0))
               ).astype(jnp.bfloat16).reshape(G * 8, GH)

        rows = jax.lax.dot_general(
            OHY, V, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # rows: (G*8 = (p, b), W2)

        # OHX[(p2,a), X] = (X == xi[p2] + a)
        xiB = jax.lax.broadcast_in_dim(xi_g, (G, 8, W2), (0, 1))
        tgtX = xiB + io3((G, 8, W2), 1)
        OHX = (io3((G, 8, W2), 2) == tgtX).astype(jnp.bfloat16) \
            .reshape(G * 8, W2)

        # M[(p,b), (p2,a)] = sum_X rows * OHX  (cross terms p2 != p are
        # the price of one full-height MXU matmul; masked out next)
        M = jax.lax.dot_general(
            rows, OHX, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (G*8, G*8)

        # block-diagonal fold: S[(p,b), a] = M[(p,b), (p,a)] via a masked
        # matmul (2D iota masks only -- no strided slicing)
        rowp = io3((G * 8, G * 8), 0) // 8
        colp = io3((G * 8, G * 8), 1) // 8
        Mbd = M * (rowp == colp).astype(jnp.float32)
        SEL = (io3((G * 8, 8), 0) % 8 == io3((G * 8, 8), 1)
               ).astype(jnp.float32)                # (G*8 (p2,a), 8 a')
        S = jax.lax.dot_general(
            Mbd, SEL, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (G*8 (p,b), 8 a)
        S = S.reshape(G, 8, 8)                      # (p, b, a)

        dx = jax.lax.broadcast_in_dim(dx_g, (G, 1, 1), (0, 1))
        dy = jax.lax.broadcast_in_dim(dy_g, (G, 1, 1), (0, 1))
        sq = (G, _RD, _RD)

        def b3(v):
            return jax.lax.broadcast_in_dim(v, sq, (0, 1, 2))

        # b-axis (dim 1) holds y taps, a-axis (dim 2) x taps
        out = (b3((1 - dx) * (1 - dy)) * S[:, :_RD, :_RD]
               + b3(dx * (1 - dy)) * S[:, :_RD, 1:]
               + b3((1 - dx) * dy) * S[:, 1:, :_RD]
               + b3(dx * dy) * S[:, 1:, 1:])        # (G, b, a)

        out_ref[0, r_idx, sl, : _RD, : _RD] = out
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lookup_level_pallas_grouped_nhwc(volp: jax.Array, coords: jax.Array,
                                     interpret: bool = False) -> jax.Array:
    """Grouped-matmul windowed lookup; output channels (b, a) = y-major
    (callers must transpose to the x-major contract -- see
    :class:`CorrPyramidPallas`, which handles it)."""
    interpret = _auto_interpret(interpret)
    E, H1, W1, H2, W2 = volp.shape
    if H2 == 0 or W2 == 0:
        return jnp.zeros((E, H1, W1, _RD * _RD), jnp.float32)
    r = _RD // 2

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx).astype(jnp.float32)
    dy = (y0 - fy).astype(jnp.float32)
    xi = jnp.clip(fx.astype(jnp.int32) - r, -_NSUP, W2 + _NSUP)
    yi = jnp.clip(fy.astype(jnp.int32) - r, -_NSUP, H2 + _NSUP)

    def r8(n):
        return -(-n // 8) * 8

    def r128(n):
        return -(-n // 128) * 128

    slab_unit = W1 * r8(H2) * r128(W2) * 2
    # Mosaic allocates each in-kernel loop iteration's temporaries on the
    # scoped-vmem stack, so cap the group loop length as well as the slab
    max_loop = 12
    R = max(1, min(H1, (4 * 1024 * 1024) // max(slab_unit, 1),
                   max(1, (max_loop * _G) // max(W1, 1))))
    while R > 1 and H1 % R:
        R -= 1
    # the output write assumes a group never straddles source rows, and
    # the kernel's (G, H2, W2) -> (G*H2, W2) collapse needs sublane-
    # aligned rows (build the pyramid with pad_rows_to=8)
    if W1 % _G != 0 or H2 % 8 != 0:
        return lookup_level_pallas_nhwc(volp, coords, interpret=interpret)

    grid = (E, H1 // R)
    spec_pix = pl.BlockSpec((1, R, W1, 1), lambda e, y: (e, y, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _lookup_kernel_grouped,
        grid=grid,
        in_specs=[
            spec_pix,
            spec_pix,
            spec_pix,
            spec_pix,
            pl.BlockSpec((1, R, W1, H2, W2),
                         lambda e, y: (e, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W1, _NSUP, _NSUP),
                               lambda e, y: (e, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H1, W1, _NSUP, _NSUP),
                                       jnp.float32),
        interpret=interpret,
    )(yi[..., None], xi[..., None], dx[..., None], dy[..., None], volp)
    # out[..., b, a]: transpose to the x-major channel contract a*7+b
    out = jnp.swapaxes(out[..., : _RD, : _RD], -1, -2)
    return out.reshape(E, H1, W1, _RD * _RD)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lookup_level_pallas_nhwc(volp: jax.Array, coords: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Windowed bilinear lookup from one bf16 pyramid level.

    volp:   (E, H1, W1, H2, W2) bf16
    coords: (E, H1, W1, 2) [x, y] float, in level units
    Returns (E, H1, W1, 49) f32, channels x-offset major.
    """
    interpret = _auto_interpret(interpret)
    E, H1, W1, H2, W2 = volp.shape
    if H2 == 0 or W2 == 0:   # degenerate level (tiny test images):
        return jnp.zeros((E, H1, W1, _RD * _RD), jnp.float32)
    r = _RD // 2

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx).astype(jnp.float32)
    dy = (y0 - fy).astype(jnp.float32)
    # clip wildly-OOB starts to harmless sentinels (one-hots then select
    # nothing -> exact zeros, the CUDA kernel's OOB behavior)
    xi = jnp.clip(fx.astype(jnp.int32) - r, -_NSUP, W2 + _NSUP)
    yi = jnp.clip(fy.astype(jnp.int32) - r, -_NSUP, H2 + _NSUP)

    # rows per program: amortize per-program latency while bounding VMEM.
    # VMEM tiles pad the last two dims to (8, 128), so budget against
    # PADDED sizes: slab = R*W1*r8(H2)*r128(W2) bf16 (double-buffered),
    # plus ~16 KB/pixel of one-hot + matmul workspace.  Prefer exact
    # divisors of H1 so no program sees padding rows.
    def r8(n):
        return -(-n // 8) * 8

    def r128(n):
        return -(-n // 128) * 128

    slab_unit = W1 * r8(H2) * r128(W2) * 2
    R = max(1, min(H1,
                   (2 * 1024 * 1024) // max(slab_unit, 1),
                   384 // W1 if W1 <= 384 else 1))
    while R > 1 and H1 % R:
        R -= 1

    grid = (E, H1 // R)
    spec_pix = pl.BlockSpec((1, R, W1, 1), lambda e, y: (e, y, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _lookup_kernel,
        grid=grid,
        in_specs=[
            spec_pix,
            spec_pix,
            spec_pix,
            spec_pix,
            pl.BlockSpec((1, R, W1, H2, W2),
                         lambda e, y: (e, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W1, _NSUP, _NSUP),
                               lambda e, y: (e, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H1, W1, _NSUP, _NSUP),
                                       jnp.float32),
        interpret=interpret,
    )(yi[..., None], xi[..., None], dx[..., None], dy[..., None], volp)
    # channel = a*7 + b (x-offset major)
    return out[..., : _RD, : _RD].reshape(E, H1, W1, _RD * _RD)


def lookup_level_pallas(volp: jax.Array, coords: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(E, 49, H1, W1) channel-major variant (corr.lookup_level API)."""
    out = lookup_level_pallas_nhwc(volp, coords, interpret=interpret)
    return jnp.transpose(out, (0, 3, 1, 2))


class CorrPyramidPallas:
    """4-level correlation pyramid with Pallas lookup.

    Drop-in for ``corr.CorrPyramid`` on the tracking hot path: same
    ``__call__(coords) -> (E, 196, H1, W1)`` contract, plus an
    NHWC-native ``nhwc(coords) -> (E, H1, W1, 196)`` used by the fused
    update step.  Levels are stored bf16.
    """

    def __init__(self, levels, radius: int = 3, interpret: bool = False,
                 grouped: bool = False):
        assert radius == 3, "kernel is specialized to radius 3"
        self.levels = list(levels)
        self.radius = radius
        self.interpret = interpret
        self.grouped = grouped

    @staticmethod
    def from_volume(volume: jax.Array, num_levels: int = 4,
                    interpret: bool = False) -> "CorrPyramidPallas":
        from . import corr
        return CorrPyramidPallas(
            [pad_level(lv)
             for lv in corr.build_pyramid(volume, num_levels)],
            interpret=interpret)

    def nhwc(self, coords: jax.Array) -> jax.Array:
        ok4 = (len(self.levels) == 4
               and all(v.shape[-1] > 0 and v.shape[-2] > 0
                       for v in self.levels))
        if ok4 and not self.grouped:
            return lookup_pyramid_pallas_nhwc(
                tuple(lv.astype(jnp.bfloat16) for lv in self.levels),
                coords, interpret=self.interpret)
        fn = (lookup_level_pallas_grouped_nhwc if self.grouped
              else lookup_level_pallas_nhwc)
        outs = []
        for lvl, volp in enumerate(self.levels):
            outs.append(fn(volp, coords / (2 ** lvl),
                           interpret=self.interpret))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, coords: jax.Array) -> jax.Array:
        outs = []
        for lvl, volp in enumerate(self.levels):
            outs.append(lookup_level_pallas(volp, coords / (2 ** lvl),
                                            interpret=self.interpret))
        return jnp.concatenate(outs, axis=1)
