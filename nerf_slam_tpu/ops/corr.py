"""All-pairs correlation volumes and windowed bilinear lookup (JAX).

TPU-native equivalent of the reference CorrBlock / corr_index_forward
(/root/reference/networks/modules/corr.py:23-72,
 /root/reference/src/correlation_kernels.cu:19-70).

Layout notes (must match the reference exactly because the pretrained
corr-encoder conv expects this channel ordering):
  - the volume for an edge is (H1, W1, H2, W2) = <fmap1[y,x], fmap2[v,u]>/16
  - lookup output channels enumerate the (2r+1)x(2r+1) window with the
    *x-offset major*: channel c = a*(2r+1)+b samples (x0 - r + a, y0 - r + b)
    (see corr_index_forward_kernel: out[n][i][j] with i from the x loop)
  - 4 pyramid levels, lookup at coords/2^l, channels concatenated
    level-major -> 4*49 = 196 channels.

The volume build is a pure matmul (MXU); the lookup is a gather over a
(2r+2)^2 support grid with bilinear recombination, which XLA vectorizes
well.  Out-of-bounds taps contribute zero, as in the CUDA kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """All-pairs correlation.

    fmap1, fmap2: (E, C, H, W) feature maps (bf16 ok).
    Returns (E, H, W, H, W) fp32 volume, scaled by 1/16 (corr.py:63-72).
    """
    E, C, H, W = fmap1.shape
    f1 = fmap1.reshape(E, C, H * W).astype(jnp.float32) / 4.0
    f2 = fmap2.reshape(E, C, H * W).astype(jnp.float32) / 4.0
    vol = jnp.einsum("ecn,ecm->enm", f1, f2)
    return vol.reshape(E, H, W, H, W)


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 average pool with floor semantics on the last two dims."""
    *lead, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[..., : H2 * 2, : W2 * 2]
    x = x.reshape(*lead, H2, 2, W2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(volume: jax.Array, num_levels: int = 4):
    """(E, H1, W1, H2, W2) -> list of levels with target dims halved."""
    pyramid = [volume]
    for _ in range(num_levels - 1):
        pyramid.append(_avg_pool2(pyramid[-1]))
    return pyramid


def build_pyramid_bf16(fmap1: jax.Array, fmap2: jax.Array,
                       num_levels: int = 4, pad_rows_to: int = 1):
    """Fused volume + pyramid entirely in bf16, built per-level from
    POOLED FEATURES, never by pooling the volume.

    Correlation is linear in fmap2, so avg-pooling the volume over
    target coordinates equals correlating against avg-pooled features
    (exactly, including the floor-crop semantics) -- the level-l volume
    is one matmul against a 4^-l-sized feature map instead of a strided
    reduction over a ~2 GB level-(l-1) volume.  Measured: 95 ms -> a few
    ms for the full 4-level build at 96 edges on TPU v5e.

    pad_rows_to > 1 zero-pads each level's target-row dim H_l up to a
    multiple (padded rows correlate to exactly 0, which reproduces the
    out-of-bounds-tap semantics of every lookup path); the grouped
    Pallas kernel requires sublane-aligned rows (pad_rows_to=8).
    """
    E, C, H, W = fmap1.shape
    f1 = fmap1.reshape(E, C, H * W).astype(jnp.bfloat16) / 4.0
    f2 = fmap2.astype(jnp.bfloat16) / 4.0
    levels = []
    for _ in range(num_levels):
        Hl, Wl = f2.shape[-2:]
        Hp = -(-Hl // pad_rows_to) * pad_rows_to
        f2p = jnp.pad(f2, ((0, 0), (0, 0), (0, Hp - Hl), (0, 0)))
        vol = jnp.einsum("ecn,ecm->enm", f1,
                         f2p.reshape(E, C, Hp * Wl),
                         preferred_element_type=jnp.float32)
        levels.append(vol.astype(jnp.bfloat16)
                      .reshape(E, H, W, Hp, Wl))
        f2 = _avg_pool2(f2)
    return levels


def lookup_level_onehot(volume: jax.Array, coords: jax.Array,
                        radius: int = 3) -> jax.Array:
    """Windowed lookup as dense one-hot contractions -- zero gathers.

    The (2r+2)-tap y- and x-selections become one-hot matrices contracted
    against the volume on the MXU/VPU: ~5 GFLOP at frontend sizes instead
    of ~10M scalar gathers.  Measured 41 ms vs 203 ms (blocks) vs 668 ms
    (per-tap) at 48 edges x 4 levels on TPU v5e.  Exact (one-hot products
    with f32 accumulation).  Same semantics as :func:`lookup_level`.
    """
    E, H1, W1, H2, W2 = volume.shape
    r = radius
    rd = 2 * r + 1
    n_sup = rd + 1

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]
    dy = (y0 - fy)[..., None]
    xi = fx.astype(jnp.int32) - r
    yi = fy.astype(jnp.int32) - r

    Yk = jnp.arange(H2, dtype=jnp.int32)
    Xk = jnp.arange(W2, dtype=jnp.int32)
    # oy[..., b, Y] = (Y == yi + b); out-of-range taps select nothing,
    # which reproduces the zero-padding of the CUDA kernel
    oy = (Yk[None, None, None, None, :]
          == (yi[..., None] + jnp.arange(n_sup))[..., None]
          ).astype(volume.dtype)
    ox = (Xk[None, None, None, None, :]
          == (xi[..., None] + jnp.arange(n_sup))[..., None]
          ).astype(volume.dtype)

    t1 = jnp.einsum("ehwYX,ehwbY->ehwbX", volume, oy,
                    preferred_element_type=jnp.float32)
    # keep f32 through the second selection: one-hot products stay exact
    S = jnp.einsum("ehwbX,ehwaX->ehwba", t1, ox.astype(jnp.float32),
                   preferred_element_type=jnp.float32)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (w00[..., None] * S[..., :rd, :rd]
           + w10[..., None] * S[..., :rd, 1:]
           + w01[..., None] * S[..., 1:, :rd]
           + w11[..., None] * S[..., 1:, 1:])
    out = jnp.transpose(out, (0, 4, 3, 1, 2))
    return out.reshape(E, rd * rd, H1, W1)


def lookup_level_patch(volume: jax.Array, coords: jax.Array,
                       radius: int = 3) -> jax.Array:
    """Windowed lookup via one (8 x 16) patch gather per pixel.

    The whole (y-taps x x-span) support patch is fetched as a single
    gather slice (lax.gather slice_sizes=(1, 8, 16)): ~650k gather rows
    per level at frontend sizes instead of 13.9M one-float taps --
    gathers on TPU cost ~6 ns per row regardless of width.

    Same semantics as :func:`lookup_level` (oracle-tested).
    """
    E, H1, W1, H2, W2 = volume.shape
    r = radius
    rd = 2 * r + 1
    n_sup = rd + 1

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]
    dy = (y0 - fy)[..., None]

    # pad: y by n_sup on both sides; x by 8 front and >=16 back so every
    # (8, 16) slice is in range after shifting
    volp = jnp.pad(volume, ((0, 0), (0, 0), (0, 0),
                            (n_sup, n_sup), (8, 24)))
    H2p, W2p = volp.shape[-2:]
    B = E * H1 * W1
    op = volp.reshape(B, H2p, W2p)

    xi = jnp.clip(fx.astype(jnp.int32) - r + 8, 0, W2p - 16)
    yi = jnp.clip(fy.astype(jnp.int32) - r + n_sup, 0, H2p - n_sup)
    b0 = xi // 8
    sh = xi - b0 * 8                          # 0..7 within the block pair
    starts = jnp.stack([yi.reshape(B), (b0 * 8).reshape(B)],
                       axis=-1)[:, None, :]

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(),
        start_index_map=(1, 2), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    blocks = jax.lax.gather(op, starts, dn, slice_sizes=(1, 8, 16),
                            mode="clip")
    blocks = blocks.reshape(E, H1, W1, n_sup, 16)       # (.., y_tap, 16)

    # extract the 8-wide span starting at sh via a dense one-hot
    # contraction (vector selects, no gathers)
    k16 = jnp.arange(16, dtype=jnp.int32)
    shift = (k16[None, None, None, :, None]
             == (sh[..., None, None] + jnp.arange(n_sup)[None, None, None,
                                                         None, :])
             ).astype(blocks.dtype)
    S = jnp.einsum("ehwyk,ehwkx->ehwyx", blocks, shift)

    # validity of each tap in original (unpadded) coordinates: the span
    # starts at padded x = xi, i.e. unpadded x = xi - 8
    xs = (xi - 8)[..., None] + jnp.arange(n_sup)
    ys = (yi - n_sup)[..., None] + jnp.arange(n_sup)
    in_x = (xs >= 0) & (xs < W2)
    in_y = (ys >= 0) & (ys < H2)
    S = S * (in_y[..., :, None] & in_x[..., None, :]).astype(S.dtype)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (w00[..., None] * S[..., :rd, :rd]
           + w10[..., None] * S[..., :rd, 1:]
           + w01[..., None] * S[..., 1:, :rd]
           + w11[..., None] * S[..., 1:, 1:])
    out = jnp.transpose(out, (0, 4, 3, 1, 2))
    return out.reshape(E, rd * rd, H1, W1)


def lookup_level_blocks(volume: jax.Array, coords: jax.Array,
                        radius: int = 3) -> jax.Array:
    """Windowed lookup via aligned 8-wide block gathers.

    TPU gathers cost ~6 ns per *row* regardless of row width (measured),
    so the naive one-float-per-tap formulation (64 rows/pixel/level) is
    gather-bound.  Here each (pixel, y-tap) fetches two aligned 8-float
    blocks covering the x-span -- 16 rows/pixel/level, 4x fewer rows.

    Same semantics as :func:`lookup_level`.
    """
    E, H1, W1, H2, W2 = volume.shape
    r = radius
    rd = 2 * r + 1
    n_sup = rd + 1          # 8 taps per axis

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]
    dy = (y0 - fy)[..., None]

    # pad W2 to a multiple of 8 plus one spare block, H2 by n_sup, and
    # shift so negative starts stay in range
    Wb_pad = ((W2 + 8 + 2 * 8 - 1) // 8 + 1) * 8
    volp = jnp.pad(volume,
                   ((0, 0), (0, 0), (0, 0),
                    (n_sup, n_sup),
                    (8, Wb_pad - W2 - 8)))
    H2p = H2 + 2 * n_sup
    Wb = volp.shape[-1] // 8
    vflat = volp.reshape(E, H1, W1, H2p * Wb, 8)

    xi = fx.astype(jnp.int32) - r + 8        # shifted x start
    yi = fy.astype(jnp.int32) - r + n_sup    # shifted y start
    xi = jnp.clip(xi, 0, Wb * 8 - 16)
    yi = jnp.clip(yi, 0, H2p - n_sup)
    b0 = xi // 8                              # first aligned block
    sh = xi - b0 * 8                          # within-block offset (0..7)

    taps = jnp.arange(n_sup, dtype=jnp.int32)
    yrow = (yi[..., None] + taps) * Wb        # (E,H1,W1,8)
    idx = jnp.stack([yrow + b0[..., None], yrow + b0[..., None] + 1],
                    axis=-1).reshape(E, H1, W1, 2 * n_sup)
    blocks = jnp.take_along_axis(vflat, idx[..., None], axis=3)
    blocks = blocks.reshape(E, H1, W1, n_sup, 16)      # per y-tap, 16 x

    # extract the 8-wide span starting at sh (0..7) from the 16 values
    # via a dense one-hot contraction (vector selects, no gathers)
    k16 = jnp.arange(16, dtype=jnp.int32)
    shift = (k16[None, None, None, :, None]
             == (sh[..., None, None] + jnp.arange(n_sup)[None, None, None,
                                                         None, :])
             ).astype(blocks.dtype)                  # (E,H1,W1,16,8)
    S = jnp.einsum("ehwyk,ehwkx->ehwyx", blocks, shift)
    # S: (E, H1, W1, y_tap(8), x_tap(8))

    # validity of each tap (original unpadded bounds)
    xs = (xi - 8)[..., None] + jnp.arange(n_sup)
    ys = (yi - n_sup)[..., None] + jnp.arange(n_sup)
    in_x = (xs >= 0) & (xs < W2)
    in_y = (ys >= 0) & (ys < H2)
    S = S * (in_y[..., :, None] & in_x[..., None, :]).astype(S.dtype)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (w00[..., None] * S[..., :rd, :rd]
           + w10[..., None] * S[..., :rd, 1:]
           + w01[..., None] * S[..., 1:, :rd]
           + w11[..., None] * S[..., 1:, 1:])
    out = jnp.transpose(out, (0, 4, 3, 1, 2))
    return out.reshape(E, rd * rd, H1, W1)


def lookup_level(volume: jax.Array, coords: jax.Array,
                 radius: int = 3) -> jax.Array:
    """Sample a (2r+1)^2 window from one pyramid level.

    volume: (E, H1, W1, H2, W2); coords: (E, H1, W1, 2) as [x, y] in level
    pixel units.  Returns (E, (2r+1)^2, H1, W1), channels x-offset major.
    """
    E, H1, W1, H2, W2 = volume.shape
    r = radius
    rd = 2 * r + 1

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]            # (E,H1,W1,1)
    dy = (y0 - fy)[..., None]

    # support grid: (2r+2) x (2r+2) integer taps from floor - r
    n_sup = rd + 1
    offs = jnp.arange(n_sup, dtype=jnp.int32)
    xi = fx.astype(jnp.int32)[..., None] - r + offs[None, None, None, :]
    yi = fy.astype(jnp.int32)[..., None] - r + offs[None, None, None, :]

    in_x = (xi >= 0) & (xi < W2)
    in_y = (yi >= 0) & (yi < H2)
    xi_c = jnp.clip(xi, 0, W2 - 1)
    yi_c = jnp.clip(yi, 0, H2 - 1)

    # flat gather over (H2*W2): indices (E,H1,W1, n_sup*n_sup) x-major? we
    # build (y, x) pairs with y varying over one axis and x the other
    vol_flat = volume.reshape(E, H1, W1, H2 * W2)
    idx = (yi_c[..., :, None] * W2 + xi_c[..., None, :])   # (E,H1,W1,ny,nx)
    idx = idx.reshape(E, H1, W1, n_sup * n_sup)
    S = jnp.take_along_axis(vol_flat, idx, axis=-1)
    S = S.reshape(E, H1, W1, n_sup, n_sup)                  # [y_tap, x_tap]
    mask = (in_y[..., :, None] & in_x[..., None, :]).astype(S.dtype)
    S = S * mask

    # bilinear recombination: out[b, a] over window offsets (a=x, b=y)
    w00 = (1 - dx) * (1 - dy)   # (E,H1,W1,1)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (w00[..., None] * S[..., :rd, :rd]
           + w10[..., None] * S[..., :rd, 1:]
           + w01[..., None] * S[..., 1:, :rd]
           + w11[..., None] * S[..., 1:, 1:])               # (E,H1,W1,b,a)

    # channel = a*rd + b (x-offset major, matching the CUDA layout)
    out = jnp.transpose(out, (0, 4, 3, 1, 2))               # (E,a,b,H1,W1)
    return out.reshape(E, rd * rd, H1, W1)


class CorrPyramid:
    """Precomputed 4-level correlation pyramid for a set of edges.

    Functional analogue of the reference CorrBlock: supports lookup,
    concatenation (edge add) and masking/indexing (edge remove) by
    operating on stacked arrays.
    """

    def __init__(self, levels, radius: int = 3):
        self.levels = list(levels)
        self.radius = radius

    @staticmethod
    def build(fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4,
              radius: int = 3) -> "CorrPyramid":
        vol = build_volume(fmap1, fmap2)
        return CorrPyramid(build_pyramid(vol, num_levels), radius)

    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords: (E, H1, W1, 2) [x, y] at level-0 resolution.
        Returns (E, L*(2r+1)^2, H1, W1)."""
        outs = []
        for lvl, vol in enumerate(self.levels):
            outs.append(lookup_level_onehot(vol, coords / (2 ** lvl),
                                            self.radius))
        return jnp.concatenate(outs, axis=1)

    def cat(self, other: "CorrPyramid") -> "CorrPyramid":
        return CorrPyramid(
            [jnp.concatenate([a, b], axis=0)
             for a, b in zip(self.levels, other.levels)], self.radius)

    def __getitem__(self, index) -> "CorrPyramid":
        return CorrPyramid([lvl[index] for lvl in self.levels], self.radius)


def alt_corr_level(fmap1: jax.Array, fmap2: jax.Array, coords: jax.Array,
                   radius: int = 3, chunk: int = 8) -> jax.Array:
    """On-the-fly windowed correlation (no volume materialization).

    Equivalent of altcorr_forward (src/altcorr_kernel.cu:27-355): for each
    pixel of fmap1, dot its feature with bilinear taps of fmap2 around
    ``coords``.  fmap1: (E, C, H1, W1) level-0 features; fmap2:
    (E, C, H2, W2) features at this pyramid level; coords in level units.
    Returns (E, (2r+1)^2, H1, W1).  Chunked over edges to bound memory.
    """
    E, C, H1, W1 = fmap1.shape
    H2, W2 = fmap2.shape[-2:]
    r = radius
    rd = 2 * r + 1
    n_sup = rd + 1

    def one(args):
        f1, f2, co = args  # (C,H1,W1), (C,H2,W2), (H1,W1,2)
        x0, y0 = co[..., 0], co[..., 1]
        fx, fy = jnp.floor(x0), jnp.floor(y0)
        dx = (x0 - fx)[..., None]
        dy = (y0 - fy)[..., None]
        offs = jnp.arange(n_sup, dtype=jnp.int32)
        xi = fx.astype(jnp.int32)[..., None] - r + offs
        yi = fy.astype(jnp.int32)[..., None] - r + offs
        in_x = (xi >= 0) & (xi < W2)
        in_y = (yi >= 0) & (yi < H2)
        xi_c = jnp.clip(xi, 0, W2 - 1)
        yi_c = jnp.clip(yi, 0, H2 - 1)
        idx = (yi_c[..., :, None] * W2 + xi_c[..., None, :]
               ).reshape(H1, W1, n_sup * n_sup)
        f2f = f2.reshape(C, H2 * W2).astype(jnp.float32) / 4.0
        # gather taps: (H1, W1, n_sup^2, C)
        taps = f2f.T[idx]
        # dot with f1: (H1, W1, n_sup^2)
        S = jnp.einsum("hwsc,chw->hws",
                       taps, f1.astype(jnp.float32) / 4.0)
        S = S.reshape(H1, W1, n_sup, n_sup)
        mask = (in_y[..., :, None] & in_x[..., None, :]).astype(S.dtype)
        S = S * mask
        out = ((1 - dx)[..., None] * (1 - dy)[..., None] * S[..., :rd, :rd]
               + dx[..., None] * (1 - dy)[..., None] * S[..., :rd, 1:]
               + (1 - dx)[..., None] * dy[..., None] * S[..., 1:, :rd]
               + dx[..., None] * dy[..., None] * S[..., 1:, 1:])
        # S layout is [y_tap, x_tap]; channel = a*rd + b (x-major)
        out = jnp.transpose(out, (3, 2, 0, 1))
        return out.reshape(rd * rd, H1, W1)

    return jax.lax.map(one, (fmap1, fmap2, coords), batch_size=chunk)
