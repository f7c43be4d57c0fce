import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.ops import corr


def np_lookup_oracle(volume, coords, radius):
    """Straightforward numpy oracle: channel (a,b) = bilinear sample of
    volume[y, x] at (x0 - r + a, y0 - r + b), zero outside."""
    E, H1, W1, H2, W2 = volume.shape
    rd = 2 * radius + 1
    out = np.zeros((E, rd * rd, H1, W1), dtype=np.float64)
    for e in range(E):
        for y in range(H1):
            for x in range(W1):
                x0, y0 = coords[e, y, x]
                for a in range(rd):
                    for b in range(rd):
                        sx = x0 - radius + a
                        sy = y0 - radius + b
                        fx, fy = np.floor(sx), np.floor(sy)
                        dx, dy = sx - fx, sy - fy
                        val = 0.0
                        for (iy, wy) in ((int(fy), 1 - dy),
                                         (int(fy) + 1, dy)):
                            for (ix, wx) in ((int(fx), 1 - dx),
                                             (int(fx) + 1, dx)):
                                if 0 <= iy < H2 and 0 <= ix < W2:
                                    val += wy * wx * volume[e, y, x, iy, ix]
                        out[e, a * rd + b, y, x] = val
    return out


def test_lookup_matches_oracle():
    rng = np.random.RandomState(0)
    E, H1, W1, H2, W2 = 2, 4, 5, 6, 7
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 - 1, H2 - 1])).astype(np.float32)
    r = 2
    out = corr.lookup_level(jnp.asarray(vol), jnp.asarray(coords), radius=r)
    oracle = np_lookup_oracle(vol, coords, r)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)


def test_lookup_integer_coords_is_direct_index():
    rng = np.random.RandomState(1)
    E, H, W = 1, 5, 5
    vol = rng.randn(E, H, W, H, W).astype(np.float32)
    # coords = own pixel position
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([x, y], -1).astype(np.float32)[None]
    r = 1
    out = np.asarray(corr.lookup_level(jnp.asarray(vol),
                                       jnp.asarray(coords), radius=r))
    rd = 2 * r + 1
    for yy in range(1, H - 1):
        for xx in range(1, W - 1):
            for a in range(rd):
                for b in range(rd):
                    want = vol[0, yy, xx, yy - r + b, xx - r + a]
                    got = out[0, a * rd + b, yy, xx]
                    assert abs(want - got) < 1e-5


def test_volume_is_feature_dot():
    rng = np.random.RandomState(2)
    E, C, H, W = 2, 16, 4, 4
    f1 = rng.randn(E, C, H, W).astype(np.float32)
    f2 = rng.randn(E, C, H, W).astype(np.float32)
    vol = np.asarray(corr.build_volume(jnp.asarray(f1), jnp.asarray(f2)))
    want = np.einsum("echw,ecuv->ehwuv", f1, f2) / 16.0
    np.testing.assert_allclose(vol, want, atol=1e-4)


def test_pyramid_levels_shrink():
    vol = jnp.ones((1, 8, 8, 10, 12))
    pyr = corr.build_pyramid(vol, 4)
    assert pyr[0].shape == (1, 8, 8, 10, 12)
    assert pyr[1].shape == (1, 8, 8, 5, 6)
    assert pyr[2].shape == (1, 8, 8, 2, 3)
    assert pyr[3].shape == (1, 8, 8, 1, 1)


def test_alt_corr_matches_volume_lookup():
    rng = np.random.RandomState(3)
    E, C, H, W = 2, 8, 5, 6
    f1 = rng.randn(E, C, H, W).astype(np.float32)
    f2 = rng.randn(E, C, H, W).astype(np.float32)
    coords = (rng.rand(E, H, W, 2) *
              np.array([W - 1, H - 1])).astype(np.float32)
    vol = corr.build_volume(jnp.asarray(f1), jnp.asarray(f2))
    want = corr.lookup_level(vol, jnp.asarray(coords), radius=3)
    got = corr.alt_corr_level(jnp.asarray(f1), jnp.asarray(f2),
                              jnp.asarray(coords), radius=3, chunk=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_corr_pyramid_api():
    rng = np.random.RandomState(4)
    f1 = jnp.asarray(rng.randn(3, 8, 6, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(3, 8, 6, 8).astype(np.float32))
    cp = corr.CorrPyramid.build(f1, f2)
    coords = jnp.asarray((rng.rand(3, 6, 8, 2) *
                          np.array([7.0, 5.0])).astype(np.float32))
    out = cp(coords)
    assert out.shape == (3, 4 * 49, 6, 8)
    # cat + index
    cp2 = cp.cat(cp)
    assert cp2.levels[0].shape[0] == 6
    cp3 = cp2[jnp.array([0, 2, 4])]
    assert cp3.levels[0].shape[0] == 3


def test_lookup_blocks_matches_reference_lookup():
    rng = np.random.RandomState(7)
    E, H1, W1, H2, W2 = 3, 6, 7, 9, 11
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr.lookup_level(jnp.asarray(vol), jnp.asarray(coords), 3)
    got = corr.lookup_level_blocks(jnp.asarray(vol), jnp.asarray(coords), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_lookup_patch_matches_reference_lookup():
    rng = np.random.RandomState(8)
    E, H1, W1, H2, W2 = 3, 6, 7, 9, 11
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr.lookup_level(jnp.asarray(vol), jnp.asarray(coords), 3)
    got = corr.lookup_level_patch(jnp.asarray(vol), jnp.asarray(coords), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_lookup_onehot_matches_reference_lookup():
    rng = np.random.RandomState(9)
    E, H1, W1, H2, W2 = 3, 6, 7, 9, 11
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr.lookup_level(jnp.asarray(vol), jnp.asarray(coords), 3)
    got = corr.lookup_level_onehot(jnp.asarray(vol), jnp.asarray(coords), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_lookup_pallas_matches_reference_lookup():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(10)
    E, H1, W1, H2, W2 = 3, 6, 7, 9, 11
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr.lookup_level(
        jnp.asarray(vol).astype(jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(coords), 3)
    volp = corr_pallas.pad_level(jnp.asarray(vol))
    got = corr_pallas.lookup_level_pallas(volp, jnp.asarray(coords),
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_corr_pyramid_pallas_matches_onehot_pyramid():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(11)
    E, C, H, W = 2, 16, 8, 10
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32))
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32))
    vol = corr.build_volume(f1, f2)
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W - 1, H - 1])
         ).astype(np.float32))
    want = corr.CorrPyramid(corr.build_pyramid(vol))(coords)
    got = corr_pallas.CorrPyramidPallas.from_volume(
        vol, interpret=True)(coords)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_lookup_pallas_grouped_matches_reference_lookup():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(12)
    # W1 = 16 so the grouped path (G=16) is exercised, not the fallback
    E, H1, W1, H2, W2 = 2, 3, 16, 9, 11
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr.lookup_level(
        jnp.asarray(vol).astype(jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(coords), 3)
    volp = corr_pallas.pad_level(jnp.asarray(vol))
    got = corr_pallas.lookup_level_pallas_grouped_nhwc(
        volp, jnp.asarray(coords), interpret=True)
    got = jnp.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_lookup_pallas_grouped_fallback_odd_width():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(13)
    E, H1, W1, H2, W2 = 2, 3, 7, 9, 11   # W1 % 16 != 0 -> fallback
    vol = rng.randn(E, H1, W1, H2, W2).astype(np.float32)
    coords = (rng.rand(E, H1, W1, 2) *
              np.array([W2 + 2, H2 + 2]) - 1.5).astype(np.float32)
    want = corr_pallas.lookup_level_pallas_nhwc(
        corr_pallas.pad_level(jnp.asarray(vol)), jnp.asarray(coords),
        interpret=True)
    got = corr_pallas.lookup_level_pallas_grouped_nhwc(
        corr_pallas.pad_level(jnp.asarray(vol)), jnp.asarray(coords),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_build_pyramid_bf16_matches_volume_pooling():
    rng = np.random.RandomState(14)
    E, C, H, W = 2, 16, 10, 12
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    # reference: pool the f32 volume
    want = corr.build_pyramid(corr.build_volume(f1, f2), 4)
    got = corr.build_pyramid_bf16(f1, f2, 4)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g, dtype=np.float32),
                                   np.asarray(w), atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_lookup_pyramid_fused_matches_per_level():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(15)
    E, C, H, W = 2, 16, 16, 16
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    levels = [lv.astype(jnp.bfloat16)
              for lv in corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8)]
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W - 1., H - 1.])
         ).astype(np.float32))
    fused = corr_pallas.lookup_pyramid_pallas_nhwc(tuple(levels), coords,
                                                   interpret=True)
    per = []
    for lvl, v in enumerate(levels):
        per.append(corr_pallas.lookup_level_pallas_nhwc(
            v, coords / (2 ** lvl), interpret=True))
    per = jnp.concatenate(per, axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(per),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_lookup_pyramid_l0_matches_per_level():
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(16)
    E, C, H, W = 2, 16, 18, 20   # odd halving: crops exercise masking
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    levels4 = [lv.astype(jnp.bfloat16)
               for lv in corr.build_pyramid_bf16(f1, f2, 4)]
    vol0 = corr.build_pyramid_bf16(f1, f2, 1, pad_rows_to=8)[0]
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W + 2., H + 2.]) - 1.5
         ).astype(np.float32))
    dims = corr_pallas.pyramid_dims(H, W)
    got = corr_pallas.lookup_pyramid_l0_nhwc(vol0, coords, dims,
                                             interpret=True)
    per = []
    for lvl, v in enumerate(levels4):
        per.append(corr_pallas.lookup_level_pallas_nhwc(
            v, coords / (2 ** lvl), interpret=True))
    per = jnp.concatenate(per, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(per),
                               atol=3e-2, rtol=3e-2)


def test_lookup_grouped4_matches_pyramid_reference():
    """Fused grouped weighted-hot 4-level kernel vs the XLA pyramid."""
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(15)
    E, C, H, W = 2, 16, 16, 16    # W1 = 16 exercises the grouped path
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    levels = corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8)
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W + 2, H + 2]) - 1.5
         ).astype(np.float32))
    want = corr.CorrPyramid(
        [lv.astype(jnp.float32) for lv in levels])(coords)
    want = jnp.transpose(want, (0, 2, 3, 1))     # -> NHWC
    dims = corr_pallas.pyramid_dims(H, W)
    got = corr_pallas.lookup_pyramid_grouped4_nhwc(
        tuple(levels), coords, dims, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_lookup_grouped4_gated_matches_ungated_prefix():
    """n_act gating: active-prefix rows match the ungated kernel; padded
    rows are don't-care (masked downstream by edge validity)."""
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(16)
    E, C, H, W = 4, 16, 16, 16
    n_act = 2
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    levels = corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8)
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W + 2, H + 2]) - 1.5
         ).astype(np.float32))
    dims = corr_pallas.pyramid_dims(H, W)
    full = corr_pallas.lookup_pyramid_grouped4_nhwc(
        tuple(levels), coords, dims, interpret=True)
    gated = corr_pallas.lookup_pyramid_grouped4_nhwc(
        tuple(levels), coords, dims, interpret=True,
        n_act=jnp.int32(n_act))
    # the gated variant emits bf16 (the GRU consumes bf16)
    np.testing.assert_allclose(np.asarray(gated[:n_act], np.float32),
                               np.asarray(full[:n_act]),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_lookup_grouped4_fallback_small():
    """Odd widths take the per-pixel fallback and still match."""
    from nerf_slam_tpu.ops import corr_pallas
    rng = np.random.RandomState(16)
    E, C, H, W = 1, 8, 8, 10      # W1 % 16 != 0 -> fallback
    f1 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(E, C, H, W).astype(np.float32) * 0.3)
    levels = corr.build_pyramid_bf16(f1, f2, 4, pad_rows_to=8)
    coords = jnp.asarray(
        (rng.rand(E, H, W, 2) * np.array([W - 1, H - 1])
         ).astype(np.float32))
    want = corr.CorrPyramid(
        [lv.astype(jnp.float32) for lv in levels])(coords)
    want = jnp.transpose(want, (0, 2, 3, 1))
    dims = corr_pallas.pyramid_dims(H, W)
    got = corr_pallas.lookup_pyramid_grouped4_nhwc(
        tuple(levels), coords, dims, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
