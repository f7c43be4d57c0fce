"""Native frameops: parity with numpy references."""
import numpy as np
import pytest

from nerf_slam_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; numpy fallback covered implicitly")
    return lib


def test_srgb_parity(lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 40, 3), np.uint8)
    got = native.srgb_u8_to_linear(img)
    x = img.astype(np.float32) / 255.0
    want = np.where(x <= 0.04045, x / 12.92,
                    ((x + 0.055) / 1.055) ** 2.4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_parity(lib):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 20, 3), np.uint8)
    got = native.normalize_image_u8(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depth_scale(lib):
    rng = np.random.RandomState(2)
    d = rng.randint(0, 65535, (24, 32), np.uint16)
    got = native.depth_u16_to_f32(d, 1e-3)
    np.testing.assert_allclose(got, d.astype(np.float32) * 1e-3,
                               rtol=1e-6)


def test_resize_bilinear_close_to_cv2(lib):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    got = native.resize_bilinear_u8(img, 24, 32)
    want = cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
    # implementations may differ by rounding on edge pixels
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0


def test_resize_nearest(lib):
    img = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = native.resize_nearest_f32(img, 2, 3)
    np.testing.assert_allclose(out, img[::2, ::2])
