"""Native data-plane tests: build, cv2 parity, fused batch preprocess."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nope_tpu import native
from nope_tpu.geometry.cropping import crop_homography, get_perspective_transform

K = np.array([[525, 0, 256], [0, 525, 256], [0, 0, 1]], dtype=np.float64)


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def test_native_warp_matches_cv2_f32(lib_available, rng):
    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    src = np.array([[10, 12], [8, 80], [120, 10], [118, 88]], np.float32)
    dst = np.array([[0, 0], [0, 64], [64, 0], [64, 64]], np.float32)
    M = get_perspective_transform(src, dst)
    ours = native.warp_perspective(img, M, 64)
    theirs = cv2.warpPerspective(img, M, (64, 64))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_native_warp_matches_cv2_u8(lib_available, rng):
    img = rng.integers(0, 255, (128, 128, 3), np.uint8)
    src = np.array([[10, 12], [8, 110], [120, 10], [118, 118]], np.float32)
    dst = np.array([[0, 0], [0, 64], [64, 0], [64, 64]], np.float32)
    M = get_perspective_transform(src, dst)
    ours = native.warp_perspective(img, M, 64)
    theirs = cv2.warpPerspective(img, M, (64, 64))
    # cv2's u8 path uses 5-bit fixed-point interpolation; allow +-1 LSB
    # on nearly all pixels
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert np.mean(diff <= 1) > 0.99
    assert diff.max() <= 4


def test_composite_rgba(lib_available, rng):
    rgba = rng.integers(0, 255, (32, 32, 4), np.uint8)
    rgb = native.composite_rgba_black(rgba)
    expected = (
        (rgba[..., :3].astype(np.uint16) * rgba[..., 3:4].astype(np.uint16) + 127)
        // 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(rgb, expected)


def test_preprocess_batch_fused(lib_available, rng):
    b, s = 3, 64
    rgba = rng.integers(0, 255, (b, 128, 128, 4), np.uint8)
    from nope_tpu.geometry import so3_grid

    poses = so3_grid.load_obj_poses(2)[:b].copy()
    poses[:, :3, 3] *= 2.0
    Ms = np.stack([crop_homography(K, p, s, virtual_bbox_size=1.0) for p in poses])
    fused = native.preprocess_batch(rgba, Ms, s, num_threads=2)
    assert fused.shape == (b, s, s, 3)
    assert fused.min() >= -1.0 and fused.max() <= 1.0

    # reference path: composite → warp(float) → normalize
    for i in range(b):
        rgb = native.composite_rgba_black(rgba[i]).astype(np.float32)
        warped = cv2.warpPerspective(rgb, Ms[i], (s, s))
        expected = warped * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(fused[i], expected, atol=4e-3)


def test_fallback_paths(monkeypatch, rng):
    """Numpy fallbacks must work when the library is unavailable."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    rgba = rng.integers(0, 255, (16, 16, 4), np.uint8)
    rgb = native.composite_rgba_black(rgba)
    assert rgb.shape == (16, 16, 3)
    M = np.eye(3)
    out = native.warp_perspective(rgb, M, 16)
    np.testing.assert_array_equal(out, rgb)
    fused = native.preprocess_batch(rgba[None], M[None], 16)
    assert fused.shape == (1, 16, 16, 3)
