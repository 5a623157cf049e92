"""Virtual-bbox crop tests: homography vs cv2, device warp vs cv2,
and host/device crop agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from nope_tpu.geometry import cropping, so3_grid

K_SHAPENET = np.array([[525, 0, 256], [0, 525, 256], [0, 0, 1]], dtype=np.float64)


def _sample_pose(i=0):
    # a grid obj pose, pushed to a metric distance like the dataset does
    pose = so3_grid.load_obj_poses(2)[i].copy()
    pose[:3, 3] *= 2.0  # 1 m away
    return pose


def test_get_perspective_transform_matches_cv2(rng):
    src = rng.uniform(0, 512, size=(4, 2)).astype(np.float32)
    dst = np.array([[0, 0], [0, 256], [256, 0], [256, 256]], dtype=np.float32)
    ours = cropping.get_perspective_transform(src, dst)
    theirs = cv2.getPerspectiveTransform(src, dst)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_get_perspective_transform_jax_matches_numpy(rng):
    src = rng.uniform(0, 512, size=(3, 4, 2)).astype(np.float32)
    dst = np.tile(
        np.array([[0, 0], [0, 256], [256, 0], [256, 256]], dtype=np.float32), (3, 1, 1)
    )
    ours = np.asarray(cropping.get_perspective_transform_jax(jnp.asarray(src), jnp.asarray(dst)))
    for b in range(3):
        expected = cropping.get_perspective_transform(src[b], dst[b])
        np.testing.assert_allclose(ours[b], expected, rtol=1e-4, atol=1e-4)


def test_warp_perspective_jax_matches_cv2(rng):
    img = rng.uniform(0, 1, size=(96, 128, 3)).astype(np.float32)
    src = np.array([[10, 12], [8, 80], [120, 10], [118, 88]], dtype=np.float32)
    dst = np.array([[0, 0], [0, 64], [64, 0], [64, 64]], dtype=np.float32)
    M = cropping.get_perspective_transform(src, dst)
    ours = np.asarray(cropping.warp_perspective_jax(jnp.asarray(img), jnp.asarray(M), 64))
    theirs = cv2.warpPerspective(img, M, (64, 64))
    # cv2 bilinear uses 5-bit fixed-point weights -> ~1/32 quantisation
    assert np.mean(np.abs(ours - theirs)) < 5e-3
    assert np.percentile(np.abs(ours - theirs), 99) < 0.08


def test_crop_frame_matches_reference_shape_and_content(rng):
    img = (rng.uniform(0, 255, size=(512, 512, 3))).astype(np.uint8)
    pose = _sample_pose()
    out = cropping.crop_frame(
        img, None, K_SHAPENET, pose, image_size=64, virtual_bbox_size=1.0
    )
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8
    assert out.std() > 0  # non-degenerate warp


def test_crop_frame_with_mask(rng):
    img = (rng.uniform(0, 255, size=(512, 512, 3))).astype(np.uint8)
    mask = (rng.uniform(0, 1, size=(512, 512)) > 0.5).astype(np.uint8) * 255
    pose = _sample_pose(3)
    out, out_mask = cropping.crop_frame(
        img, mask, K_SHAPENET, pose, image_size=32, virtual_bbox_size=1.0
    )
    assert out.shape == (32, 32, 3) and out_mask.shape == (32, 32)


def test_device_crop_matches_host_crop(rng):
    img = rng.uniform(0, 1, size=(512, 512, 3)).astype(np.float32)
    pose = _sample_pose(7)
    host = cropping.crop_frame(
        img, None, K_SHAPENET, pose, image_size=64, virtual_bbox_size=1.0
    )
    device = np.asarray(
        cropping.crop_frame_jax(
            jnp.asarray(img),
            jnp.asarray(K_SHAPENET, dtype=jnp.float32),
            jnp.asarray(pose, dtype=jnp.float32),
            image_size=64,
            virtual_bbox_size=1.0,
        )
    )
    assert np.mean(np.abs(host - device)) < 5e-3


def test_keep_inplane_variant(rng):
    img = rng.uniform(0, 1, size=(256, 256, 3)).astype(np.float32)
    pose = _sample_pose(11)
    out = cropping.crop_frame(
        img, None, K_SHAPENET, pose, image_size=64, keep_inplane=True, virtual_bbox_size=1.0
    )
    assert out.shape == (64, 64, 3)
