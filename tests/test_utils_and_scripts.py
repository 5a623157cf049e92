"""Utility + offline-generation tests: visualization grids, I/O, pose
sampling, the generation driver (dry-run), and the VSD harness with a
mocked renderer."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from nope_tpu.utils import inout, visualization
from nope_tpu.geometry import so3_grid


def test_put_image_to_grid_interleaves():
    a = np.zeros((2, 4, 4, 3), np.float32)
    b = np.ones((2, 4, 4, 3), np.float32)
    grid, ncol = visualization.put_image_to_grid([a, b])
    assert ncol == 3
    assert grid.shape == (2 * 3, 4, 4, 3)
    assert grid[0].max() == 0.0 and grid[1].min() == 1.0  # sample0: a, b
    assert grid[3].max() == 0.0 and grid[4].min() == 1.0  # sample1: a, b
    assert grid[2].max() == 0.0 and grid[5].max() == 0.0  # margin columns


def test_tile_and_save_grid(tmp_path):
    imgs = [np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)]
    path = visualization.save_image_grid(imgs, str(tmp_path / "grid.png"))
    assert osp.exists(path)


def test_similarity_heatmap_range():
    colors = visualization.similarity_heatmap(np.linspace(-3, 5, 41))
    assert colors.shape == (41, 3)
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    # monotone brightness along the colormap
    assert colors.sum(1)[0] < colors.sum(1)[-1]


def test_draw_grid_text_panel(tmp_path):
    pytest.importorskip("matplotlib")
    rng = np.random.default_rng(0)
    # rows: query | reference | (blank quirk cell) | top-1 | top-2
    images = rng.uniform(0, 1, (2, 5, 8, 8, 3)).astype(np.float32)
    scores = rng.uniform(0, 1, (2, 2)).astype(np.float32)
    path = visualization.draw_grid_text(images, scores, str(tmp_path / "panel.png"))
    assert osp.exists(path) and os.path.getsize(path) > 0


def test_visualize_uncertainty_shapes():
    rng = np.random.default_rng(1)
    u = rng.uniform(0, 1, (2, 4, 4, 4)).astype(np.float32)
    cm = visualization.visualize_uncertainty(u, (16, 16), apply_cmap=True)
    assert cm.shape == (2, 16, 16, 3)
    assert cm.min() >= 0.0 and cm.max() <= 1.0
    raw = visualization.visualize_uncertainty(u, (16, 16), apply_cmap=False)
    assert raw.shape == (2, 16, 16, 3)
    # RGB replication: all three channels equal the channel-norm
    np.testing.assert_allclose(raw[..., 0], raw[..., 2])


def test_write_text_on_grid(tmp_path):
    from PIL import Image

    # a 2-row, 3-col montage of 16px cells
    canvas = np.zeros((32, 48, 3), np.uint8)
    p = str(tmp_path / "grid.png")
    Image.fromarray(canvas).save(p)
    out = visualization.write_text_on_grid(
        p, errors=[12.3, 45.6], sample_size=16, idx_cols=[1]
    )
    assert out.shape == (32, 48, 3)
    assert out.sum() > 0  # text pixels were stamped


def test_inout_roundtrip(tmp_path):
    p = tmp_path / "x.json"
    inout.save_json(str(p), {"a": np.float32(1.5), "b": np.arange(3)})
    back = inout.load_json(str(p))
    assert back == {"a": 1.5, "b": [0, 1, 2]}
    t = tmp_path / "x.txt"
    inout.write_txt(str(t), ["a", "b"])
    assert inout.open_txt(str(t)) == ["a", "b"]


def test_sample_camera_poses_upper_hemisphere():
    from nope_tpu.scripts.generate_data import sample_camera_poses

    rng = np.random.default_rng(0)
    poses = sample_camera_poses(rng, 64, radius=1.2)
    assert poses.shape == (64, 4, 4)
    # cameras on the upper hemisphere: inverse translation z >= 0
    from nope_tpu.geometry.transforms import inverse_transform

    for p in poses[:8]:
        cam = inverse_transform(p)
        assert cam[2, 3] >= -1e-6
        np.testing.assert_allclose(np.linalg.norm(cam[:3, 3]), 1.2, atol=1e-5)
    # valid rotations
    rots = poses[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", rots, rots)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)


def test_generate_object_poses_and_driver_dry_run(tmp_path):
    from nope_tpu.scripts.generate_data import (
        generate_object_poses,
        run_generate,
    )

    save_dir = str(tmp_path)
    inout.write_txt(osp.join(save_dir, "cad_paths.txt"), ["/fake/cad0.obj"])
    inout.write_txt(osp.join(save_dir, "cad_names.txt"), ["02691156_cad0"])
    inout.save_json(osp.join(save_dir, "obj_diameter.json"), {"02691156_cad0": 0.8})

    run_generate(save_dir, num_workers=1, dry_run=True)

    q = np.load(osp.join(save_dir, "object_query_poses", "obj_000000.npy"))
    r = np.load(osp.join(save_dir, "object_reference_poses", "obj_000000.npy"))
    t = np.load(osp.join(save_dir, "object_template_poses", "obj_000000.npy"))
    assert q.shape == (5, 4, 4) and r.shape == (5, 4, 4)
    assert t.shape == (642, 4, 4)
    # template translations rescaled to 1.2 * diameter
    np.testing.assert_allclose(
        np.linalg.norm(t[:, :3, 3], axis=1), 1.2 * 0.8, atol=1e-5
    )
    assert osp.exists(osp.join(save_dir, "failed_renderings_0_1.txt"))


def test_vsd_frame_error_mocked(monkeypatch, tmp_path):
    """evaluate_vsd_batch end-to-end with rendering mocked out: the
    correct retrieved pose scores better than a displaced one."""
    import sys
    import types

    import cv2

    from nope_tpu.evaluation import vsd as vsd_mod

    K = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])

    def fake_depth(pose):
        d = np.zeros((32, 32))
        offset = int(8 + 8 * np.clip(pose[0, 0], -1, 1))
        d[offset : offset + 10, offset : offset + 10] = 500.0
        return d

    monkeypatch.setattr(
        vsd_mod,
        "_render_depths",
        lambda mesh, poses, K_, size: [
            fake_depth(p) for p in np.atleast_3d(poses).reshape(-1, 4, 4)
        ],
    )
    fake_mesh_mod = types.SimpleNamespace(load_mesh=lambda path: "trimesh")
    monkeypatch.setitem(sys.modules, "nope_tpu.utils.mesh", fake_mesh_mod)
    fake_pyrender = types.SimpleNamespace(
        Mesh=types.SimpleNamespace(from_trimesh=lambda m: m),
        # survive make_renderer's GL-context probe
        OffscreenRenderer=lambda w, h: types.SimpleNamespace(delete=lambda: None),
    )
    monkeypatch.setitem(sys.modules, "pyrender", fake_pyrender)

    gt_pose = np.eye(4)
    gt_pose[:3, 3] = [0, 0, 0.5]
    depth_path = str(tmp_path / "depth.png")
    cv2.imwrite(depth_path, (fake_depth(gt_pose) * 10).astype(np.uint16))

    good = gt_pose.copy()
    bad = gt_pose.copy()
    bad[0, 0] = -1.0  # displaces the fake depth square
    frame = vsd_mod.VSDFrame(
        cad_path="/fake.ply",
        intrinsic=K,
        depth_path=depth_path,
        pred_poses=np.stack([good, bad]),
        gt_pose=gt_pose,
    )
    errors = vsd_mod.evaluate_vsd_batch([frame], num_workers=0)
    assert errors.shape == (1, 2)
    assert errors[0, 0] < 0.05  # correct pose: near-zero VSD
    assert errors[0, 1] > 0.5  # displaced pose: high VSD

    from nope_tpu.evaluation.vsd_metrics import vsd_scores

    scores = vsd_scores(np.tile(errors, (4, 2)[:1] + (1,)))
    assert scores["top 1, vsd_scores 0.3"] in (0.0, 100.0)


def test_build_vsd_frames_schema():
    from nope_tpu.evaluation.vsd import build_vsd_frames

    grid = so3_grid.load_obj_poses(0)[:, :3, :3]
    batch = {
        "query_translation": np.tile([0.0, 0.0, 500.0], (2, 1)),
        "query_pose": grid[:2],
        "intrinsic": np.tile(np.eye(3), (2, 1, 1)),
        "depth_path": ["/a.png", "/b.png"],
        "obj_id": np.array([1, 2]),
    }
    nearest = np.array([[0, 1, 2], [3, 4, 5]])
    frames = build_vsd_frames(
        batch, nearest, grid, cad_paths={1: "/m1.ply", 2: "/m2.ply"}
    )
    assert len(frames) == 2
    assert frames[0].pred_poses.shape == (3, 4, 4)
    np.testing.assert_allclose(
        frames[0].pred_poses[:, :3, 3], np.tile([0.0, 0.0, 500.0], (3, 1))
    )
    np.testing.assert_allclose(frames[1].gt_pose[:3, :3], grid[1])
    assert frames[1].cad_path == "/m2.ply"


def test_blender_objaverse_pose_math():
    """Raw-Blender renderer math (blender_objaverse.py:12-54): the
    closed-form OpenCV→Blender conversion must match the reference's
    step-by-step Matrix recipe, and inverse_transform must invert."""
    from scipy.spatial.transform import Rotation

    from nope_tpu.scripts.blender_objaverse import (
        inverse_transform,
        kinect_focal_px,
        light_rig_positions,
        object_poses_to_blender_cam,
        opencv_cam2world_to_blender,
    )

    rng = np.random.default_rng(3)
    for _ in range(5):
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        pose[:3, 3] = rng.normal(size=3)

        inv = inverse_transform(pose)
        np.testing.assert_allclose(inv @ pose, np.eye(4), atol=1e-12)

        # reference's step sequence (blender_objaverse.py:24-54), numpy
        C = np.diag([1.0, -1.0, -1.0])
        cam_loc = pose[:3, 3]
        cv_w2c_rot = pose[:3, :3].T
        cv_translation = -cv_w2c_rot @ cam_loc
        b_w2c_rot = C @ cv_w2c_rot
        b_translation = C @ cv_translation
        b_c2w_rot = b_w2c_rot.T
        b_cam_loc = -b_c2w_rot @ b_translation
        want = np.eye(4)
        want[:3, :3] = b_c2w_rot
        want[:3, 3] = b_cam_loc

        got = opencv_cam2world_to_blender(pose)
        np.testing.assert_allclose(got, want, atol=1e-12)

    obj_poses = np.stack([pose, pose])
    blender = object_poses_to_blender_cam(obj_poses)
    assert blender.shape == (2, 4, 4)
    # camera location in the object frame: -R^T t of the object pose
    np.testing.assert_allclose(
        blender[0][:3, 3], -pose[:3, :3].T @ pose[:3, 3], atol=1e-12
    )

    assert kinect_focal_px(512) == 525.0
    assert len(light_rig_positions()) == 8


def test_download_datasets_tool(tmp_path, caplog):
    """scripts.download_datasets consumes the presets' source: blocks:
    direct archives download (file:// here) + extract into root_dir,
    re-runs are idempotent, non-direct (http: false) sources are
    reported for manual download."""
    import logging
    import zipfile

    import yaml

    from nope_tpu.scripts.download_datasets import main

    # a fake BOP archive pair served from disk
    archives = tmp_path / "server"
    archives.mkdir()
    data_zip = archives / "mini_train.zip"
    with zipfile.ZipFile(data_zip, "w") as zf:
        zf.writestr("train/000001/rgb/000000.png", b"png")
    cad_zip = archives / "mini_models.zip"
    with zipfile.ZipFile(cad_zip, "w") as zf:
        zf.writestr("models/obj_000001.ply", b"ply")

    root = tmp_path / "datasets"
    cfg = {
        "data": {"datasets": {
            "mini": {
                "name": "bop",
                "root_dir": str(root / "mini"),
                "source": {
                    "url": data_zip.as_uri(),
                    "cad_url": cad_zip.as_uri(),
                    "http": True,
                    "unzip_mode": "unzip",
                },
            },
            "manual": {
                "name": "bop",
                "root_dir": str(root / "manual"),
                "source": {"url": "https://example.com/nope.zip", "http": False},
            },
        }}
    }
    cfg_path = tmp_path / "dl.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    with caplog.at_level(logging.INFO):
        rc = main(["--config", str(cfg_path)])
    assert rc == 1  # the manual dataset cannot be auto-fetched
    assert (root / "mini" / "train" / "000001" / "rgb" / "000000.png").exists()
    assert (root / "mini" / "models" / "obj_000001.ply").exists()
    assert not list((root / "mini").glob("*.zip"))  # archives cleaned up
    assert any("manually" in r.message for r in caplog.records)

    # idempotent second run: populated root is skipped
    with caplog.at_level(logging.INFO):
        main(["--config", str(cfg_path), "--only", "mini"])
    assert any("already populated" in r.message for r in caplog.records)


def test_download_datasets_resume_and_errors(tmp_path, caplog):
    """An interrupted fetch resumes from its state file instead of being
    declared complete; a failing dataset doesn't abort the others; and
    --only rejects names the config doesn't define."""
    import logging
    import zipfile

    import pytest
    import yaml

    from nope_tpu.scripts.download_datasets import STATE_FILE, main

    archives = tmp_path / "server"
    archives.mkdir()
    data_zip = archives / "mini_train.zip"
    with zipfile.ZipFile(data_zip, "w") as zf:
        zf.writestr("train/000001/rgb/000000.png", b"png")
    cad_zip = archives / "mini_models.zip"
    with zipfile.ZipFile(cad_zip, "w") as zf:
        zf.writestr("models/obj_000001.ply", b"ply")

    root = tmp_path / "datasets"
    cfg = {
        "data": {"datasets": {
            "broken": {
                "name": "bop",
                "root_dir": str(root / "broken"),
                "source": {
                    "url": (archives / "missing.zip").as_uri(),
                    "http": True,
                },
            },
            "mini": {
                "name": "bop",
                "root_dir": str(root / "mini"),
                "source": {
                    "url": data_zip.as_uri(),
                    "cad_url": cad_zip.as_uri(),
                    "http": True,
                    "unzip_mode": "unzip",
                },
            },
        }}
    }
    cfg_path = tmp_path / "dl.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # plant an interrupted fetch: data archive done, cad_url missing
    mini_root = root / "mini"
    mini_root.mkdir(parents=True)
    with zipfile.ZipFile(data_zip) as zf:
        zf.extractall(mini_root)
    (mini_root / STATE_FILE).write_text('{"done": ["url"]}')

    with caplog.at_level(logging.INFO):
        rc = main(["--config", str(cfg_path)])
    # the broken dataset failed but didn't stop the rest
    assert rc == 1
    assert any("fetch failed" in r.message for r in caplog.records)
    assert any("resuming" in r.message for r in caplog.records)
    # the missing cad archive was fetched and the state file cleared
    assert (mini_root / "models" / "obj_000001.ply").exists()
    assert not (mini_root / STATE_FILE).exists()

    with pytest.raises(SystemExit):
        main(["--config", str(cfg_path), "--only", "nope_such_dataset"])


def test_extract_archive_dispatches_on_extension(tmp_path):
    """A .tar.gz under the default 'unzip' mode must extract as tar —
    the archive's extension wins over the mode hint (round-2 advisor
    finding: the old order raised BadZipFile)."""
    import tarfile

    from nope_tpu.scripts.download_datasets import extract_archive

    payload = tmp_path / "payload.txt"
    payload.write_text("hello")
    tgz = tmp_path / "data.tar.gz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(payload, arcname="sub/payload.txt")

    out = tmp_path / "out"
    extract_archive(str(tgz), str(out), unzip_mode="unzip")
    assert (out / "sub" / "payload.txt").read_text() == "hello"


def test_configure_preset_job_logging_split(tmp_path):
    """The reference's custom/rich job_logging presets split streams:
    logs.out carries INFO/DEBUG only, logs.err WARNING+ only
    (configs/hydra/job_logging/custom.yaml filters)."""
    import logging

    from nope_tpu.utils import logging as nlog

    nlog.configure_preset("custom", log_dir=str(tmp_path))
    try:
        log = logging.getLogger("preset_probe")
        log.info("info-line")
        log.error("error-line")
        for h in logging.getLogger().handlers:
            h.flush()
        out = (tmp_path / "logs.out").read_text()
        err = (tmp_path / "logs.err").read_text()
        assert "info-line" in out and "error-line" not in out
        assert "error-line" in err and "info-line" not in err

        with pytest.raises(ValueError, match="unknown job_logging"):
            nlog.configure_preset("nope")
        # console preset writes no files
        nlog.configure_preset("console")
        # rich preset falls back gracefully when rich is absent
        nlog.configure_preset("rich", log_dir=str(tmp_path))
    finally:
        logging.basicConfig(force=True)  # detach the file handlers
