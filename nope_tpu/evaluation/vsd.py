"""VSD evaluation harness (host-side; pyrender/trimesh gated).

The reference's VSD path (``/root/reference/src/model/model.py:391-541``
→ ``src/poses/vsd.py``) has a schema drift that would KeyError as
committed (dict-of-batched-arrays fed to a per-frame consumer, SURVEY
appendix item 5).  Here the contract is explicit: the device side
produces retrieval results; :func:`evaluate_vsd_batch` consumes
*per-frame records* and fans them out over a process pool, each worker
rendering GT/estimated depth with pyrender EGL and scoring with the
pure-numpy metric in :mod:`nope_tpu.evaluation.vsd_metrics`.

Rendering stays on the host by design — depth rasterisation of a few
dozen poses per frame is latency-bound CPU/GL work that would poison a
jitted TPU program (SURVEY §7 hard-part e).
"""

from __future__ import annotations

import dataclasses
import logging
import multiprocessing
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from nope_tpu.evaluation.vsd_metrics import vsd_error_from_depths, vsd_scores


@dataclasses.dataclass
class VSDFrame:
    """One test frame: everything a worker needs, nothing batched."""

    cad_path: str
    intrinsic: np.ndarray  # (3, 3)
    depth_path: str
    pred_poses: np.ndarray  # (k, 4, 4) retrieved R + GT t
    gt_pose: np.ndarray  # (4, 4)
    depth_scale: float = 0.1  # reference divides by 10 (vsd.py:74)


def build_vsd_frames(
    batch: Dict[str, np.ndarray],
    nearest_idx: np.ndarray,
    template_poses: np.ndarray,
    cad_paths: Dict[int, str],
) -> List[VSDFrame]:
    """Assemble per-frame records from a device batch + retrieval output
    (the 4x4 construction of ``model.py:469-509``, reshaped per frame)."""
    frames: List[VSDFrame] = []
    b, k = nearest_idx.shape
    for i in range(b):
        retrieved_R = template_poses[nearest_idx[i]]  # (k, 3, 3)
        t = np.asarray(batch["query_translation"][i]).reshape(3)
        pred = np.tile(np.eye(4, dtype=np.float64), (k, 1, 1))
        pred[:, :3, :3] = retrieved_R
        pred[:, :3, 3] = t
        gt = np.eye(4, dtype=np.float64)
        gt[:3, :3] = np.asarray(batch["query_pose"][i])
        gt[:3, 3] = t
        frames.append(
            VSDFrame(
                cad_path=cad_paths[int(batch["obj_id"][i])],
                intrinsic=np.asarray(batch["intrinsic"][i]).reshape(3, 3),
                depth_path=str(batch["depth_path"][i]),
                pred_poses=pred,
                gt_pose=gt,
            )
        )
    return frames


def _render_depths(mesh, poses: np.ndarray, K: np.ndarray, img_size) -> List[np.ndarray]:
    """Offscreen depth-only renders, camera fixed at origin (OpenCV→GL
    flip), object moved per pose (``vsd.py:25-55``)."""
    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    import pyrender

    cam_pose = np.eye(4)
    cam_pose[1, 1] = -1
    cam_pose[2, 2] = -1
    scene = pyrender.Scene(bg_color=np.zeros(4))
    camera = pyrender.IntrinsicsCamera(
        fx=K[0][0], fy=K[1][1], cx=K[0][2], cy=K[1][2], znear=0.05, zfar=100000
    )
    scene.add(camera, pose=cam_pose)
    engine = pyrender.OffscreenRenderer(img_size[1], img_size[0])
    node = scene.add(mesh, pose=np.eye(4), name="cad")
    depths = []
    for pose in np.atleast_3d(poses).reshape(-1, 4, 4):
        scene.set_pose(node, pose)
        depths.append(engine.render(scene, flags=pyrender.RenderFlags.DEPTH_ONLY))
    engine.delete()
    return depths


def make_renderer(cad_path: str, backend: str = "auto"):
    """Renderer with the ``(poses, K, img_shape) -> [depth, ...]``
    contract.  ``pyrender`` = GL offscreen (the reference's backend,
    ``vsd.py:25-55``); ``numpy`` = the dependency-free z-buffer
    rasteriser in :mod:`nope_tpu.evaluation.raster`; ``auto`` prefers
    pyrender and falls back to numpy when GL/trimesh are unavailable."""
    if backend not in ("auto", "pyrender", "numpy"):
        raise ValueError(f"unknown renderer backend {backend!r}")
    if backend in ("auto", "pyrender"):
        try:
            import pyrender

            from nope_tpu.utils.mesh import load_mesh

            mesh = pyrender.Mesh.from_trimesh(load_mesh(cad_path))
            # GL/EGL failures surface only when an OffscreenRenderer is
            # created, not at import — probe one up front so 'auto' on a
            # GL-less host (pyrender pip-installed, no EGL driver)
            # actually falls back instead of crashing per-frame
            probe = pyrender.OffscreenRenderer(4, 4)
            probe.delete()
            return lambda poses, K, shape: _render_depths(mesh, poses, K, shape)
        except ImportError:
            if backend == "pyrender":
                raise
            logging.info("pyrender unavailable; using the numpy rasteriser")
        except Exception as e:
            if backend == "pyrender":
                raise
            logging.info("pyrender GL context failed (%s); "
                         "using the numpy rasteriser", e)
    from nope_tpu.evaluation.raster import NumpyDepthRenderer

    return NumpyDepthRenderer.from_file(cad_path)


def vsd_frame_error(
    frame: VSDFrame,
    delta: float = 15.0,
    tau: float = 20.0,
    cost_type: str = "step",
    renderer=None,
    renderer_backend: str = "auto",
) -> np.ndarray:
    """(k,) VSD errors of one frame's retrieved poses.  ``renderer`` may
    inject any ``(poses, K, img_shape) -> [depth, ...]`` callable."""
    import cv2

    depth_test = cv2.imread(frame.depth_path, -1) * frame.depth_scale
    if renderer is None:
        renderer = make_renderer(frame.cad_path, renderer_backend)
    K = np.asarray(frame.intrinsic, dtype=np.float64)

    k = frame.pred_poses.shape[0]
    gt_poses = np.tile(frame.gt_pose[None], (k, 1, 1))
    # reference forces GT translation onto predictions (vsd.py:86-87)
    pred_poses = frame.pred_poses.copy()
    pred_poses[:, :3, 3] = gt_poses[:, :3, 3]

    gt_depths = renderer(gt_poses, K, depth_test.shape)
    pred_depths = renderer(pred_poses, K, depth_test.shape)
    return np.array(
        [
            vsd_error_from_depths(
                depth_test, gt_depths[i], pred_depths[i], K, delta, tau, cost_type
            )
            for i in range(k)
        ]
    )


def evaluate_vsd_batch(
    frames: Sequence[VSDFrame],
    num_workers: int = 0,
    delta: float = 15.0,
    tau: float = 20.0,
    renderer_backend: str = "auto",
) -> np.ndarray:
    """(num_frames, k) errors, optionally over a process pool
    (``model.py:513-524``)."""
    if num_workers and num_workers > 1:
        with multiprocessing.get_context("spawn").Pool(num_workers) as pool:
            results = pool.starmap(
                vsd_frame_error,
                [(f, delta, tau, "step", None, renderer_backend) for f in frames],
            )
    else:
        results = [
            vsd_frame_error(f, delta, tau, renderer_backend=renderer_backend)
            for f in frames
        ]
    return np.stack(results, axis=0)


def summarize(vsd_errors: np.ndarray) -> dict:
    return vsd_scores(vsd_errors)
