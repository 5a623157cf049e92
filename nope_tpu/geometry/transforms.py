"""Camera / object pose algebra (numpy host path + jax device path).

Re-implements the coordinate-frame helpers of the reference
(``/root/reference/src/poses/utils.py``): OpenCV↔OpenGL conversion,
rigid-transform inversion, look-at camera construction, spherical
coordinates, in-plane rotation extraction, and projection.

Host-side functions (numpy, used by dataset readers and offline tools)
accept/return ``np.ndarray``; device-side equivalents are pure-jnp and
fully batched for use inside jitted programs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as _Rotation

# OpenCV camera (x right, y down, z forward) ↔ OpenGL camera
# (x right, y up, z backward): flip Y and Z.
_CV2GL_4 = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float64
)
_CV2GL_3 = _CV2GL_4[:3, :3]


# ---------------------------------------------------------------------------
# host (numpy)
# ---------------------------------------------------------------------------


def opencv2opengl(cam_matrix_world: np.ndarray) -> np.ndarray:
    """Flip Y/Z rows of 4x4 (or batch of 4x4) camera matrices
    (``poses/utils.py:14-20``).  Involutive: also converts back."""
    transform = _CV2GL_4.astype(cam_matrix_world.dtype)
    return np.matmul(transform, cam_matrix_world)


def combine_R_and_T(R, T, scale_translation: float = 1.0) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = np.asarray(R, dtype=np.float64).reshape(3, 3)
    m[:3, 3] = np.asarray(T, dtype=np.float64).reshape(-1) * scale_translation
    return m


def inverse_transform(trans: np.ndarray) -> np.ndarray:
    """Invert a rigid 4x4 transform (``poses/utils.py:60-69``).
    Supports an optional leading batch dimension."""
    trans = np.asarray(trans)
    if trans.ndim == 3:
        rot = np.swapaxes(trans[:, :3, :3], -1, -2)
        t = -np.einsum("bij,bj->bi", rot, trans[:, :3, 3])
        out = np.zeros_like(trans, dtype=np.float32)
        out[:, 3, 3] = 1.0
        out[:, :3, :3] = rot
        out[:, :3, 3] = t
        return out
    rot = trans[:3, :3].T
    t = -rot @ trans[:3, 3]
    out = np.zeros((4, 4), dtype=np.float32)
    out[3, 3] = 1.0
    out[:3, :3] = rot
    out[:3, 3] = t
    return out


def normalize(vec: np.ndarray) -> np.ndarray:
    return vec / np.linalg.norm(vec, axis=-1, keepdims=True)


def look_at(cam_location: np.ndarray, point: np.ndarray) -> np.ndarray:
    """OpenCV-convention camera-to-world look-at (z forward toward
    ``point``), matching ``poses/utils.py:159-187`` including its
    pole-degeneracy fallback for the up hint."""
    cam_location = np.asarray(cam_location, dtype=np.float64)
    point = np.asarray(point, dtype=np.float64)
    forward = normalize(point - cam_location)

    tmp = np.array([0.0, 0.0, -1.0])
    norm = min(
        np.min(np.linalg.norm(cam_location - tmp, axis=-1)),
        np.min(np.linalg.norm(cam_location + tmp, axis=-1)),
    )
    if norm < 1e-3:
        tmp = np.array([0.0, -1.0, 0.0])

    right = normalize(np.cross(tmp, forward))
    up = normalize(np.cross(forward, right))

    mat = np.stack((right, up, forward, cam_location), axis=-1)
    hom = np.array([[0.0, 0.0, 0.0, 1.0]])
    if mat.ndim > 2:
        hom = np.tile(hom, (mat.shape[0], 1, 1))
    return np.concatenate((mat, hom), axis=-2)


def spherical_to_cartesian(azimuth, elevation, radius):
    x = radius * np.sin(elevation) * np.cos(azimuth)
    y = radius * np.sin(elevation) * np.sin(azimuth)
    z = radius * np.cos(elevation)
    return np.stack((x, y, z), axis=-1)


def cartesian_to_spherical(x, y, z):
    r = np.sqrt(x**2 + y**2 + z**2)
    theta = np.arccos(z / r)
    phi = np.arctan2(y, x)
    return r, theta, phi


def perspective(K: np.ndarray, obj_pose: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Project 3D points through K under ``obj_pose``; results are
    truncated toward zero exactly like the reference
    (``poses/utils.py:50-57`` uses ``np.int32(rep/rep[2])``), because the
    integer quantisation feeds the crop homography and affects parity."""
    R, T = obj_pose[:3, :3], obj_pose[:3, 3]
    cam = pts @ R.T + T
    proj = cam @ K.T
    uv = proj[:, :2] / proj[:, 2:3]
    return np.trunc(uv).astype(np.float64)


def geodesic_numpy(R1: np.ndarray, R2: np.ndarray) -> float:
    theta = (np.trace(R2 @ R1.T) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(theta, -1, 1))))


# --- in-plane rotation handling (``poses/utils.py:290-315``) ---------------


def extract_inplane_from_pose(pose: np.ndarray) -> float:
    """First euler angle of the extrinsic-zyx decomposition, in degrees."""
    return float(_Rotation.from_matrix(pose).as_euler("zyx", degrees=True)[0])


def convert_inplane_to_rotation(inplane: float) -> np.ndarray:
    return _Rotation.from_euler("z", -inplane, degrees=True).as_matrix()


def adding_inplane_to_pose(pose: np.ndarray, inplane: float) -> np.ndarray:
    return convert_inplane_to_rotation(inplane) @ pose


def compute_inplane(
    rot_query_openCV: np.ndarray, rot_template_openCV: np.ndarray, warn_deg: float = 15.0
) -> float:
    """In-plane angle that maps the template rotation onto the query
    (``poses/utils.py:306-315``), with the same >=15 deg sanity check."""
    delta = rot_template_openCV @ rot_query_openCV.T
    inp = extract_inplane_from_pose(delta)
    recovered = convert_inplane_to_rotation(inp) @ rot_template_openCV
    err = geodesic_numpy(recovered, rot_query_openCV)
    if err >= warn_deg:
        import logging

        logging.warning("recovered in-plane pose error >= %s deg: %s", warn_deg, err)
    return inp


def relative_rotation(query_pose: np.ndarray, ref_pose: np.ndarray) -> np.ndarray:
    """ΔR = R_query · R_ref⁻¹ (``dataloader/shapeNet.py:243-250``)."""
    return query_pose[:3, :3] @ np.linalg.inv(ref_pose)[:3, :3]


# ---------------------------------------------------------------------------
# device (jax) — batched equivalents for jitted programs
# ---------------------------------------------------------------------------


_HI = jax.lax.Precision.HIGHEST


def opencv2opengl_jax(cam_matrix_world: jax.Array) -> jax.Array:
    # diag(1,-1,-1,1) left-multiply == row sign flips; elementwise, exact
    signs = jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=cam_matrix_world.dtype)
    return cam_matrix_world * signs[..., :, None]


def convert_openCV_to_openGL_rotation(openCV_R: jax.Array) -> jax.Array:
    """diag(1,-1,-1) @ R over a batch of 3x3 rotations
    (``poses/utils.py:142-152``)."""
    signs = jnp.asarray([1.0, -1.0, -1.0], dtype=openCV_R.dtype)
    return openCV_R[..., :3, :3] * signs[..., :, None]


def inverse_transform_jax(trans: jax.Array) -> jax.Array:
    rot = jnp.swapaxes(trans[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rot, trans[..., :3, 3], precision=_HI)
    top = jnp.concatenate((rot, t[..., :, None]), axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=trans.dtype), trans.shape[:-2] + (1, 4)
    )
    return jnp.concatenate((top, bottom), axis=-2)


def relative_rotation_jax(query_R: jax.Array, ref_R: jax.Array) -> jax.Array:
    """Batched ΔR = R_q · R_rᵀ (rotations: inverse == transpose)."""
    return jnp.matmul(query_R, jnp.swapaxes(ref_R, -1, -2), precision=_HI)
