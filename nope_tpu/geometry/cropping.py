"""Virtual-bounding-box perspective crop.

Re-implements the reference's only image preprocessing step
(``/root/reference/src/poses/utils.py:204-272``): build a metric virtual
3D bbox around the object centre in camera space, project its 4 corners
through K, and warp the quad to an ``image_size²`` crop.

Two paths:

- **host** (:func:`crop_frame`): numpy/cv2, byte-exact with the
  reference for dataset readers and offline tools;
- **device** (:func:`crop_frame_jax` / :func:`warp_perspective_jax`):
  pure-jnp, batched and jit-friendly, so preprocessing can live inside
  the single inference device program (the BASELINE north star).

Reference quirks reproduced deliberately (they shift the homography by
up to a pixel and matter for embedding-level parity):
- projected corners are truncated toward zero to int32 before the
  homography is solved (``utils.py:55-56,258``);
- the non-inplane up-vector hint applies the *full* pose (including
  translation) to ``(0,0,6) - origin_in_cam`` (``utils.py:230-231``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

try:  # cv2 is available in this image; keep a fallback for lean installs
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


# ---------------------------------------------------------------------------
# shared corner construction (numpy)
# ---------------------------------------------------------------------------


def virtual_bbox_corners(
    openCV_pose: np.ndarray,
    virtual_bbox_size: float,
    keep_inplane: bool = False,
) -> np.ndarray:
    """(4, 3) camera-space corners of the virtual bbox around the object
    origin, ordered (+u-r, -u-r, +u+r, -u+r) like the reference."""
    origin_in_cam = (np.asarray(openCV_pose, dtype=np.float64) @ np.array([0, 0, 0, 1.0]))[:3]
    if keep_inplane:
        upper = np.array([0.0, -origin_in_cam[2], origin_in_cam[1]])
        right = np.array(
            [
                origin_in_cam[1] ** 2 + origin_in_cam[2] ** 2,
                -origin_in_cam[0] * origin_in_cam[1],
                -origin_in_cam[0] * origin_in_cam[2],
            ]
        )
        if np.linalg.norm(upper) == 0 and np.linalg.norm(right) == 0:
            upper = np.array([0.0, -1.0, 0.0])
            right = np.array([1.0, 0.0, 0.0])
    else:
        upV = np.array([0.0, 0.0, 6.0]) - origin_in_cam
        upV = (np.asarray(openCV_pose) @ np.array([upV[0], upV[1], upV[2], 1.0]))[:3]
        right = np.cross(origin_in_cam, upV)
        upper = np.cross(right, origin_in_cam)
        if np.linalg.norm(upper) == 0 and np.linalg.norm(right) == 0:
            upper = np.array([0.0, -1.0, 0.0])
            right = np.array([1.0, 0.0, 0.0])

    upper = upper * (virtual_bbox_size / 2) / np.linalg.norm(upper)
    right = right * (virtual_bbox_size / 2) / np.linalg.norm(right)

    return np.stack(
        (
            origin_in_cam + upper - right,
            origin_in_cam - upper - right,
            origin_in_cam + upper + right,
            origin_in_cam - upper + right,
        )
    )


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points to 4 dst points
    (cv2.getPerspectiveTransform equivalent, 8x8 linear solve)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[2 * i], b[2 * i + 1] = u, v
    h = np.linalg.solve(A, b)
    return np.append(h, 1.0).reshape(3, 3)


def crop_homography(
    intrinsic: np.ndarray,
    openCV_pose: np.ndarray,
    image_size: int,
    keep_inplane: bool = False,
    virtual_bbox_size: float = 0.3,
) -> np.ndarray:
    """The 3x3 src→dst homography the reference feeds to
    ``cv2.warpPerspective`` (``poses/utils.py:257-264``)."""
    corners3d = virtual_bbox_corners(openCV_pose, virtual_bbox_size, keep_inplane)
    K = np.asarray(intrinsic, dtype=np.float64)
    proj = corners3d @ K.T
    if np.any(np.abs(proj[:, 2]) < 1e-9):
        raise ValueError(
            "virtual bbox corner projects through the camera plane (object at or "
            f"behind the camera origin?): pose translation {np.asarray(openCV_pose)[:3, 3]}"
        )
    uv = proj[:, :2] / proj[:, 2:3]
    src2d = np.trunc(uv).astype(np.int32).astype(np.float32)  # reference int cast
    dst2d = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype=np.float32) * image_size
    return get_perspective_transform(src2d, dst2d)


# ---------------------------------------------------------------------------
# host crop (reference-parity)
# ---------------------------------------------------------------------------


def crop_frame(
    img,
    mask,
    intrinsic,
    openCV_pose,
    image_size: int,
    keep_inplane: bool = False,
    virtual_bbox_size: float = 0.3,
):
    """Reference-parity host crop (``poses/utils.py:204-272``).
    ``img`` is any HxWxC array-like; returns the warped crop (and warped
    mask when given)."""
    M = crop_homography(intrinsic, openCV_pose, image_size, keep_inplane, virtual_bbox_size)
    img = np.asarray(img)
    if _HAS_CV2:
        cropped = cv2.warpPerspective(img, M.astype(np.float64), (image_size, image_size))
        if mask is not None:
            cropped_mask = cv2.warpPerspective(
                np.asarray(mask), M.astype(np.float64), (image_size, image_size)
            )
            return cropped, cropped_mask
        return cropped
    # numpy fallback: same inverse-mapping bilinear warp as the device path
    out = np.asarray(
        warp_perspective_jax(
            jnp.asarray(img, dtype=jnp.float32), jnp.asarray(M), image_size
        )
    )
    if img.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if mask is not None:
        m = np.asarray(
            warp_perspective_jax(
                jnp.asarray(np.asarray(mask), dtype=jnp.float32), jnp.asarray(M), image_size
            )
        )
        if np.asarray(mask).dtype == np.uint8:
            m = np.clip(np.rint(m), 0, 255).astype(np.uint8)
        return out, m
    return out


# ---------------------------------------------------------------------------
# device crop (jitted)
# ---------------------------------------------------------------------------


def get_perspective_transform_jax(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Batched homography solve.  ``src``/``dst``: (..., 4, 2)."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    row_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], axis=-1)
    row_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=-2)  # (..., 8, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    with jax.default_matmul_precision("highest"):
        h = jnp.linalg.solve(A, b)[..., 0]
    ones_t = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, ones_t], axis=-1).reshape(*h.shape[:-1], 3, 3)


def _invert_3x3(m: jax.Array) -> jax.Array:
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.inv(m)


def warp_perspective_jax(
    img: jax.Array, M: jax.Array, image_size: int
) -> jax.Array:
    """dst(x, y) = src(M⁻¹ · (x, y, 1)) with bilinear sampling and zero
    border — the semantics of ``cv2.warpPerspective(..., INTER_LINEAR)``.

    ``img``: (H, W) or (H, W, C) float array.  Batched via ``jax.vmap``.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape

    Minv = _invert_3x3(M.astype(jnp.float32))
    ys, xs = jnp.mgrid[0:image_size, 0:image_size]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    # elementwise projective transform: exact f32 (a matmul here would go
    # through the MXU's bf16 default precision and cost ~0.5 px of error)
    w = Minv[2, 0] * xs + Minv[2, 1] * ys + Minv[2, 2]
    u = (Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]) / w
    v = (Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]) / w

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    def sample(vi, ui):
        valid = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui_c = jnp.clip(ui, 0, W - 1).astype(jnp.int32)
        vi_c = jnp.clip(vi, 0, H - 1).astype(jnp.int32)
        vals = img[vi_c, ui_c]  # (S, S, C)
        return jnp.where(valid[..., None], vals, 0.0)

    p00 = sample(v0, u0)
    p01 = sample(v0, u0 + 1)
    p10 = sample(v0 + 1, u0)
    p11 = sample(v0 + 1, u0 + 1)

    top = p00 * (1 - du)[..., None] + p01 * du[..., None]
    bot = p10 * (1 - du)[..., None] + p11 * du[..., None]
    out = top * (1 - dv)[..., None] + bot * dv[..., None]
    return out[..., 0] if squeeze else out


def crop_frame_jax(
    img: jax.Array,
    intrinsic: jax.Array,
    openCV_pose: jax.Array,
    image_size: int,
    virtual_bbox_size: float | jax.Array = 0.3,
) -> jax.Array:
    """Fully on-device crop (non-inplane variant): corners, projection
    (with the reference's toward-zero truncation), homography solve and
    bilinear warp in one traceable function.

    ``img``: (H, W, C) float; ``openCV_pose``: (4, 4); scalars may be
    traced.  Batch with ``jax.vmap``.
    """
    pose = openCV_pose.astype(jnp.float32)
    origin = pose[:3, 3]
    upV0 = jnp.asarray([0.0, 0.0, 6.0], jnp.float32) - origin
    upV = (
        jnp.matmul(
            pose,
            jnp.concatenate([upV0, jnp.ones(1, jnp.float32)]),
            precision=jax.lax.Precision.HIGHEST,
        )
    )[:3]
    right = jnp.cross(origin, upV)
    upper = jnp.cross(right, origin)
    half = jnp.asarray(virtual_bbox_size, jnp.float32) / 2
    upper = upper * half / jnp.linalg.norm(upper).clip(1e-12)
    right = right * half / jnp.linalg.norm(right).clip(1e-12)

    corners = jnp.stack(
        (
            origin + upper - right,
            origin - upper - right,
            origin + upper + right,
            origin - upper + right,
        )
    )
    proj = jnp.matmul(
        corners, intrinsic.astype(jnp.float32).T, precision=jax.lax.Precision.HIGHEST
    )
    uv = proj[:, :2] / proj[:, 2:3]
    src2d = jnp.trunc(uv)  # reference int32 cast
    dst2d = (
        jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.float32) * image_size
    )
    M = get_perspective_transform_jax(src2d, dst2d)
    return warp_perspective_jax(img, M, image_size)
