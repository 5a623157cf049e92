"""Symmetry-aware geodesic rotation error (JAX).

Re-implements the reference metric (``/root/reference/src/model/loss.py``)
branchlessly so it can live inside a jitted eval program:

- symmetry class 0: plain SO(3) relative angle (pytorch3d semantics,
  eps=1e-2 arccos extrapolation bound);
- symmetry class 1 (two-fold): min over {R, Ry180·R} (``loss.py:29-49``);
- symmetry class 2 (circular, e.g. bottles): convert object rotation to
  an OpenGL camera rotation and compare only the viewing (Z) axes via
  cosine similarity (``loss.py:54-70``).

``GeodesicError`` reproduces the reference's reporting: accuracy@threshold
(x100) and the *lower* median (torch.median picks the lower of the two
middle elements) for top-1 and, given top-k inputs, top-3/top-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nope_tpu.geometry.rotations import so3_relative_angle
from nope_tpu.geometry.transforms import convert_openCV_to_openGL_rotation

# Ry(180deg) — two-fold symmetry flip (loss.py:11)
_ROTY180 = jnp.asarray([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])


def _cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


def so3_relative_angle_with_symmetry(
    pred: jax.Array, gt: jax.Array, symmetry: jax.Array
) -> jax.Array:
    """(B,) rotation error in radians; ``symmetry`` in {0, 1, 2}.

    Branchless: all three error variants are computed for the full batch
    and selected per element — cheap (B is small at eval) and jit/TPU
    friendly, unlike the reference's boolean-mask scatter.
    """
    pred = pred.astype(jnp.result_type(pred.dtype, jnp.float32))
    gt = gt.astype(pred.dtype)
    symmetry = symmetry.astype(jnp.int32).reshape(-1)

    err_plain = so3_relative_angle(pred, gt, eps=1e-2)

    roty = _ROTY180.astype(pred.dtype)
    flipped = jnp.matmul(roty, pred, precision=jax.lax.Precision.HIGHEST)
    err_flipped = so3_relative_angle(flipped, gt, eps=1e-2)
    err_two = jnp.minimum(err_plain, err_flipped)

    # circular: object R → camera R (inverse = transpose) → OpenGL; the
    # in-plane component is discarded by comparing only viewing axes.
    pred_cam = jnp.swapaxes(pred, -1, -2)
    gt_cam = jnp.swapaxes(gt, -1, -2)
    pred_gl = convert_openCV_to_openGL_rotation(pred_cam)
    gt_gl = convert_openCV_to_openGL_rotation(gt_cam)
    cos_sym = _cosine_similarity(pred_gl[:, 2, :3], gt_gl[:, 2, :3])
    err_circle = jnp.arccos(jnp.clip(cos_sym, -1.0, 1.0))

    return jnp.where(
        symmetry == 1, err_two, jnp.where(symmetry == 2, err_circle, err_plain)
    )


def _median_lower(x: jax.Array) -> jax.Array:
    """torch.median semantics: lower of the two middle elements."""
    n = x.shape[0]
    return jnp.sort(x)[(n - 1) // 2]


class GeodesicError:
    """Accuracy@threshold / median reporter (``loss.py:74-115``).

    Call with ``predR`` of shape (B, 3, 3) for top-1 only, or
    (B, k, 3, 3) for top-1/3/5 min-over-candidates scoring.  Returns
    ``(top1_error_deg, results_dict)``.
    """

    def __init__(self, thresholds=(15,)):
        self.thresholds = tuple(thresholds)

    def topk_errors(
        self, predR: jax.Array, gtR: jax.Array, symmetry: jax.Array
    ) -> jax.Array:
        """(B, k) per-candidate errors in degrees (for global
        aggregation across eval batches)."""
        symmetry = jnp.reshape(symmetry, (-1,))
        b, k = predR.shape[0], predR.shape[1]
        flat = predR.reshape(b * k, 3, 3)
        gt_rep = jnp.repeat(gtR[:, None], k, axis=1).reshape(b * k, 3, 3)
        sym_rep = jnp.repeat(symmetry[:, None], k, axis=1).reshape(-1)
        return jnp.degrees(
            so3_relative_angle_with_symmetry(flat, gt_rep, sym_rep)
        ).reshape(b, k)

    def __call__(self, predR: jax.Array, gtR: jax.Array, symmetry: jax.Array):
        symmetry = jnp.reshape(symmetry, (-1,))
        if predR.ndim == 3:
            error = jnp.degrees(so3_relative_angle_with_symmetry(predR, gtR, symmetry))
            results = {
                f"top1, accuracy_{t}": jnp.mean((error <= t).astype(jnp.float32)) * 100
                for t in self.thresholds
            }
            results["top1, median"] = _median_lower(error)
            return error, results

        errors = self.topk_errors(predR, gtR, symmetry)
        k = errors.shape[1]

        results = {}
        for idx_k in (0, 2, 4):
            if idx_k >= k:
                continue
            top_error = jnp.min(errors[:, : idx_k + 1], axis=1)
            for t in self.thresholds:
                results[f"top{idx_k + 1}, accuracy_{t}"] = (
                    jnp.mean((top_error <= t).astype(jnp.float32)) * 100
                )
            results[f"top{idx_k + 1}, median"] = _median_lower(top_error)
        return errors[:, 0], results
