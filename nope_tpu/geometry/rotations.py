"""Rotation representation conversions in pure JAX.

Functionally equivalent to the converters the reference vendors from
pytorch3d (``/root/reference/src/poses/rotation_conversions.py``) — the
subset NOPE actually uses: rotation-6d (Zhou et al. 2019), quaternions,
euler angles, axis-angle, and the SO(3) relative-angle metric with
pytorch3d's linearly-extrapolated arccos (so3_relative_angle semantics,
``rotation_conversions.py:468-503`` and pytorch3d ``so3`` ops).

All functions are batched over arbitrary leading dimensions, jit- and
vmap-friendly, and dtype-preserving.  Quaternions use the (w, x, y, z)
real-first convention, matching pytorch3d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry math must be exact f32: JAX's default matmul precision is
# bfloat16-class (TPU MXU semantics, emulated on CPU too), which is fine
# for network layers but corrupts 3x3 rotation algebra.
_HI = jax.lax.Precision.HIGHEST


def _matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=_HI)


# ---------------------------------------------------------------------------
# rotation-6d  (the representation NOPE trains with)
# ---------------------------------------------------------------------------


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Gram-Schmidt the 6d representation into a rotation matrix.

    Mirrors the reference semantics (``rotation_conversions.py:468-487``):
    the 6 numbers are the first two *rows* of the matrix before
    orthonormalisation.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """First two rows of the rotation matrix, flattened
    (``rotation_conversions.py:490-503``)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    r, i, j, k = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Numerically-stable matrix→quaternion (pytorch3d candidate-pick
    algorithm: build all four sign-consistent candidates and select the
    one with the largest denominator)."""
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = (m[..., n] for n in range(9))

    q_abs = _sqrt_positive_part(
        jnp.stack(
            (
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ),
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        (
            jnp.stack((q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01), axis=-1),
            jnp.stack((m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20), axis=-1),
            jnp.stack((m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21), axis=-1),
            jnp.stack((m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2), axis=-1),
        ),
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    return jnp.sum(quat_candidates * onehot[..., None], axis=-2)


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Force a non-negative real part."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = (a[..., n] for n in range(4))
    bw, bx, by, bz = (b[..., n] for n in range(4))
    return jnp.stack(
        (
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ),
        axis=-1,
    )


def quaternion_invert(quaternion: jax.Array) -> jax.Array:
    return quaternion * jnp.asarray([1, -1, -1, -1], dtype=quaternion.dtype)


def quaternion_apply(quaternion: jax.Array, point: jax.Array) -> jax.Array:
    zeros = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    point_q = jnp.concatenate((zeros, point), axis=-1)
    out = quaternion_multiply(
        quaternion_multiply(quaternion, point_q), quaternion_invert(quaternion)
    )
    return out[..., 1:]


# ---------------------------------------------------------------------------
# axis-angle
# ---------------------------------------------------------------------------


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x ≈ 1/2 - x²/48 for small x
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate((jnp.cos(half), axis_angle * sin_half_over), axis=-1)


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small,
        0.5 - (angles * angles) / 48,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quaternions[..., 1:] / sin_half_over


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# euler angles (pytorch3d convention strings, e.g. "XYZ", intrinsic)
# ---------------------------------------------------------------------------

_AXES = {"X": 0, "Y": 1, "Z": 2}


def _axis_angle_rotation(axis: str, angle: jax.Array) -> jax.Array:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str = "XYZ") -> jax.Array:
    if len(convention) != 3 or any(c not in _AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    mats = [
        _axis_angle_rotation(c, euler_angles[..., i]) for i, c in enumerate(convention)
    ]
    return functools.reduce(_matmul, mats)


def _angle_from_tan(
    axis: str, other_axis: str, data: jax.Array, horizontal: bool, tait_bryan: bool
) -> jax.Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jax.Array, convention: str = "XYZ") -> jax.Array:
    if len(convention) != 3 or any(c not in _AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    i0 = _AXES[convention[0]]
    i2 = _AXES[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


# ---------------------------------------------------------------------------
# random rotations
# ---------------------------------------------------------------------------


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    return o / jnp.linalg.norm(o, axis=-1, keepdims=True)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


# ---------------------------------------------------------------------------
# SO(3) relative angle (pytorch3d so3_relative_angle semantics)
# ---------------------------------------------------------------------------


def acos_linear_extrapolation(x: jax.Array, bounds=(-1.0 + 1e-4, 1.0 - 1e-4)) -> jax.Array:
    """arccos, linearly extrapolated outside ``bounds`` so gradients stay
    finite near ±1 (pytorch3d ``acos_linear_extrapolation``)."""
    lower, upper = bounds

    def _dacos_dx(v):
        return -1.0 / jnp.sqrt(1.0 - v * v)

    x_mid = jnp.clip(x, lower, upper)
    acos_mid = jnp.arccos(x_mid)
    above = jnp.arccos(upper) + (x - upper) * _dacos_dx(jnp.asarray(upper, x.dtype))
    below = jnp.arccos(lower) + (x - lower) * _dacos_dx(jnp.asarray(lower, x.dtype))
    return jnp.where(x > upper, above, jnp.where(x < lower, below, acos_mid))


def so3_rotation_angle(
    R: jax.Array, eps: float = 1e-4, cos_angle: bool = False, cos_bound: float = 1e-4
) -> jax.Array:
    """Angle of a batch of rotation matrices.

    ``eps`` is accepted for API parity with pytorch3d, where it only
    gates a trace-validity assert; ``cos_bound`` controls the arccos
    extrapolation bounds (pytorch3d default 1e-4, giving a ~0.405 deg
    floor for exactly-matching rotations).
    """
    del eps
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    if cos_bound > 0.0:
        return acos_linear_extrapolation(phi_cos, (-1.0 + cos_bound, 1.0 - cos_bound))
    return jnp.arccos(jnp.clip(phi_cos, -1.0, 1.0))


def so3_relative_angle(
    R1: jax.Array, R2: jax.Array, eps: float = 1e-4, cos_angle: bool = False,
    cos_bound: float = 1e-4,
) -> jax.Array:
    """Geodesic angle between two batches of rotations.

    Matches pytorch3d (>=0.4, the versions compatible with the
    reference's torch 1.13 env): the reference's ``eps=1e-2`` argument
    (``/root/reference/src/model/loss.py:20-48``) only relaxes a
    validity assert there — the arccos extrapolation bound stays at the
    1e-4 default, NOT eps.
    """
    R12 = _matmul(R1, jnp.swapaxes(R2, -1, -2))
    return so3_rotation_angle(R12, eps=eps, cos_angle=cos_angle, cos_bound=cos_bound)


def geodesic_distance(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Plain clipped-arccos geodesic distance in radians
    (``/root/reference/src/poses/utils.py:44-47`` semantics, batched)."""
    R12 = _matmul(R2, jnp.swapaxes(R1, -1, -2))
    trace = R12[..., 0, 0] + R12[..., 1, 1] + R12[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
