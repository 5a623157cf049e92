"""Rotation-conversion tests: round-trips, scipy oracles, and parity
with the semantics of the reference's vendored pytorch3d converters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from nope_tpu.geometry import rotations as rot


def _random_matrices(rng, n=32):
    return R.random(n, rng).as_matrix().astype(np.float32)


def test_rotation_6d_round_trip(rng):
    mats = _random_matrices(rng)
    d6 = rot.matrix_to_rotation_6d(jnp.asarray(mats))
    assert d6.shape == (32, 6)
    back = rot.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)


def test_rotation_6d_is_first_two_rows(rng):
    mats = _random_matrices(rng, 4)
    d6 = np.asarray(rot.matrix_to_rotation_6d(jnp.asarray(mats)))
    np.testing.assert_allclose(d6, mats[:, :2, :].reshape(4, 6), atol=0)


def test_rotation_6d_gram_schmidt_unnormalized(rng):
    # arbitrary (non-orthogonal) 6d inputs must still yield valid rotations
    d6 = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    mats = np.asarray(rot.rotation_6d_to_matrix(d6))
    eye = np.einsum("bij,bkj->bik", mats, mats)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mats), np.ones(16), atol=1e-5)


def test_quaternion_round_trip(rng):
    mats = _random_matrices(rng)
    q = rot.matrix_to_quaternion(jnp.asarray(mats))
    back = rot.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)


def test_quaternion_against_scipy(rng):
    mats = _random_matrices(rng)
    q = np.asarray(rot.standardize_quaternion(rot.matrix_to_quaternion(jnp.asarray(mats))))
    # scipy uses (x, y, z, w); ours is (w, x, y, z)
    q_scipy = R.from_matrix(mats).as_quat()
    q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    sign = np.where(q_scipy[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, q_scipy * sign, atol=1e-5)


def test_quaternion_apply(rng):
    mats = _random_matrices(rng, 8)
    q = rot.matrix_to_quaternion(jnp.asarray(mats))
    pts = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    out = rot.quaternion_apply(q, pts)
    expected = np.einsum("bij,bj->bi", mats, np.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


@pytest.mark.parametrize("convention", ["XYZ", "ZYX", "ZXZ"])
def test_euler_round_trip(rng, convention):
    mats = _random_matrices(rng)
    angles = rot.matrix_to_euler_angles(jnp.asarray(mats), convention)
    back = rot.euler_angles_to_matrix(angles, convention)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-4)


def test_euler_against_scipy_intrinsic(rng):
    # pytorch3d "XYZ" == scipy intrinsic (uppercase) "XYZ"
    mats = _random_matrices(rng)
    ours = np.asarray(rot.matrix_to_euler_angles(jnp.asarray(mats), "XYZ"))
    theirs = R.from_matrix(mats).as_euler("XYZ")
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_axis_angle_round_trip(rng):
    mats = _random_matrices(rng)
    aa = rot.matrix_to_axis_angle(jnp.asarray(mats))
    back = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-4)


def test_so3_relative_angle_identity(rng):
    mats = _random_matrices(rng)
    ang = np.asarray(rot.so3_relative_angle(jnp.asarray(mats), jnp.asarray(mats)))
    # arccos extrapolation bound (1e-4) caps exact zero at ~sqrt(2*eps)
    assert np.all(ang < 0.05)


def test_so3_relative_angle_known_rotation(rng):
    # angles within ~0.8 deg of 0/180 hit the 1e-4 arccos extrapolation (
    # semantics); mid-range angles are exact
    base = _random_matrices(rng, 16)
    for deg in (10.0, 90.0, 150.0):
        delta = R.from_euler("y", deg, degrees=True).as_matrix().astype(np.float32)
        rotated = np.einsum("ij,bjk->bik", delta, base)
        ang = np.asarray(
            rot.so3_relative_angle(jnp.asarray(rotated), jnp.asarray(base), eps=1e-2)
        )
        np.testing.assert_allclose(np.degrees(ang), deg, atol=0.5)


def test_acos_linear_extrapolation_matches_acos_inside():
    x = jnp.linspace(-0.999, 0.999, 101)
    np.testing.assert_allclose(
        np.asarray(rot.acos_linear_extrapolation(x)), np.arccos(np.asarray(x)), atol=1e-5
    )
    # finite and monotonic outside bounds
    out = np.asarray(rot.acos_linear_extrapolation(jnp.asarray([-1.5, -1.0, 1.0, 1.5])))
    assert np.all(np.isfinite(out))
    assert out[0] > out[1] > out[2] > out[3]


def test_geodesic_distance_matches_reference_formula(rng):
    mats1 = _random_matrices(rng, 8)
    mats2 = _random_matrices(rng, 8)
    ours = np.degrees(
        np.asarray(rot.geodesic_distance(jnp.asarray(mats1), jnp.asarray(mats2)))
    )
    expected = [
        np.degrees(np.arccos(np.clip((np.trace(m2 @ m1.T) - 1) / 2, -1, 1)))
        for m1, m2 in zip(mats1, mats2)
    ]
    np.testing.assert_allclose(ours, expected, atol=1e-3)


def test_random_rotations_are_valid():
    mats = np.asarray(rot.random_rotations(jax.random.key(0), 64))
    eye = np.einsum("bij,bkj->bik", mats, mats)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)


def test_jit_and_vmap_compatibility(rng):
    mats = jnp.asarray(_random_matrices(rng, 8))
    jit_6d = jax.jit(rot.matrix_to_rotation_6d)
    np.testing.assert_allclose(
        np.asarray(jit_6d(mats)), np.asarray(rot.matrix_to_rotation_6d(mats)), atol=0
    )
    vmapped = jax.vmap(rot.rotation_6d_to_matrix)(rot.matrix_to_rotation_6d(mats))
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(mats), atol=1e-5)
