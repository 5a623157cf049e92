"""Symmetry-aware geodesic metric tests against numpy/torch oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from nope_tpu.tasks.metrics import (
    GeodesicError,
    so3_relative_angle_with_symmetry,
    _median_lower,
)


def _random_matrices(rng, n=16):
    return R.random(n, rng).as_matrix().astype(np.float32)


def test_no_symmetry_matches_plain_geodesic(rng):
    pred = _random_matrices(rng)
    gt = _random_matrices(rng)
    err = np.asarray(
        so3_relative_angle_with_symmetry(
            jnp.asarray(pred), jnp.asarray(gt), jnp.zeros(16)
        )
    )
    expected = np.array(
        [
            np.arccos(np.clip((np.trace(p @ g.T) - 1) / 2, -1, 1))
            for p, g in zip(pred, gt)
        ]
    )
    # 1e-4 arccos extrapolation bound -> tiny differences near 0/pi only
    np.testing.assert_allclose(err, expected, atol=0.02)
    mid = (expected > 0.05) & (expected < np.pi - 0.05)
    np.testing.assert_allclose(err[mid], expected[mid], atol=1e-3)


def test_two_fold_symmetry_forgives_y180(rng):
    gt = _random_matrices(rng, 8)
    roty180 = R.from_euler("y", 180, degrees=True).as_matrix().astype(np.float32)
    pred = np.einsum("ij,bjk->bik", roty180, gt)  # exactly the flipped pose
    err_sym = np.asarray(
        so3_relative_angle_with_symmetry(
            jnp.asarray(pred), jnp.asarray(gt), jnp.ones(8)
        )
    )
    err_nosym = np.asarray(
        so3_relative_angle_with_symmetry(
            jnp.asarray(pred), jnp.asarray(gt), jnp.zeros(8)
        )
    )
    # exact match floors at ~0.405 deg: pytorch3d's 1e-4 arccos
    # extrapolation bound (reference loss.py:20-48 passes eps=1e-2 but
    # that only gates a validity assert in pytorch3d >= 0.4)
    assert np.all(np.degrees(err_sym) < 0.5)
    assert np.all(np.degrees(err_nosym) > 170.0)


def test_circular_symmetry_ignores_inplane(rng):
    gt = _random_matrices(rng, 8)
    # spin the object about its own symmetry (z) axis: for a
    # world-to-camera rotation this is a RIGHT-multiplied z-rotation
    rz = R.from_euler("z", 73, degrees=True).as_matrix().astype(np.float32)
    pred = np.einsum("bij,jk->bik", gt, rz)
    err = np.asarray(
        so3_relative_angle_with_symmetry(
            jnp.asarray(pred), jnp.asarray(gt), 2 * jnp.ones(8)
        )
    )
    assert np.all(np.degrees(err) < 1.0)
    # but a genuine viewpoint change is still penalised
    ry = R.from_euler("y", 60, degrees=True).as_matrix().astype(np.float32)
    pred2 = np.einsum("ij,bjk->bik", ry, gt)
    err2 = np.asarray(
        so3_relative_angle_with_symmetry(
            jnp.asarray(pred2), jnp.asarray(gt), 2 * jnp.ones(8)
        )
    )
    assert np.all(np.degrees(err2) > 30.0)


def test_mixed_symmetry_batch(rng):
    gt = _random_matrices(rng, 3)
    sym = jnp.asarray([0, 1, 2])
    err = np.asarray(
        so3_relative_angle_with_symmetry(jnp.asarray(gt), jnp.asarray(gt), sym)
    )
    # <= ~0.41 deg extrapolation floor for the acos-based classes
    assert np.all(np.degrees(err) < 0.5)


def test_median_lower_matches_torch():
    import torch

    x = np.array([5.0, 1.0, 3.0, 2.0], dtype=np.float32)
    ours = float(_median_lower(jnp.asarray(x)))
    theirs = float(torch.median(torch.tensor(x)))
    assert ours == theirs == 2.0


def test_geodesic_error_top1_report(rng):
    gt = _random_matrices(rng, 10)
    small = R.from_euler("x", 5, degrees=True).as_matrix().astype(np.float32)
    pred = np.einsum("ij,bjk->bik", small, gt)
    metric = GeodesicError(thresholds=[15])
    error, results = metric(jnp.asarray(pred), jnp.asarray(gt), jnp.zeros(10))
    assert error.shape == (10,)
    assert float(results["top1, accuracy_15"]) == 100.0
    assert float(results["top1, median"]) < 7.0


def test_geodesic_error_topk_report(rng):
    gt = _random_matrices(rng, 6)
    far = R.from_euler("x", 90, degrees=True).as_matrix().astype(np.float32)
    near = R.from_euler("x", 4, degrees=True).as_matrix().astype(np.float32)
    # top-1 candidate is bad, candidate #3 is good
    pred = np.stack(
        [
            np.einsum("ij,bjk->bik", far, gt),
            np.einsum("ij,bjk->bik", far, gt),
            np.einsum("ij,bjk->bik", near, gt),
            np.einsum("ij,bjk->bik", far, gt),
            np.einsum("ij,bjk->bik", far, gt),
        ],
        axis=1,
    )
    metric = GeodesicError(thresholds=[15])
    error, results = metric(jnp.asarray(pred), jnp.asarray(gt), jnp.zeros(6))
    assert error.shape == (6,)
    assert float(results["top1, accuracy_15"]) == 0.0
    assert float(results["top3, accuracy_15"]) == 100.0
    assert float(results["top5, accuracy_15"]) == 100.0
    assert set(results) == {
        "top1, accuracy_15", "top1, median",
        "top3, accuracy_15", "top3, median",
        "top5, accuracy_15", "top5, median",
    }
