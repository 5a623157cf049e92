"""SO(3) grid tests: asset invariants (counts, structure), programmatic
regeneration consistency, and the nearest-template finder."""

import numpy as np
import pytest

from nope_tpu.geometry import so3_grid, transforms


@pytest.mark.parametrize("level,size", [(0, 42), (1, 162), (2, 642), (3, 2562)])
def test_grid_sizes(level, size):
    assert so3_grid.load_cam_poses(level).shape == (size, 4, 4)
    assert so3_grid.load_obj_poses(level).shape == (size, 4, 4)


def test_upper_distribution_counts():
    idx0, poses0 = so3_grid.get_obj_poses_from_template_level(0, "upper", return_index=True)
    assert len(idx0) == 26 and poses0.shape == (26, 4, 4)
    idx2, poses2 = so3_grid.get_obj_poses_from_template_level(2, "upper", return_index=True)
    assert len(idx2) == 341 and poses2.shape == (341, 4, 4)


def test_index_level0_in_level2():
    assert so3_grid.load_index_level0_in_level2("all").shape == (42,)
    assert so3_grid.load_index_level0_in_level2("upper").shape == (26,)


def test_obj_pose_is_halfscale_inverse_of_cam_pose():
    for level in (0, 2):
        cam = so3_grid.load_cam_poses(level)
        obj = so3_grid.load_obj_poses(level)
        inv = np.stack([transforms.inverse_transform(c) for c in cam])
        np.testing.assert_allclose(obj[:, :3, :3], inv[:, :3, :3], atol=1e-6)
        np.testing.assert_allclose(obj[:, :3, 3], inv[:, :3, 3] * 0.5, atol=1e-6)


def test_cam_poses_on_unit_sphere_looking_at_origin():
    cam = so3_grid.load_cam_poses(1)
    locs = cam[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(locs, axis=1), 1.0, atol=1e-6)
    # forward axis (3rd column) points from camera to origin
    fwd = cam[:, :3, 2]
    np.testing.assert_allclose(fwd, -locs, atol=1e-5)


def test_icosphere_vertex_counts():
    for s, n in [(0, 12), (1, 42), (2, 162), (3, 642)]:
        verts, faces = so3_grid.icosphere(s)
        assert verts.shape == (n, 3)
        np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-12)
        assert faces.shape == (20 * 4**s, 3)


@pytest.mark.parametrize("level", [0, 1])
def test_generated_grid_matches_assets_as_a_set(level):
    """The regenerated grid must cover the same camera locations as the
    shipped assets (ordering is z-stable-sorted in both, but in-ring tie
    ordering can differ between subdivision implementations, so we match
    by nearest neighbour)."""
    gen_cam, gen_obj = so3_grid.generate_so3_grid(level)
    ref_cam = so3_grid.load_cam_poses(level)

    gen_locs = gen_cam[:, :3, 3]
    ref_locs = ref_cam[:, :3, 3]
    d2 = np.sum((gen_locs[:, None] - ref_locs[None]) ** 2, axis=-1)
    nearest = np.argmin(d2, axis=1)
    # one-to-one cover within tight tolerance
    assert len(np.unique(nearest)) == len(ref_locs)
    assert np.max(np.min(d2, axis=1)) < 1e-8

    # rotations agree for matched vertices (same look_at construction)
    np.testing.assert_allclose(
        gen_cam[:, :3, :3], ref_cam[nearest][:, :3, :3], atol=1e-5
    )
    # generated obj poses are the half-scale inverses, like the assets
    ref_obj = so3_grid.load_obj_poses(level)
    np.testing.assert_allclose(
        gen_obj[:, :3, 3], ref_obj[nearest][:, :3, 3], atol=1e-5
    )


def test_nearest_template_finder_self_retrieval():
    finder = so3_grid.NearestTemplateFinder(
        level_templates=2, pose_distribution="all", return_inplane=False
    )
    obj0 = so3_grid.load_obj_poses(0)
    idx = finder.search_nearest_template(obj0)
    # must reproduce the committed level0-in-level2 index asset
    np.testing.assert_array_equal(idx, so3_grid.load_index_level0_in_level2("all"))


def test_nearest_template_finder_inplane():
    finder = so3_grid.NearestTemplateFinder(
        level_templates=2, pose_distribution="all", return_inplane=True
    )
    obj2 = so3_grid.load_obj_poses(2)[:10]
    idx, inplanes = finder.search_nearest_template(obj2)
    np.testing.assert_array_equal(idx, np.arange(10))
    np.testing.assert_allclose(inplanes, np.zeros(10), atol=1e-4)


def test_template_id_mapping():
    mapping = so3_grid.load_mapping_id_templates_to_idx_pose_distribution(0, "upper")
    assert len(mapping) == 26
    idx, _ = so3_grid.get_obj_poses_from_template_level(0, "upper", return_index=True)
    for pos, template_id in enumerate(idx):
        assert mapping[int(template_id)] == pos
