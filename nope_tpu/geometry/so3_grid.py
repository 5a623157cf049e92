"""SO(3) viewpoint template grids (icosphere levels 0-3).

The reference ships the grids as ``.npy`` assets
(``/root/reference/src/poses/predefined_poses/``: 42/162/642/2562
camera-sphere poses per level plus level0→level2 index maps) and exposes
them via ``get_obj_poses_from_template_level``
(``/root/reference/src/poses/utils.py:72-127``).  We ship the same data
assets (pure pose data, required for checkpoint/eval parity) *and* a
programmatic generator that reproduces their construction:

- camera locations = icosphere vertices (level L grid = L+1 icosahedron
  subdivisions), stable-sorted by z ascending;
- ``sphere_poses``  = OpenCV camera-to-world look-at(vertex → origin)
  at radius 1;
- ``obj_poses``     = inverse (world-to-camera) with the object placed
  0.5 m in front of the camera (translation of the inverse scaled x0.5).

The "upper" distribution filters to cameras with z >= 0 (26 poses at
level 0, 341 at level 2).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from nope_tpu.geometry.transforms import look_at, inverse_transform, opencv2opengl

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets", "predefined_poses")

#: number of grid poses per level (icosphere vertex counts)
LEVEL_SIZES = {0: 42, 1: 162, 2: 642, 3: 2562}


# ---------------------------------------------------------------------------
# asset accessors (API-parity with poses/utils.py:72-127)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _load_asset(name: str) -> np.ndarray:
    arr = np.load(os.path.join(_ASSET_DIR, f"{name}.npy"))
    arr.setflags(write=False)
    return arr


def load_cam_poses(level: int) -> np.ndarray:
    """(N, 4, 4) camera-to-world poses on the unit sphere."""
    return _load_asset(f"sphere_poses_level{level}")


def load_obj_poses(level: int) -> np.ndarray:
    """(N, 4, 4) world-to-camera object poses (camera distance 0.5)."""
    return _load_asset(f"obj_poses_level{level}")


def get_obj_poses_from_template_level(
    level: int,
    pose_distribution: str = "all",
    return_cam: bool = False,
    return_index: bool = False,
):
    """Grid accessor matching ``poses/utils.py:72-102``:
    ``pose_distribution`` in {"all", "upper"}; "upper" keeps poses whose
    *camera* z >= 0."""
    poses = load_cam_poses(level) if return_cam else load_obj_poses(level)
    if pose_distribution == "all":
        index = np.arange(len(poses))
    elif pose_distribution == "upper":
        cam = load_cam_poses(level)
        index = np.arange(len(poses))[cam[:, 2, 3] >= 0]
        poses = poses[cam[:, 2, 3] >= 0]
    else:
        raise ValueError(f"unknown pose_distribution {pose_distribution!r}")
    if return_index:
        return index, np.array(poses)
    return np.array(poses)


def load_index_level0_in_level2(pose_distribution: str = "upper") -> np.ndarray:
    """Nearest level-2 grid index of each level-0 pose
    (``poses/utils.py:105-112``; 42 entries for "all", 26 for "upper")."""
    return np.array(_load_asset(f"idx_{pose_distribution}_level0_in_level2"))


def load_mapping_id_templates_to_idx_pose_distribution(
    level: int, pose_distribution: str
) -> dict[int, int]:
    """Template-id → position within the filtered distribution
    (``poses/utils.py:115-127``)."""
    index_range, _ = get_obj_poses_from_template_level(
        level=level, pose_distribution=pose_distribution, return_index=True
    )
    return {int(idx): i for i, idx in enumerate(index_range)}


# ---------------------------------------------------------------------------
# programmatic generation (standalone re-derivation of the assets)
# ---------------------------------------------------------------------------


def icosahedron() -> tuple[np.ndarray, np.ndarray]:
    """Unit icosahedron in the *pole orientation* the reference grids
    were built from: vertices at (0,0,±1) plus two pentagonal rings at
    z = ±1/√5, upper ring azimuths 72k°, lower ring 36°+72k°."""
    z_ring = 1.0 / np.sqrt(5.0)
    r_ring = 2.0 / np.sqrt(5.0)
    upper_az = np.deg2rad(72.0 * np.arange(5))
    lower_az = np.deg2rad(36.0 + 72.0 * np.arange(5))
    verts = np.concatenate(
        [
            np.array([[0.0, 0.0, 1.0]]),
            np.stack(
                [r_ring * np.cos(upper_az), r_ring * np.sin(upper_az),
                 np.full(5, z_ring)], axis=1,
            ),
            np.stack(
                [r_ring * np.cos(lower_az), r_ring * np.sin(lower_az),
                 np.full(5, -z_ring)], axis=1,
            ),
            np.array([[0.0, 0.0, -1.0]]),
        ]
    )
    faces = []
    for i in range(5):
        j = (i + 1) % 5
        u_i, u_j = 1 + i, 1 + j
        l_i, l_j = 6 + i, 6 + j
        faces += [
            [0, u_i, u_j],        # north cap
            [u_i, l_i, u_j],      # upper band
            [u_j, l_i, l_j],      # lower band
            [11, l_j, l_i],       # south cap
        ]
    return verts, np.asarray(faces, dtype=np.int64)


def icosphere(subdivisions: int) -> tuple[np.ndarray, np.ndarray]:
    """Subdivide the icosahedron, projecting midpoints onto the sphere.
    Vertex counts: 12, 42, 162, 642, 2562, ..."""
    verts, faces = icosahedron()
    for _ in range(subdivisions):
        verts_list = list(verts)
        midpoint_cache: dict[tuple[int, int], int] = {}

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in midpoint_cache:
                m = (verts_list[a] + verts_list[b]) / 2.0
                m = m / np.linalg.norm(m)
                midpoint_cache[key] = len(verts_list)
                verts_list.append(m)
            return midpoint_cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)
    return verts, faces


def generate_so3_grid(level: int, radius: float = 1.0, obj_distance: float = 0.5):
    """Regenerate (sphere_poses, obj_poses) for a grid level from
    scratch.  Matches the asset construction: icosphere(level+1)
    vertices stable-sorted by z, OpenCV look-at toward the origin, and
    inverse poses with the translation rescaled to ``obj_distance``."""
    verts, _ = icosphere(level + 1)
    order = np.argsort(verts[:, 2], kind="stable")
    verts = verts[order] * radius

    sphere_poses = np.stack([look_at(v, np.zeros(3)) for v in verts])
    obj_poses = np.stack([inverse_transform(p) for p in sphere_poses]).astype(np.float64)
    obj_poses[:, :3, 3] *= obj_distance / radius
    return sphere_poses, obj_poses


# ---------------------------------------------------------------------------
# nearest-template search (poses/utils.py:318-356)
# ---------------------------------------------------------------------------


class NearestTemplateFinder:
    """Map arbitrary query object poses to the nearest grid template.

    Distance is euclidean between OpenGL viewing directions (row 2 of
    the OpenGL-converted rotation), as in the reference; optionally also
    returns the residual in-plane angle.
    """

    def __init__(
        self,
        level_templates: int,
        pose_distribution: str = "all",
        return_inplane: bool = False,
        normalize_query_translation: bool = True,
    ):
        self.level_templates = level_templates
        self.pose_distribution = pose_distribution
        self.return_inplane = return_inplane
        self.normalize_query_translation = normalize_query_translation
        self.avail_index, self.obj_template_poses = get_obj_poses_from_template_level(
            level_templates, pose_distribution, return_cam=False, return_index=True
        )
        self.obj_template_openGL_poses = opencv2opengl(self.obj_template_poses)

    def search_nearest_template(self, obj_query_pose: np.ndarray):
        from nope_tpu.geometry.transforms import compute_inplane

        obj_query_pose = np.asarray(obj_query_pose).reshape(-1, 4, 4)
        query_gl = opencv2opengl(obj_query_pose)
        q_loc = query_gl[:, 2, :3]  # (M, 3) viewing directions
        t_loc = self.obj_template_openGL_poses[:, 2, :3]  # (N, 3)

        d2 = np.sum((q_loc[:, None, :] - t_loc[None, :, :]) ** 2, axis=-1)
        best = np.argmin(d2, axis=-1)
        if not self.return_inplane:
            return self.avail_index[best]
        nearest_poses = self.obj_template_poses[best]
        inplanes = np.array(
            [
                compute_inplane(obj_query_pose[i, :3, :3], nearest_poses[i, :3, :3])
                for i in range(len(obj_query_pose))
            ]
        )
        return self.avail_index[best], inplanes
