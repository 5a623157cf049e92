"""Recompute the level0→level2 nearest-template index maps.

Equivalent of ``/root/reference/src/poses/find_neighbors.py``: locates
each level-0 grid pose inside the level-2 grid and writes
``idx_{all,upper}_level0_in_level2.npy``.  The shipped assets were
produced this way; this script regenerates them (the test suite checks
the recomputation matches the committed files).

Usage: ``python -m nope_tpu.scripts.find_neighbors [--out-dir DIR]``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from nope_tpu.geometry.so3_grid import (
    NearestTemplateFinder,
    get_obj_poses_from_template_level,
    load_index_level0_in_level2,
)


def compute(pose_distribution: str = "all") -> np.ndarray:
    finder = NearestTemplateFinder(
        level_templates=2, pose_distribution="all", return_inplane=False
    )
    obj_level0 = get_obj_poses_from_template_level(0, pose_distribution)
    return finder.search_nearest_template(obj_level0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args()
    for dist in ("all", "upper"):
        idx = compute(dist)
        committed = load_index_level0_in_level2(dist)
        match = np.array_equal(idx, committed)
        print(f"{dist}: {len(idx)} indices, matches committed asset: {match}")
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            np.save(os.path.join(args.out_dir, f"idx_{dist}_level0_in_level2.npy"), idx)


if __name__ == "__main__":
    main()
