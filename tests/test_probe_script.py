"""Guard the unseen-object probe's data-gen plumbing (scripts/
probe_unseen_objects.py) — the round-3 hardware evidence depends on it.

The probe is a linear script; everything above its ``[data-gen ends]``
sentinel is exec'd here with tiny arguments so the TRAIN_IDS mapping,
the widened held-out-query stream, and the --rand-views recipe variant
stay correct without building the flagship models.
"""

import os
import sys

import numpy as np

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "probe_unseen_objects.py",
)


def _run_datagen(argv):
    src = open(_SCRIPT).read()
    head, sep, _ = src.partition("# [data-gen ends]")
    assert sep, "sentinel missing from probe script"
    old_argv = sys.argv
    sys.argv = ["probe"] + argv
    try:
        g = {"__name__": "probe_datagen", "__file__": _SCRIPT}
        exec(compile(head, _SCRIPT, "exec"), g)
    finally:
        sys.argv = old_argv
    return g


def test_datagen_train_ids_and_widened_heldout_queries():
    g = _run_datagen(
        ["--n-train-obj", "26", "--extra-ho-queries", "2",
         "--out", "/tmp/probe_test_out"]
    )
    # train ids extend past 24 with fresh ids; 24..27 stay held out
    assert g["TRAIN_IDS"] == list(range(24)) + [28, 29]
    assert g["HELDOUT_OBJS"] == [24, 25, 26, 27]
    data = g["data"]
    # standard protocol draws are a prefix of the widened query set
    for o in g["HELDOUT_OBJS"]:
        assert data[o]["queries"].shape == (8, 256, 256, 3)
        assert data[o]["query_R"].shape == (8, 3, 3)
    # train objects keep the standard 6-query protocol
    assert data[0]["queries"].shape == (6, 256, 256, 3)
    # the widened stream must not perturb the standard draws: regenerate
    # object 24's standard queries exactly as a no-extras run would
    from nope_tpu.scripts.generate_data import sample_camera_poses

    prng = np.random.default_rng(5000 + 24)
    std = sample_camera_poses(prng, 6, 1.0)
    np.testing.assert_array_equal(
        data[24]["query_R"][:6], std[:, :3, :3].astype(np.float32)
    )


def test_datagen_newfam_heldout_group():
    """Round-4: --newfam-ho adds 4 held-out objects from the C/D
    families (ids >= 68 rule), without touching the standard groups."""
    g = _run_datagen(
        ["--n-train-obj", "4", "--newfam-ho", "1",
         "--out", "/tmp/probe_test_out"]
    )
    assert g["HELDOUT_NEWFAM"] == [9002, 9003, 9006, 9007]
    data = g["data"]
    for o in g["HELDOUT_NEWFAM"]:
        assert data[o]["queries"].shape == (6, 256, 256, 3)
        assert data[o]["queries"].max() > 0  # renders non-degenerate
    # ids <= 67 keep the round-3 2-family rule bit-identical
    pts, _ = g["make_points"](2)
    rng = np.random.default_rng(4002)
    np.testing.assert_array_equal(pts, rng.normal(size=(60, 3)) * 0.12)
    # id%4 families differ for high ids: platelet (C) is flat, ring (D)
    # has a hole (bimodal radius) — crude shape checks
    ptsC, _ = g["make_points"](9002)
    ptsD, _ = g["make_points"](9003)
    assert np.std(ptsC[:, 2]) < 0.06 and np.std(ptsC[:, 0]) > 0.09
    radii = np.linalg.norm(ptsD[:, :2], axis=1)
    assert radii.mean() > 0.10  # mass concentrated on the ring


def test_datagen_rand_views_recipe_variant():
    g = _run_datagen(
        ["--n-train-obj", "4", "--rand-views", "3",
         "--out", "/tmp/probe_test_out"]
    )
    assert g["N_TRAIN_VIEWS"] == 29
    data = g["data"]
    # train objects gain 3 continuous views appended after the 26 grid
    # views; held-out objects keep the pure grid set
    assert data[0]["train_views"].shape == (29, 256, 256, 3)
    assert data[24]["train_views"].shape == (26, 256, 256, 3)
    # grid prefix identical to the no-flag recipe; suffix is new poses
    tmpl_R = g["_tmpl44"][:, :3, :3].astype(np.float32)
    np.testing.assert_array_equal(data[0]["train_R"][:26], tmpl_R)
    assert not np.allclose(data[0]["train_R"][26], tmpl_R[0])
    # renders are non-degenerate (object visible in the random views)
    assert data[0]["train_views"][26:].max() > 0
