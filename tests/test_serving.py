"""Serving-engine tests: registration, cached-bank reuse, estimation
schema, multi-object isolation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.serving import PoseEstimator
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig

IMG = 32


@pytest.fixture(scope="module")
def estimator():
    task = PoseConditionalTask(
        PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
        StableDiffusionVAE(
            block_out_channels=(8, 8, 8, 8), layers_per_block=1,
            latent_channels=4, groups=4,
        ),
        TaskConfig(),
    )
    params = task.init(jax.random.key(0), image_size=IMG)
    return PoseEstimator(task, params, fast_evaluation=True)


def test_register_and_estimate(estimator, rng):
    assert estimator.num_templates == 26  # fast-eval grid
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("mug", ref)

    queries = rng.uniform(-1, 1, (3, IMG, IMG, 3)).astype(np.float32)
    result = estimator.estimate("mug", queries)
    assert result.nearest_idx.shape == (3, 5)
    assert result.rotations.shape == (3, 5, 3, 3)
    assert result.relative_rotations.shape == (3, 5, 3, 3)
    # relative = retrieved @ ref_poseᵀ with the default canonical ref
    ref_pose = estimator.template_poses[0]
    np.testing.assert_allclose(
        result.relative_rotations[0, 0],
        result.rotations[0, 0] @ ref_pose.T,
        atol=1e-6,
    )
    assert result.similarity.shape == (3, 26)
    assert result.template_poses.shape == (26, 3, 3)
    # retrieved rotations really are grid entries
    np.testing.assert_allclose(
        result.rotations[0, 0], estimator.template_poses[result.nearest_idx[0, 0]]
    )


def test_single_query_broadcast(estimator, rng):
    q = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    result = estimator.estimate("mug", q)
    assert result.similarity.shape == (1, 26)


def test_multi_object_isolation(estimator):
    # a dedicated seed: the shared rng fixture resets per test, which
    # would reproduce the exact reference image "mug" was registered with
    rng = np.random.default_rng(123)
    ref2 = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("cup", ref2)
    q = rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32)
    r_mug = estimator.estimate("mug", q)
    r_cup = estimator.estimate("cup", q)
    assert not np.allclose(r_mug.similarity, r_cup.similarity)
    estimator.deregister_object("cup")
    with pytest.raises(KeyError):
        estimator.estimate("cup", q)


def test_unregistered_object_raises(estimator, rng):
    with pytest.raises(KeyError, match="not registered"):
        estimator.estimate("ghost", rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32))


def test_infer_cli(tmp_path, rng):
    """End-to-end single-image inference CLI on PNG files."""
    from PIL import Image

    from nope_tpu.cli.infer import main

    def save_png(path):
        arr = rng.integers(0, 255, (64, 64, 4), dtype=np.uint8)
        Image.fromarray(arr, "RGBA").save(path)

    ref, q1, q2 = (str(tmp_path / n) for n in ("ref.png", "q1.png", "q2.png"))
    for p in (ref, q1, q2):
        save_png(p)
    out = str(tmp_path / "poses.json")
    main([
        "--reference", ref, "--queries", q1, q2, "--fast", "--out", out,
        "--refine-steps", "4",
        "model.img_size=32", "model.u_net.u_net_dim=8",
        "model.u_net.dim_mults=1,2", "model.u_net.resnet_block_groups=4",
        "model.encoder.block_out_channels=8,8,8,8",
        "model.encoder.layers_per_block=1", "model.encoder.norm_groups=4",
    ])
    import json

    payload = json.load(open(out))
    assert payload["num_templates"] == 26
    assert len(payload["results"]) == 2
    r = payload["results"][0]
    assert len(r["topk_template_idx"]) == 5
    assert np.asarray(r["topk_relative_rotations"]).shape == (5, 3, 3)
    assert np.asarray(r["topk_template_rotations"]).shape == (5, 3, 3)
    assert len(r["similarity"]) == 26
    refined = np.asarray(r["refined_relative_rotation"])
    assert refined.shape == (3, 3)
    np.testing.assert_allclose(refined.T @ refined, np.eye(3), atol=1e-4)


def test_batch_registration_matches_sequential(estimator, rng):
    """register_objects (one batched bank program for the gallery) must
    produce the same banks as per-object registration."""
    refs = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("solo0", refs[0])
    estimator.register_object("solo1", refs[1])
    estimator.register_objects(["batch0", "batch1"], refs)
    np.testing.assert_allclose(
        np.asarray(estimator._banks["batch0"]),
        np.asarray(estimator._banks["solo0"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(estimator._banks["batch1"]),
        np.asarray(estimator._banks["solo1"]), atol=1e-5,
    )
    for oid in ("solo0", "solo1", "batch0", "batch1"):
        estimator.deregister_object(oid)


def test_serving_dtype_follows_task_config(estimator, rng):
    """The engine serves in bf16 iff the task's half_precision_eval flag
    is set: banks are stored in the serving dtype, outputs are always
    float32 numpy."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("dtype_probe", ref)
    assert estimator._banks["dtype_probe"].dtype == jnp.bfloat16
    r = estimator.estimate("dtype_probe", ref[None])
    assert r.similarity.dtype == np.float32
    estimator.deregister_object("dtype_probe")

    fp32_task = PoseConditionalTask(
        estimator.task.unet, estimator.task.vae,
        TaskConfig(half_precision_eval=False),
    )
    # genuinely f32 weights — estimator.params were cast to bf16 at its
    # construction, which would mask a params-dtype-dependent regression
    fp32_params = jax.tree.map(
        lambda x: x.astype(jnp.float32), estimator.params
    )
    fp32_est = PoseEstimator(fp32_task, fp32_params, fast_evaluation=True)
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(fp32_est.params)
    )
    fp32_est.register_object("dtype_probe", ref)
    assert fp32_est._banks["dtype_probe"].dtype == jnp.float32


def test_registry_save_load_roundtrip(estimator, tmp_path, rng):
    """A restarted serving process restores saved banks and estimates
    identically without re-running the registration sweep; a registry
    from a different grid is rejected."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("persist", ref)
    q = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    before = estimator.estimate("persist", q)

    reg = str(tmp_path / "registry.npz")
    estimator.save_registry(reg)

    fresh = PoseEstimator(estimator.task, estimator.params, fast_evaluation=True)
    fresh.load_registry(reg)
    after = fresh.estimate("persist", q)
    np.testing.assert_allclose(after.similarity, before.similarity, atol=1e-5)
    np.testing.assert_array_equal(after.nearest_idx, before.nearest_idx)

    other = PoseEstimator(estimator.task, estimator.params, level=0,
                          pose_distribution="all")
    with pytest.raises(ValueError, match="different template grid"):
        other.load_registry(reg)
    estimator.deregister_object("persist")


def test_uint8_inputs_match_prenormalized_floats(estimator, rng):
    """uint8 images ship verbatim and normalise on device (4x less
    host->device traffic); retrieval must match the same images
    pre-normalised to floats on the host."""
    ref_u8 = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    ref_f32 = ref_u8.astype(np.float32) / 127.5 - 1.0
    estimator.register_object("u8", ref_u8)
    estimator.register_object("f32", ref_f32)
    np.testing.assert_allclose(
        np.asarray(estimator._banks["u8"], np.float32),
        np.asarray(estimator._banks["f32"], np.float32),
        atol=1e-2,
    )
    q_u8 = rng.integers(0, 256, (2, IMG, IMG, 3), dtype=np.uint8)
    r_u8 = estimator.estimate("u8", q_u8)
    r_f32 = estimator.estimate("f32", q_u8.astype(np.float32) / 127.5 - 1.0)
    np.testing.assert_array_equal(r_u8.nearest_idx, r_f32.nearest_idx)
    np.testing.assert_allclose(r_u8.similarity, r_f32.similarity, rtol=2e-2)
    estimator.deregister_object("u8")
    estimator.deregister_object("f32")


def test_non_uint8_integer_images_rejected(estimator, rng):
    """Only uint8 has a defined on-device normalisation; other integer
    dtypes must error instead of silently casting un-normalised
    (round-2 advisor finding)."""
    bad = rng.integers(0, 65535, (2, IMG, IMG, 3)).astype(np.int32)
    with pytest.raises(TypeError, match="integer image dtype"):
        estimator.register_object("bad", bad[0])
    estimator.register_object(
        "ok", rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    )
    with pytest.raises(TypeError, match="integer image dtype"):
        estimator.estimate("ok", bad.astype(np.uint16))
    estimator.deregister_object("ok")


def _flag_task():
    return PoseConditionalTask(
        PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
        StableDiffusionVAE(
            block_out_channels=(8, 8, 8, 8), layers_per_block=1,
            latent_channels=4, groups=4,
        ),
        TaskConfig(),
    )


def test_estimate_many_mixed_objects(estimator, rng):
    """One dispatch scores a batch whose queries target DIFFERENT
    registered objects; results must equal per-object estimate calls."""
    refs = rng.uniform(-1, 1, (3, IMG, IMG, 3)).astype(np.float32)
    estimator.register_objects(["ma", "mb", "mc"], refs)
    queries = rng.uniform(-1, 1, (4, IMG, IMG, 3)).astype(np.float32)
    ids = ["ma", "mb", "ma", "mc"]

    many = estimator.estimate_many(ids, queries)
    assert many.similarity.shape == (4, estimator.num_templates)
    assert many.nearest_idx.shape == (4, 5)
    for i, oid in enumerate(ids):
        single = estimator.estimate(oid, queries[i : i + 1])
        np.testing.assert_allclose(
            many.similarity[i], single.similarity[0], rtol=2e-2, atol=1e-3
        )
        np.testing.assert_array_equal(many.nearest_idx[i], single.nearest_idx[0])
        np.testing.assert_allclose(
            many.relative_rotations[i], single.relative_rotations[0], atol=1e-6
        )
    with pytest.raises(KeyError, match="not registered"):
        estimator.estimate_many(["ma", "nope"], queries[:2])
    with pytest.raises(ValueError, match="object ids for"):
        estimator.estimate_many(["ma"], queries)
    for oid in ("ma", "mb", "mc"):
        estimator.deregister_object(oid)


def test_estimate_many_stacked_cache_invalidation(estimator, rng):
    """Repeat estimate_many calls on the same gallery reuse the stacked
    bank; re-registering an object with DIFFERENT content must refresh
    it (a stale stack would silently score against the old bank)."""
    refs = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    estimator.register_objects(["ca", "cb"], refs)
    queries = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    ids = ["ca", "cb"]

    first = estimator.estimate_many(ids, queries)
    assert estimator._stacked_cache[0] == ("ca", "cb")
    again = estimator.estimate_many(ids, queries)  # cache hit
    np.testing.assert_array_equal(first.nearest_idx, again.nearest_idx)
    np.testing.assert_allclose(first.similarity, again.similarity)

    # new content under an existing id → scores must change with it
    estimator.register_object("cb", np.roll(refs[0], IMG // 2, axis=0))
    assert estimator._stacked_cache[0] is None
    refreshed = estimator.estimate_many(ids, queries)
    single = estimator.estimate("cb", queries[1:2])
    np.testing.assert_array_equal(refreshed.nearest_idx[1], single.nearest_idx[0])
    assert not np.allclose(refreshed.similarity[1], first.similarity[1])

    estimator.deregister_object("ca")
    assert estimator._stacked_cache[0] is None
    with pytest.raises(KeyError, match="not registered"):
        estimator.estimate_many(ids, queries)
    estimator.deregister_object("cb")


def test_int8_banks_agree_with_full_precision(rng, tmp_path):
    """int8 per-(template, channel)-scale banks: 4x smaller, top-1
    retrieval must agree with the full-precision bank and similarities
    stay close (the serving analogue of the bf16 guardrail in
    tests/test_learning.py)."""
    task = _flag_task()
    params = task.init(jax.random.key(0), image_size=IMG)
    full = PoseEstimator(task, params, fast_evaluation=True)
    q8 = PoseEstimator(task, params, fast_evaluation=True, bank_dtype="int8")

    refs = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    full.register_objects(["a", "b"], refs)
    q8.register_objects(["a", "b"], refs)

    # storage really is int8 + scale
    rec = q8._banks["a"]
    assert rec[0].dtype == jnp.int8 and rec[1].dtype == jnp.float32
    assert rec[0].nbytes == np.prod(rec[0].shape)  # 1 byte/entry

    queries = rng.uniform(-1, 1, (6, IMG, IMG, 3)).astype(np.float32)
    r_full = full.estimate("a", queries)
    r_q8 = q8.estimate("a", queries)
    agree = np.mean(r_full.nearest_idx[:, 0] == r_q8.nearest_idx[:, 0])
    assert agree == 1.0, (r_full.nearest_idx[:, 0], r_q8.nearest_idx[:, 0])
    np.testing.assert_allclose(
        r_q8.similarity, r_full.similarity, rtol=3e-2, atol=2e-2
    )

    # estimate_many works on quantized records too
    many = q8.estimate_many(["a", "b", "a"], queries[:3])
    np.testing.assert_array_equal(
        many.nearest_idx[0], q8.estimate("a", queries[:1]).nearest_idx[0]
    )

    # registry round-trip preserves the quantized form + layout guard
    reg = str(tmp_path / "reg.npz")
    q8.save_registry(reg)
    fresh = PoseEstimator(task, params, fast_evaluation=True, bank_dtype="int8")
    fresh.load_registry(reg)
    np.testing.assert_array_equal(
        np.asarray(fresh._banks["a"][0]), np.asarray(rec[0])
    )
    with pytest.raises(ValueError, match="layout"):
        full2 = PoseEstimator(task, params, fast_evaluation=True)
        full2.load_registry(reg)


def test_estimate_with_refinement(estimator, rng):
    """refine_steps>0 returns a CONTINUOUS refined ΔR: a valid rotation,
    generally off-grid, with absolute = ΔR̂ · R_ref; the grid outputs are
    unchanged and refinement composes with the one-dispatch path (the
    program is cached per (steps, lr, objective))."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("refine_me", ref)
    q = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)

    plain = estimator.estimate("refine_me", q)
    assert plain.refined_relative_rotation is None

    out = estimator.estimate("refine_me", q, refine_steps=8, refine_lr=2e-2)
    r = out.refined_relative_rotation
    assert r.shape == (2, 3, 3)
    RtR = np.einsum("bji,bjk->bik", r, r)
    np.testing.assert_allclose(RtR, np.eye(3)[None].repeat(2, 0), atol=1e-4)
    assert np.allclose(np.linalg.det(r), 1.0, atol=1e-4)
    # grid outputs identical to the unrefined call
    np.testing.assert_array_equal(out.nearest_idx, plain.nearest_idx)
    ref_pose = estimator.template_poses[0]
    np.testing.assert_allclose(
        out.refined_rotation, r @ ref_pose, atol=1e-5
    )
    # second call hits the cached compiled program
    out2 = estimator.estimate("refine_me", q, refine_steps=8, refine_lr=2e-2)
    np.testing.assert_allclose(
        out2.refined_relative_rotation, r, atol=1e-6
    )
    estimator.deregister_object("refine_me")


def test_estimate_with_multistart_refinement(estimator, rng):
    """refine_topk>1 multi-starts from the top-K retrieved poses inside
    the same one-dispatch program: valid rotations out, grid outputs
    unchanged, estimate/estimate_many agree, and out-of-range K is
    rejected up front."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("multistart", ref)
    q = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)

    plain = estimator.estimate("multistart", q)
    out = estimator.estimate(
        "multistart", q, refine_steps=6, refine_lr=2e-2, refine_topk=3
    )
    r = out.refined_relative_rotation
    assert r.shape == (2, 3, 3)
    RtR = np.einsum("bji,bjk->bik", r, r)
    np.testing.assert_allclose(RtR, np.eye(3)[None].repeat(2, 0), atol=1e-4)
    np.testing.assert_array_equal(out.nearest_idx, plain.nearest_idx)

    # the batched-gallery path runs the same multi-start per query
    many = estimator.estimate_many(
        ["multistart", "multistart"], q,
        refine_steps=6, refine_lr=2e-2, refine_topk=3,
    )
    np.testing.assert_allclose(
        many.refined_relative_rotation, r, atol=2e-5
    )

    with pytest.raises(ValueError, match="refine_topk"):
        estimator.estimate("multistart", q, refine_steps=6, refine_topk=99)
    estimator.deregister_object("multistart")


def test_refinement_state_survives_registry_roundtrip(estimator, rng, tmp_path):
    """save_registry persists the reference latents + conditioning reps,
    so a reloaded serving process can still refine; registries written
    before the feature (no latents) load but refuse refine_steps."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("persist_refine", ref)
    q = rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32)
    want = estimator.estimate("persist_refine", q, refine_steps=6)

    path = str(tmp_path / "registry.npz")
    estimator.save_registry(path)

    fresh = PoseEstimator(
        estimator.task, estimator.params, fast_evaluation=True
    )
    fresh.load_registry(path)
    got = fresh.estimate("persist_refine", q, refine_steps=6)
    np.testing.assert_allclose(
        got.refined_relative_rotation,
        want.refined_relative_rotation,
        atol=2e-5,
    )

    # simulate a pre-refinement registry: strip the latent keys
    with np.load(path) as data:
        stripped = {
            k: data[k] for k in data.files
            if not (k.startswith("reflat:") or k.startswith("bankrep:"))
        }
    old_path = str(tmp_path / "old_registry.npz")
    np.savez_compressed(old_path, **stripped)
    older = PoseEstimator(
        estimator.task, estimator.params, fast_evaluation=True
    )
    older.load_registry(old_path)
    assert older.estimate("persist_refine", q).nearest_idx.shape == (1, 5)
    with pytest.raises(ValueError, match="re-register"):
        older.estimate("persist_refine", q, refine_steps=6)
    estimator.deregister_object("persist_refine")


def test_estimate_many_with_refinement(estimator, rng):
    """Mixed-object batched refinement: estimate_many(refine_steps=K)
    refines each query against its OWN object's reference latent in the
    one-dispatch program, and must agree with per-object
    estimate(refine_steps=K) calls; a gallery member without persisted
    latents refuses refinement with a clear error."""
    refs = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    estimator.register_objects(["ra", "rb"], refs)
    queries = rng.uniform(-1, 1, (3, IMG, IMG, 3)).astype(np.float32)
    ids = ["ra", "rb", "ra"]

    many = estimator.estimate_many(ids, queries, refine_steps=8, refine_lr=2e-2)
    r = many.refined_relative_rotation
    assert r.shape == (3, 3, 3)
    RtR = np.einsum("bji,bjk->bik", r, r)
    np.testing.assert_allclose(RtR, np.eye(3)[None].repeat(3, 0), atol=1e-4)
    for i, oid in enumerate(ids):
        single = estimator.estimate(
            oid, queries[i : i + 1], refine_steps=8, refine_lr=2e-2
        )
        np.testing.assert_array_equal(many.nearest_idx[i], single.nearest_idx[0])
        np.testing.assert_allclose(
            many.refined_relative_rotation[i],
            single.refined_relative_rotation[0],
            atol=2e-4,
        )
        np.testing.assert_allclose(
            many.refined_rotation[i], single.refined_rotation[0], atol=2e-4
        )

    # repeat call reuses both stacked caches (bank + refinement state)
    again = estimator.estimate_many(ids, queries, refine_steps=8, refine_lr=2e-2)
    np.testing.assert_allclose(again.refined_relative_rotation, r, atol=1e-6)
    assert estimator._stacked_refine_cache[0] == ("ra", "rb")

    # a gallery member lacking reference latents → explicit refusal
    estimator._ref_latents["rb"] = None
    with pytest.raises(ValueError, match="re-register"):
        estimator.estimate_many(ids, queries, refine_steps=8)
    for oid in ("ra", "rb"):
        estimator.deregister_object(oid)


def test_bank_storage_is_flat_lane_friendly(estimator, rng):
    """Stored records must keep their LARGE axis minormost: TPU arrays
    tile the trailing axis onto 128 lanes, so a stored bank ending in
    the latent C=4 physically pads 32x (the round-4 512-object gallery
    probe OOMed a 16 GB v5e on 0.7 GB of logical banks).  The engine
    stores flat (1, N, h*w*C) / scales (1, N*C) / ref latents
    (1, h*w*C) / host (N*dim,) reps; dense shapes exist only inside
    compiled programs and in the (unchanged) registry disk format."""
    ref = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    estimator.register_object("flat", ref)
    h, w, c = estimator._latent_hwc
    assert (h, w, c) == (IMG // 8, IMG // 8, 4)
    bank = estimator._banks["flat"]
    assert bank.shape == (1, estimator.num_templates, h * w * c)
    # (at flagship geometry h*w*c = 4096 — a full multiple of the 128
    # lanes; the tiny test model's 64 still beats trailing C=4 by 16x)
    assert estimator._ref_latents["flat"].shape == (1, h * w * c)
    rep = estimator._bank_reps["flat"]
    assert isinstance(rep, np.ndarray) and rep.shape == (
        estimator.num_templates * 6,
    )

    # int8 record layout
    q8e = PoseEstimator(
        estimator.task, estimator.params, fast_evaluation=True,
        bank_dtype="int8",
    )
    q8e.register_object("flat", ref)
    q8, scale = q8e._banks["flat"]
    assert q8.dtype == jnp.int8
    assert q8.shape == (1, q8e.num_templates, h * w * c)
    assert scale.shape == (1, q8e.num_templates * c)

    # mixed latent geometry rejected (the compiled programs bake it in)
    bigger = rng.uniform(-1, 1, (IMG * 2, IMG * 2, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="mixed latent geometries"):
        estimator.register_object("other_geom", bigger)
