"""Production serving engine.

The reference's eval loop rebuilds the template bank for every batch
(``model.py:268-323``) because queries and references are paired per
item.  In deployment the natural pattern is object-centric: one
reference image registers an object (N U-Net forwards, once), the bank
stays HBM-resident, and each subsequent query costs one VAE encode + a
fused similarity sweep — the cheap path the BASELINE north star prices.

API::

    est = PoseEstimator(task, params, level=2, pose_distribution="upper")
    est.register_object("mug0", reference_image)        # once per object
    result = est.estimate("mug0", query_images)          # many times
    result.relative_rotations  # (B, k, 3, 3) ΔR reference→query
    result.similarity          # (B, N) viewpoint-bin pose distribution
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import matrix_to_rotation_6d
from nope_tpu.geometry.transforms import relative_rotation_jax


def _record_len(record) -> int:
    """Leading (object) axis length of a stored bank record (array or
    (int8, scale) tuple)."""
    return jax.tree.leaves(record)[0].shape[0]


@dataclasses.dataclass
class PoseEstimate:
    nearest_idx: np.ndarray  # (B, k) indices into the template grid
    #: (B, k, 3, 3) relative rotations ΔR = T_i · R_refᵀ — THE primary
    #: output: the rotation taking the reference view to the query view
    relative_rotations: np.ndarray
    #: (B, k, 3, 3) the retrieved grid poses themselves; these are the
    #: query's *absolute* rotations only if the object really was at the
    #: registered reference_pose in the reference image
    rotations: np.ndarray
    similarity: np.ndarray  # (B, N) pose distribution over viewpoint bins
    template_poses: np.ndarray  # (N, 3, 3) the grid (shared)
    #: (B, 3, 3) CONTINUOUS relative rotation from gradient refinement
    #: (``estimate(..., refine_steps=N)``) — no longer grid-snapped;
    #: None unless refinement was requested.  No reference counterpart:
    #: tasks/refinement.py
    refined_relative_rotation: Optional[np.ndarray] = None
    #: (B, 3, 3) refined absolute query rotation (ΔR̂ · R_ref)
    refined_rotation: Optional[np.ndarray] = None


class PoseEstimator:
    """Object-centric pose estimation service around a
    :class:`PoseConditionalTask`.

    ``reference_pose`` at registration defaults to the canonical grid
    pose 0 — i.e. the reference image is treated as the canonical view
    and retrieved rotations are relative to it, matching the
    "one reference image, no CAD" NOPE setting.
    """

    def __init__(
        self,
        task,
        params,
        level: int = 2,
        pose_distribution: str = "upper",
        fast_evaluation: bool = False,
        chunk_size: Optional[int] = None,
        bank_dtype: str = "auto",
    ):
        """``bank_dtype``: "auto" keeps banks in the serving dtype
        (bf16/f32); "int8" stores each bank as int8 values + a
        per-(template, channel) f32 scale — 2x (vs bf16) / 4x (vs f32)
        less HBM per object, measured at throughput parity with perfect
        top-1 agreement (guardrail in tests/test_serving.py).

        Scoring is XLA-only: the channel-first Pallas alternative was
        built, given its best-case home here, measured slower end-to-end
        (docs/PERFORMANCE.md round-3), and retired to
        :mod:`nope_tpu.ops.experimental.pallas_similarity`.
        """
        from nope_tpu.tasks.pose_conditional import cast_half

        self.task = task
        # honor the task's guardrailed bf16-eval default: cast the served
        # params ONCE here and images at the call boundary, so the VAE
        # encode + bank sweep run at bf16 MXU speed (the cast in
        # eval_geodesic_step covers the eval harness, not this path)
        self._half = bool(getattr(task.config, "half_precision_eval", False))
        self._image_dtype = jnp.bfloat16 if self._half else jnp.float32
        self.params = cast_half(params) if self._half else params
        self.chunk_size = chunk_size
        if bank_dtype not in ("auto", "int8"):
            raise ValueError(f"bank_dtype must be 'auto' or 'int8', got {bank_dtype!r}")
        self.bank_dtype = bank_dtype

        if fast_evaluation:
            indexes = so3_grid.load_index_level0_in_level2(pose_distribution)
            grid = so3_grid.get_obj_poses_from_template_level(2, "all")[indexes]
        else:
            grid = so3_grid.get_obj_poses_from_template_level(level, pose_distribution)
        self.template_poses = grid[:, :3, :3].astype(np.float32)
        #: oid → stored bank record, FLAT on the trailing axis so device
        #: bytes == logical bytes (see ``_store``): (1, N, h·w·C) array
        #: for "auto", ((1, N, h·w·C) int8, (1, N·C) f32 scale) for
        #: "int8"
        self._banks: Dict[str, Any] = {}
        self._ref_poses: Dict[str, np.ndarray] = {}
        #: oid → (1, h·w·C) flat reference latent (kept for gradient
        #: pose refinement; ~16 KB/object) and HOST-side (N·dim,) f32
        #: conditioning reps (shipped on demand; host storage avoids M
        #: per-object device dispatches at gallery registration)
        self._ref_latents: Dict[str, Any] = {}
        self._bank_reps: Dict[str, Any] = {}
        #: dense latent geometry (h, w, C) the flat records reshape back
        #: to inside compiled programs; pinned by the first registration
        #: or registry load, checked by later ones
        self._latent_hwc: Optional[tuple] = None
        #: (unique-id tuple, stacked record) from the last estimate_many
        self._stacked_cache: tuple = (None, None)
        #: (unique-id tuple, (stacked ref latents, stacked bank reps))
        self._stacked_refine_cache: tuple = (None, None)
        #: (steps, lr, objective) → jitted score+refine program
        self._refine_cache: Dict[tuple, Any] = {}

        # uint8 inputs transfer as-is and normalise ON DEVICE: on
        # high-latency links (the measured v5e tunnel) host->device
        # transfer of the query batch dominates estimate latency, and
        # uint8 is 4x fewer bytes than f32 (the dtype branch happens at
        # trace time; jit specialises per input dtype)
        def _norm(x):
            if x.dtype == jnp.uint8:
                # normalise in f32 then cast: bit-identical to a host
                # f32 normalise followed by the serving-dtype cast
                return (x.astype(jnp.float32) / 127.5 - 1.0).astype(
                    self._image_dtype
                )
            return x

        def _store(bank):
            """Raw (M, N, h, w, C) bank → the storage record (still
            inside the registration jit: quantize/flatten fuse into
            the bank-producing program, zero extra dispatches).

            Storage is FLATTENED to (M, N, h·w·C) (scales to (M, N·C)):
            TPU arrays are physically tiled with the minormost axis on
            the 128 lanes, so a stored bank whose trailing axis is the
            latent C=4 pads 32× on the device (and the per-object
            (1, ...) slices were observed padding 128× — the round-4
            512-object gallery probe OOMed a 16 GB chip on banks whose
            logical size was 0.7 GB).  With h·w·C = 4096 minormost the
            physical bytes equal the logical bytes; programs reshape
            back to (…, h, w, C) internally, where layout assignment is
            XLA's problem, not the storage format's."""
            m, n = bank.shape[0], bank.shape[1]
            if self.bank_dtype == "int8":
                b32 = bank.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(b32), axis=(2, 3), keepdims=True)
                scale = jnp.maximum(absmax, 1e-12) / 127.0  # (M, N, 1, 1, C)
                q8 = jnp.clip(jnp.round(b32 / scale), -127, 127).astype(jnp.int8)
                return q8.reshape(m, n, -1), scale.reshape(m, -1)
            return bank.reshape(m, n, -1)

        def _dequant(record):
            """Flattened stored record → dense (…, N, h, w, C) bank in
            the serving dtype (inside a compiled program)."""
            h, w, c = self._latent_hwc
            if self.bank_dtype == "int8":
                q8, scale = record
                lead = q8.shape[:-1]
                q8 = q8.reshape(*lead, h, w, c)
                scale = scale.reshape(scale.shape[0], -1, 1, 1, c)
                return (q8.astype(jnp.float32) * scale).astype(self._image_dtype)
            return record.reshape(*record.shape[:-1], h, w, c)

        # jitted programs (compiled once per shape); the bank broadcast
        # lives inside the jit so XLA never materialises per-query copies
        def _register(p, ref, bank_R):
            # the reference latent is a byproduct of bank generation —
            # keep it (it is what gradient refinement conditions on);
            # stored flat (M, h·w·C) for the same lane-padding reason
            # as the banks (see _store)
            ref_lat = task.encode(p, _norm(ref), "mode")
            bank = task.generate_template_bank(
                p, None, bank_R, chunk_size=chunk_size,
                reference_latent=ref_lat,
            )
            return _store(bank), ref_lat.reshape(ref_lat.shape[0], -1)

        self._register_fn = jax.jit(_register)

        def _similarity(p, q, bank_b):
            """(B,) queries vs per-query (B, N, ...) stored records →
            (similarity, idx)."""
            return task.retrieval(p, q, _dequant(bank_b))

        def _score(p, q, bank):
            q = _norm(q)
            bank_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (q.shape[0],) + x.shape[1:]), bank
            )
            return _similarity(p, q, bank_b)

        def _score_many(p, q, banks, inv):
            # banks: records stacked over M unique objects; inv: (B,)
            # query→object map.  The gather happens on device inside the
            # one scoring program.
            q = _norm(q)
            bank_b = jax.tree.map(lambda x: jnp.take(x, inv, axis=0), banks)
            return _similarity(p, q, bank_b)

        self._score_fn = jax.jit(_score)
        self._score_many_fn = jax.jit(_score_many)
        self._split_fn = jax.jit(
            lambda b: tuple(
                jax.tree.map(lambda x: x[i : i + 1], b) for i in range(_record_len(b))
            )
        )
        self._concat_fn = jax.jit(
            lambda parts: jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        )

        def _make_refiner(steps: int, lr: float, objective: str, topk: int):
            """topk == 1: single-start refine from the retrieved top-1.
            topk > 1: multi-start from the top-K retrieved poses in one
            K×-wider batched program, keeping the per-query winner by
            final latent objective (tasks/refinement.py
            make_multistart_refiner — hedges the init-policy dependence
            documented in docs/PERFORMANCE.md round-4)."""
            from nope_tpu.tasks.refinement import (
                make_multistart_refiner, make_pose_refiner,
            )

            if topk > 1:
                multi = make_multistart_refiner(
                    task, steps=steps, lr=lr, objective=objective
                )
                return lambda p, q, r, iR: multi(p, q, r, iR)[0]
            single = make_pose_refiner(
                task, steps=steps, lr=lr, objective=objective
            )
            # single-start consumes (B, 1, 3, 3) for a uniform interface
            return lambda p, q, r, iR: single(p, q, r, iR[:, 0])[0]

        def _build_refine_program(
            steps: int, lr: float, objective: str, topk: int = 1
        ):
            """Score + continuous top-K refinement as ONE device program
            (encode → retrieval → ``tasks.refinement`` gradient loop):
            the per-dispatch latency cost of refinement is zero."""
            from nope_tpu.geometry.rotations import rotation_6d_to_matrix

            refiner = _make_refiner(steps, lr, objective, topk)

            def run(p, q, bank, ref_lat, bank_rep):
                q_lat = task.encode(p, _norm(q), "mode")
                bank_b = jax.tree.map(
                    lambda x: jnp.broadcast_to(
                        x, (q_lat.shape[0],) + x.shape[1:]
                    ),
                    bank,
                )
                sim, idx = task.retrieval(
                    p, None, _dequant(bank_b), query_latent=q_lat
                )
                # stored flat: reps (N·dim,), ref latent (1, h·w·C)
                rep = bank_rep.reshape(self.num_templates, -1)
                init_R = rotation_6d_to_matrix(
                    rep[idx[:, :topk]].astype(jnp.float32)
                )  # (B, K, 3, 3)
                ref_lat = ref_lat.reshape((1,) + self._latent_hwc)
                ref_b = jnp.broadcast_to(
                    ref_lat, (q_lat.shape[0],) + ref_lat.shape[1:]
                )
                return sim, idx, refiner(p, q_lat, ref_b, init_R)

            return jax.jit(run)

        self._build_refine_program = _build_refine_program

        def _build_refine_many_program(
            steps: int, lr: float, objective: str, topk: int = 1
        ):
            """The :meth:`estimate_many` variant: per-query gathers over
            the unique-object stacks (banks, reference latents,
            conditioning reps) happen on device, then score + refine in
            the same single program."""
            from nope_tpu.geometry.rotations import rotation_6d_to_matrix

            refiner = _make_refiner(steps, lr, objective, topk)

            def run(p, q, banks, inv, ref_lats, bank_reps):
                q_lat = task.encode(p, _norm(q), "mode")
                bank_b = jax.tree.map(lambda x: jnp.take(x, inv, axis=0), banks)
                sim, idx = task.retrieval(
                    p, None, _dequant(bank_b), query_latent=q_lat
                )
                # stored flat: reps (M, N·dim), ref latents (M, h·w·C)
                rep_b = jnp.take(bank_reps, inv, axis=0).reshape(
                    inv.shape[0], self.num_templates, -1
                )  # (B, N, dim)
                init_R = rotation_6d_to_matrix(
                    jnp.take_along_axis(
                        rep_b, idx[:, :topk, None], axis=1
                    ).astype(jnp.float32)
                )  # (B, K, 3, 3)
                ref_b = jnp.take(ref_lats, inv, axis=0).reshape(
                    (inv.shape[0],) + self._latent_hwc
                )  # (B, h, w, C)
                return sim, idx, refiner(p, q_lat, ref_b, init_R)

            return jax.jit(run)

        self._build_refine_many_program = _build_refine_many_program

    @property
    def num_templates(self) -> int:
        return len(self.template_poses)

    def _check_topk(self, topk: int) -> None:
        k = int(getattr(self.task.config, "retrieval_k", 5))
        if not 1 <= int(topk) <= k:
            raise ValueError(
                f"refine_topk={topk} outside [1, {k}] (retrieval returns "
                f"the top-{k} templates; raise task config retrieval_k "
                "for wider multi-start)"
            )

    def _pin_latent_hwc(self, image_hw) -> None:
        """Pin the dense latent geometry (h, w, C) that flat-stored
        records reshape back to inside compiled programs.  Derived
        statically from the VAE config (downscale 2^(n_blocks−1)), so
        no extra device program runs; a second registration or registry
        load with a different geometry is rejected (the compiled
        scoring programs bake the shape in at trace time)."""
        vae = self.task.vae
        f = 2 ** (len(vae.block_out_channels) - 1)
        hwc = (
            int(image_hw[0]) // f,
            int(image_hw[1]) // f,
            int(vae.latent_channels),
        )
        if self._latent_hwc is None:
            self._latent_hwc = hwc
        elif self._latent_hwc != hwc:
            raise ValueError(
                "mixed latent geometries in one estimator: "
                f"{self._latent_hwc} vs {hwc}"
            )

    def _device_images(self, images) -> jax.Array:
        """uint8 ships verbatim (normalised on device inside the jit);
        float inputs are assumed already in [-1, 1] and cast to the
        serving dtype."""
        arr = np.asarray(images)
        if arr.dtype == np.uint8:
            return jnp.asarray(arr)
        if np.issubdtype(arr.dtype, np.integer):
            # only uint8 has a defined on-device normalisation; any other
            # integer input would silently cast to float un-normalised
            # and produce garbage similarities
            raise TypeError(
                f"integer image dtype {arr.dtype} unsupported: pass uint8 "
                "(normalised on device) or float images already in [-1, 1]"
            )
        return jnp.asarray(arr, self._image_dtype)

    def _pose_representation(self, rel: jax.Array) -> jax.Array:
        """Encode ΔR matrices in the representation the U-Net was built
        for (rot_representation_dim: 6 → rotation-6d, 4 → quaternion,
        3 → euler XYZ)."""
        dim = getattr(self.task.unet, "rot_representation_dim", 6)
        if dim == 6:
            return matrix_to_rotation_6d(rel)
        if dim == 4:
            from nope_tpu.geometry.rotations import matrix_to_quaternion

            return matrix_to_quaternion(rel)
        if dim == 3:
            from nope_tpu.geometry.rotations import matrix_to_euler_angles

            return matrix_to_euler_angles(rel, "XYZ")
        raise ValueError(f"unsupported rotation representation dim {dim}")

    def register_object(
        self,
        object_id: str,
        reference_image: np.ndarray,
        reference_pose: Optional[np.ndarray] = None,
    ) -> None:
        """Precompute and cache the HBM-resident template bank for one
        object from a single (H, W, 3) [-1, 1] reference image."""
        self.register_objects(
            [object_id],
            np.asarray(reference_image)[None],
            None if reference_pose is None else np.asarray(reference_pose)[None],
        )

    def register_objects(
        self,
        object_ids,
        reference_images: np.ndarray,
        reference_poses: Optional[np.ndarray] = None,
    ) -> None:
        """Batch registration: one bank-generation program over a whole
        object gallery (M, H, W, 3) — M× fewer dispatches than looping
        :meth:`register_object`, and the U-Net sweep batches M·N
        forwards onto the MXU at once."""
        m = len(object_ids)
        reference_images = np.asarray(reference_images)
        if len(reference_images) != m:
            raise ValueError(
                f"{m} object ids but {len(reference_images)} reference images"
            )
        if reference_poses is None:
            reference_poses = np.broadcast_to(self.template_poses[0], (m, 3, 3))
        reference_poses = np.asarray(reference_poses, np.float32)
        if len(reference_poses) != m:
            raise ValueError(
                f"{m} object ids but {len(reference_poses)} reference poses"
            )
        # One batched (M, N, 3, 3) program instead of M per-object host
        # dispatches — the ~25 ms/dispatch tunnel latency on this host
        # otherwise dominates gallery registration.
        rel = relative_rotation_jax(
            jnp.asarray(self.template_poses)[None],  # (1, N, 3, 3)
            jnp.asarray(reference_poses)[:, None],  # (M, 1, 3, 3)
        )
        rel_rep = self._pose_representation(rel)  # (M, N, dim) f32
        bank_R = rel_rep.astype(jnp.bfloat16) if self._half else rel_rep
        refs = self._device_images(reference_images)
        self._pin_latent_hwc(reference_images.shape[1:3])
        banks, ref_lats = self._register_fn(self.params, refs, bank_R)
        # one program returning M per-object slices — a host-side slicing
        # loop would issue M extra ~25 ms dispatches on high-latency links
        parts = self._split_fn(banks) if m > 1 else (banks,)
        lat_parts = self._split_fn(ref_lats) if m > 1 else (ref_lats,)
        # f32 conditioning reps, kept for refinement inits: ONE fetch,
        # stored host-side per object (flat (N·dim,))
        reps_host = np.asarray(rel_rep, np.float32).reshape(m, -1)
        for i, object_id in enumerate(object_ids):
            self._banks[object_id] = parts[i]
            self._ref_poses[object_id] = reference_poses[i]
            self._ref_latents[object_id] = lat_parts[i]
            self._bank_reps[object_id] = reps_host[i]
        self._stacked_cache = (None, None)
        self._stacked_refine_cache = (None, None)

    def deregister_object(self, object_id: str) -> None:
        self._banks.pop(object_id, None)
        self._ref_poses.pop(object_id, None)
        self._ref_latents.pop(object_id, None)
        self._bank_reps.pop(object_id, None)
        self._stacked_cache = (None, None)
        self._stacked_refine_cache = (None, None)

    # -- persistence --------------------------------------------------------

    def save_registry(self, path: str) -> None:
        """Persist every registered object's precomputed bank + reference
        pose as one ``.npz`` — serving processes restart without paying
        the N-forward registration sweep again (the template-set/grid
        must match at load)."""
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        payload = {
            "__template_poses__": self.template_poses,
            "__bank_dtype__": np.asarray(self.bank_dtype),
        }
        # disk format stays the DENSE logical layout (the flat in-memory
        # layout is a TPU lane-padding concern, not a file format)
        h, w, c = self._latent_hwc if self._banks else (0, 0, 0)
        rep_dim = getattr(self.task.unet, "rot_representation_dim", 6)
        for oid, bank in self._banks.items():
            if self.bank_dtype == "int8":
                q8, scale = bank
                payload[f"bank_q8:{oid}"] = np.asarray(q8).reshape(
                    1, -1, h, w, c)  # int8 verbatim
                payload[f"scale:{oid}"] = np.asarray(
                    scale, np.float32).reshape(1, -1, 1, 1, c)
            else:
                # persist f32 regardless of serving dtype (npz + bf16
                # custom dtypes don't round-trip portably); cast at load
                payload[f"bank:{oid}"] = np.asarray(
                    bank, np.float32).reshape(1, -1, h, w, c)
            payload[f"pose:{oid}"] = self._ref_poses[oid]
            if self._ref_latents.get(oid) is not None:
                payload[f"reflat:{oid}"] = np.asarray(
                    self._ref_latents[oid], np.float32).reshape(1, h, w, c)
                payload[f"bankrep:{oid}"] = np.asarray(
                    self._bank_reps[oid], np.float32).reshape(-1, rep_dim)
        np.savez_compressed(path, **payload)

    def load_registry(self, path: str) -> None:
        """Restore banks written by :meth:`save_registry` (additive:
        existing registrations are kept unless overwritten)."""
        self._stacked_cache = (None, None)
        self._stacked_refine_cache = (None, None)
        with np.load(path) as data:
            saved_grid = data["__template_poses__"]
            if saved_grid.shape != self.template_poses.shape or not np.allclose(
                saved_grid, self.template_poses
            ):
                raise ValueError(
                    "saved registry was built on a different template grid "
                    f"({saved_grid.shape} vs {self.template_poses.shape}); "
                    "construct the estimator with the same level/distribution"
                )
            files = set(data.files)
            saved_dtype = str(data["__bank_dtype__"]) if "__bank_dtype__" in files else "auto"
            if saved_dtype != self.bank_dtype:
                raise ValueError(
                    f"saved registry layout (bank_dtype={saved_dtype!r}) does "
                    f"not match this estimator ({self.bank_dtype!r})"
                )
            def _pin_hwc_from_dense(dense_shape):
                hwc = tuple(int(d) for d in dense_shape[-3:])
                if self._latent_hwc is None:
                    self._latent_hwc = hwc
                elif self._latent_hwc != hwc:
                    raise ValueError(
                        "registry latent geometry does not match this "
                        f"estimator: {hwc} vs {self._latent_hwc}"
                    )

            def _load_refinement_state(oid):
                # registries from before the refinement feature carry no
                # latents: such objects load fine but refuse refine_steps
                if f"reflat:{oid}" in files:
                    dense = data[f"reflat:{oid}"]
                    self._ref_latents[oid] = jnp.asarray(
                        dense.reshape(1, -1), self._image_dtype
                    )
                    self._bank_reps[oid] = np.asarray(
                        data[f"bankrep:{oid}"], np.float32
                    ).reshape(-1)
                else:
                    self._ref_latents[oid] = None
                    self._bank_reps[oid] = None

            for key in data.files:
                if key.startswith("bank:"):
                    oid = key[len("bank:"):]
                    dense = data[key]  # (1, N, h, w, C) on disk
                    _pin_hwc_from_dense(dense.shape)
                    self._banks[oid] = jnp.asarray(
                        dense.reshape(1, dense.shape[1], -1), self._image_dtype
                    )
                    self._ref_poses[oid] = data[f"pose:{oid}"]
                    _load_refinement_state(oid)
                elif key.startswith("bank_q8:"):
                    oid = key[len("bank_q8:"):]
                    dense = data[key]
                    _pin_hwc_from_dense(dense.shape)
                    self._banks[oid] = (
                        jnp.asarray(dense.reshape(1, dense.shape[1], -1)),
                        jnp.asarray(
                            data[f"scale:{oid}"].reshape(1, -1), np.float32
                        ),
                    )
                    self._ref_poses[oid] = data[f"pose:{oid}"]
                    _load_refinement_state(oid)

    def estimate(
        self,
        object_id: str,
        query_images: np.ndarray,
        refine_steps: int = 0,
        refine_lr: float = 2e-2,
        refine_objective: str = "l2",
        refine_topk: int = 1,
    ) -> PoseEstimate:
        """Score (B, H, W, 3) query images against the object's bank.

        ``refine_steps`` > 0 additionally runs gradient pose refinement
        (:mod:`nope_tpu.tasks.refinement`) from the retrieved top-1 —
        or, with ``refine_topk`` > 1, multi-start from the top-K
        retrieved poses keeping the per-query winner by final latent
        objective (a K×-wider batch in the same program; hedges the
        checkpoint-dependent init policy, docs/PERFORMANCE.md round-4) —
        encode, retrieval, and the refinement loop fuse into ONE device
        program, and the result is a CONTINUOUS ΔR instead of a
        grid-snapped one (``refined_relative_rotation`` /
        ``refined_rotation`` on the returned estimate)."""
        if object_id not in self._banks:
            raise KeyError(f"object {object_id!r} is not registered")
        bank = self._banks[object_id]
        queries = self._device_images(query_images)
        if queries.ndim == 3:
            queries = queries[None]
        ref_pose = np.broadcast_to(
            self._ref_poses[object_id], (queries.shape[0], 3, 3)
        )
        if not refine_steps:
            sim, idx = self._score_fn(self.params, queries, bank)
            return self._assemble(sim, idx, ref_pose)
        if self._ref_latents.get(object_id) is None:
            raise ValueError(
                f"object {object_id!r} was loaded from a registry without "
                "reference latents; re-register it to enable refinement"
            )
        self._check_topk(refine_topk)
        key = (int(refine_steps), float(refine_lr), refine_objective,
               int(refine_topk))
        fn = self._refine_cache.get(key)
        if fn is None:
            fn = self._refine_cache[key] = self._build_refine_program(*key)
        sim, idx, rel_hat = fn(
            self.params, queries, bank,
            self._ref_latents[object_id], self._bank_reps[object_id],
        )
        rel_hat = np.asarray(rel_hat, np.float32)
        return self._assemble(
            sim, idx, ref_pose,
            refined_rel=rel_hat,
            refined_abs=rel_hat @ ref_pose,
        )

    def estimate_many(
        self,
        object_ids: Sequence[str],
        query_images: np.ndarray,
        refine_steps: int = 0,
        refine_lr: float = 2e-2,
        refine_objective: str = "l2",
        refine_topk: int = 1,
    ) -> PoseEstimate:
        """Mixed-object batched estimation: query i is scored against the
        bank of ``object_ids[i]``, all in ONE device program — a
        deployment batch spanning the whole registered gallery costs one
        dispatch instead of one per object id (per-dispatch latency is
        ~25 ms on high-latency links).  The per-query bank gather over
        the unique-object stack happens on device.

        ``refine_steps`` > 0 composes gradient pose refinement into the
        same program, exactly as in :meth:`estimate` — each query is
        refined against its OWN object's reference latent."""
        queries = self._device_images(query_images)
        if queries.ndim == 3:
            queries = queries[None]
        if len(object_ids) != queries.shape[0]:
            raise ValueError(
                f"{len(object_ids)} object ids for {queries.shape[0]} queries"
            )
        missing = [oid for oid in object_ids if oid not in self._banks]
        if missing:
            raise KeyError(f"objects not registered: {missing!r}")
        uniq = list(dict.fromkeys(object_ids))  # order-preserving
        pos = {oid: i for i, oid in enumerate(uniq)}  # O(B+M), not O(B*M)
        inv = jnp.asarray([pos[oid] for oid in object_ids], jnp.int32)
        # a steady serving loop re-batches against the same gallery: keep
        # the last stacked bank so repeat calls skip the O(M·bank) device
        # concat (cache invalidated on any register/deregister/load)
        key = tuple(uniq)
        if self._stacked_cache[0] == key:
            stacked = self._stacked_cache[1]
        else:
            stacked = self._concat_fn([self._banks[oid] for oid in uniq])
            self._stacked_cache = (key, stacked)
        ref_poses = np.stack([self._ref_poses[oid] for oid in object_ids])
        if not refine_steps:
            sim, idx = self._score_many_fn(self.params, queries, stacked, inv)
            return self._assemble(sim, idx, ref_poses)
        bare = [o for o in uniq if self._ref_latents.get(o) is None]
        if bare:
            raise ValueError(
                f"objects {bare!r} were loaded from a registry without "
                "reference latents; re-register them to enable refinement"
            )
        # stacked refinement state rides its own cache (same key rules)
        if self._stacked_refine_cache[0] == key:
            ref_lats, reps = self._stacked_refine_cache[1]
        else:
            ref_lats = self._concat_fn(
                [self._ref_latents[oid] for oid in uniq]
            )  # (M, h, w, C)
            reps = jnp.stack([self._bank_reps[oid] for oid in uniq])
            self._stacked_refine_cache = (key, (ref_lats, reps))
        self._check_topk(refine_topk)
        prog_key = ("many", int(refine_steps), float(refine_lr),
                    refine_objective, int(refine_topk))
        fn = self._refine_cache.get(prog_key)
        if fn is None:
            fn = self._refine_cache[prog_key] = self._build_refine_many_program(
                int(refine_steps), float(refine_lr), refine_objective,
                int(refine_topk),
            )
        sim, idx, rel_hat = fn(self.params, queries, stacked, inv, ref_lats, reps)
        rel_hat = np.asarray(rel_hat, np.float32)
        return self._assemble(
            sim, idx, ref_poses,
            refined_rel=rel_hat,
            refined_abs=rel_hat @ ref_poses,
        )

    def _assemble(
        self, sim, idx, ref_poses: np.ndarray,
        refined_rel: Optional[np.ndarray] = None,
        refined_abs: Optional[np.ndarray] = None,
    ) -> PoseEstimate:
        idx_np = np.asarray(idx)
        retrieved = self.template_poses[idx_np]  # (B, k, 3, 3)
        # per-query reference poses: ΔR_i = T_i · R_ref,iᵀ
        rel = retrieved @ np.swapaxes(ref_poses, -1, -2)[:, None]
        return PoseEstimate(
            nearest_idx=idx_np,
            relative_rotations=rel,
            rotations=retrieved,
            similarity=np.asarray(sim, np.float32),
            template_poses=self.template_poses,
            refined_relative_rotation=refined_rel,
            refined_rotation=refined_abs,
        )
