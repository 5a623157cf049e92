"""Continuous pose refinement by gradient descent through the U-Net.

The reference pipeline STOPS at template retrieval: its finest possible
answer is the nearest of N grid rotations (``model.py:254-266``), so
accuracy is floored by the grid itself (~4.3° median for the level-2
"upper" 341-template protocol, ~2.1° at level 3).  Nothing in the
reference can do better — its per-template loop never exposes
d(similarity)/d(pose).

The rebuild's pipeline is one differentiable JAX program, which unlocks
a capability with no reference counterpart: treat the retrieved pose as
an INITIALISATION and refine it continuously.  The 6-d rotation
representation (Zhou et al., the U-Net's native conditioning) is a free
variable; Adam minimises the latent distance between the U-Net's
predicted embedding at that pose and the query embedding; the
Gram-Schmidt inside ``rotation_6d_to_matrix`` maps every iterate back
to a valid rotation, so the optimisation lives on an unconstrained
parameterisation of SO(3) with no projection step.  Each refinement
step costs one U-Net forward+backward on the (B,) batch — the whole
loop is a single jitted ``lax.fori_loop`` program (one device dispatch,
which on high-latency links matters as much as the FLOPs).

Validated end-to-end in ``tests/test_refinement.py`` (a trained tiny
model: refinement cuts the retrieved top-1 geodesic error and beats the
template-grid floor) and on v5e hardware (docs/PERFORMANCE.md "Round-3
continuous refinement").

The default ``steps=24, lr=2e-2`` come from the round-4 hardware sweeps
on the flagship 128- and 256-object checkpoints
(``scripts/tune_refinement.py``, docs/PERFORMANCE.md "Round-4
refinement at flagship scale"): from a coarse 26-template init the
error-vs-step trajectory bottoms out around step 8-24 at lr 2e-2 and
regresses past ~30 steps; smaller lrs are strictly slower.  WHERE
refinement pays is checkpoint-dependent: on a model whose dense-sweep
ranking is unreliable for new objects (the overfit 128-object
checkpoint), 26-sweep + refine beats the full 341-sweep at 2.2× lower
cost; on a better-generalized model (the 256-object checkpoint) the
341-ranking is already good and refinement from ITS top-1 takes
held-out objects 21.7° → 18.5° (3 steps at lr 2e-2) — in both regimes
composing refinement onto the retrieval gave the best held-out-object
result measured.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from nope_tpu.geometry.rotations import matrix_to_rotation_6d, rotation_6d_to_matrix


def _per_sample_objective(name: str) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """(B, h, w, C) pred vs target → (B,) distances (lower = better).

    "l2" (default) is the refinement objective: smooth everywhere, well
    conditioned.  "l1" matches the training loss.  "quirk" is the
    reference's retrieval metric −Σ_hw √Σ_c (q−t)⁴ negated into a
    distance; its √ has an unbounded gradient at exact equality, so it
    is exposed for experimentation, not as the default.
    """
    axes = (1, 2, 3)
    if name == "l2":
        return lambda p, t: jnp.mean(jnp.square(p - t), axis=axes)
    if name == "l1":
        return lambda p, t: jnp.mean(jnp.abs(p - t), axis=axes)
    if name == "quirk":
        def quirk(p, t):
            per_channel = jnp.sum(jnp.square(jnp.square(p - t)), axis=3)
            return jnp.sum(jnp.sqrt(per_channel + 1e-12), axis=(1, 2))

        return quirk
    raise ValueError(f"unknown refinement objective {name!r}")


def make_pose_refiner(
    task,
    steps: int = 24,
    lr: float = 2e-2,
    objective: str = "l2",
):
    """Build ``refine(params, query_latent, reference_latent, init_R)``.

    ``init_R``: (B, 3, 3) initial rotations (typically the retrieved
    top-1 grid poses).  Returns ``(refined_R, distance)``: (B, 3, 3)
    rotations and the (B,) final latent distances.  The returned
    function is pure and jittable; ``steps``/``lr`` are baked in (one
    compiled program per configuration).

    Refinement runs in the dtype of ``reference_latent`` for the U-Net
    forwards, but the pose variable, the Adam state, and the objective
    accumulate in float32 — bf16 latents keep the MXU speed while the
    ~1e-3-scale pose updates stay representable.
    """
    if getattr(task.unet, "rot_representation_dim", 6) != 6:
        raise ValueError(
            "pose refinement optimises the 6d rotation representation; "
            f"this U-Net conditions on dim "
            f"{task.unet.rot_representation_dim}"
        )
    import optax

    dist_fn = _per_sample_objective(objective)
    opt = optax.adam(lr)

    def refine(
        params, query_latent: jax.Array, reference_latent: jax.Array,
        init_R: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        target = query_latent.astype(jnp.float32)
        in_dtype = reference_latent.dtype

        def total_loss(r6):
            pred = task.predict_latent(
                params, reference_latent, r6.astype(in_dtype)
            )
            d = dist_fn(pred.astype(jnp.float32), target)
            # sum over the batch: each sample's pose only influences its
            # own prediction, so per-sample gradients stay independent
            return jnp.sum(d), d

        grad_fn = jax.grad(total_loss, has_aux=True)
        r6_0 = matrix_to_rotation_6d(init_R).astype(jnp.float32)

        def body(_, carry):
            r6, opt_state = carry
            grads, _ = grad_fn(r6)
            updates, opt_state = opt.update(grads, opt_state, r6)
            return optax.apply_updates(r6, updates), opt_state

        r6, _ = jax.lax.fori_loop(0, steps, body, (r6_0, opt.init(r6_0)))
        _, final_d = total_loss(r6)
        _, init_d = total_loss(r6_0)
        # keep the refined pose only where refinement actually reduced
        # the objective (a diverged sample falls back to its init)
        keep = (final_d <= init_d)[:, None]
        r6 = jnp.where(keep, r6, r6_0)
        return (
            rotation_6d_to_matrix(r6),
            jnp.where(keep[:, 0], final_d, init_d),
        )

    return refine


def make_multistart_refiner(
    task,
    steps: int = 24,
    lr: float = 2e-2,
    objective: str = "l2",
):
    """Build ``refine_multi(params, query_latent, reference_latent,
    init_Rs)``: refine from K inits per query in ONE batched program and
    keep, per query, the pose with the lowest final latent objective.

    ``init_Rs``: (B, K, 3, 3) — typically the retrieved top-K grid
    poses.  Returns ``(refined_R, distance, selected)``: (B, 3, 3)
    rotations, the (B,) winning latent distances, and the (B,) index of
    the winning start.

    Why: single-init refinement is policy-dependent — round-4 hardware
    sweeps (docs/PERFORMANCE.md) showed WHICH init wins (fast-26 top-1
    vs full-341 top-1) flips with the checkpoint's ranking quality.
    Multi-start from the top-K hedges that choice inside one compiled
    program: the K starts ride the batch axis, so the cost is one
    K×-wider refinement instead of K dispatches.  The reference computes
    ``topk(k=5)`` (``src/model/model.py:254-266``) but only uses it for
    metrics; here the top-K becomes the hedge.
    """
    refiner = make_pose_refiner(task, steps=steps, lr=lr, objective=objective)

    def refine_multi(
        params, query_latent: jax.Array, reference_latent: jax.Array,
        init_Rs: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, K = init_Rs.shape[0], init_Rs.shape[1]
        # repeat([q0, q1], K) = [q0·K, q1·K] matches reshape(B·K) of the
        # (B, K, ...) init block, so start (b, k) refines query b
        rep = lambda x: jnp.repeat(x, K, axis=0)
        refined, d = refiner(
            params, rep(query_latent), rep(reference_latent),
            init_Rs.reshape(B * K, 3, 3),
        )
        d = d.reshape(B, K)
        sel = jnp.argmin(d, axis=1)
        b = jnp.arange(B)
        return refined.reshape(B, K, 3, 3)[b, sel], d[b, sel], sel

    return refine_multi


def refine_pose(
    task,
    params,
    query: jax.Array,
    reference: jax.Array,
    init_R: jax.Array,
    steps: int = 24,
    lr: float = 2e-2,
    objective: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """One-call convenience: encode both images, then refine.

    For repeated use (serving, eval loops) build the refiner once with
    :func:`make_pose_refiner` and reuse latents across calls.
    """
    refiner = make_pose_refiner(task, steps=steps, lr=lr, objective=objective)
    q_lat = task.encode(params, query, "mode")
    r_lat = task.encode(params, reference, "mode")
    return refiner(params, q_lat, r_lat, init_R)
