"""Template-parallel sharded inference programs.

The eval-time analogue of sequence parallelism here is the SO(3)
template axis (SURVEY §5): N U-Net forwards per query are independent,
so the bank's pose axis is sharded over the ``template`` mesh axis and
the bank itself stays distributed in HBM; only the tiny (B, N)
similarity row participates in cross-device reduction (implicit in the
top-k gather).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nope_tpu.parallel.mesh import DATA_AXIS, TEMPLATE_AXIS, process_barrier


def make_sharded_streaming_eval_fn(
    task, mesh: Mesh, chunk_size: Optional[int] = None
) -> Callable:
    """Template-parallel *streaming* retrieval: every device owns an N/T
    slice of the pose grid and scans it in ``chunk_size`` chunks,
    scoring each chunk against the query as it is generated — the bank
    never materialises anywhere (per-device peak is one (B·chunk) latent
    slice), so the full 2562-viewpoint grid runs at serving batch sizes
    on every chip of the mesh.

    The sweep is expressed with ``shard_map`` so each template-axis
    device streams its local chunk sequence independently; the only
    cross-device traffic is the all-gather of the tiny (B, N/T)
    similarity rows over ICI at the end (the U-Net FLOPs, ~6 orders of
    magnitude larger, need no communication at all).

    Returns a runner (params, reference, query, bank_R) → (similarity
    (B, N), top-k idx), numerically identical to the single-device path.
    """
    import jax.numpy as jnp

    try:
        from jax import shard_map  # jax >= 0.7
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_template = mesh.shape[TEMPLATE_AXIS]
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    bank_sharding = NamedSharding(mesh, P(DATA_AXIS, TEMPLATE_AXIS))
    replicated = NamedSharding(mesh, P())

    def local_sweep(params, ref_latent, q_latent, bank_R_local):
        # shapes here are PER-DEVICE: (B/D, ...) latents, (B/D, N/T, d)
        # chunk_size is a VMEM/HBM budget hint, not a contract: the
        # per-device template count N/T depends on the mesh, so a
        # non-dividing request is rounded DOWN to the nearest divisor
        # (unlike the single-device retrieve_streaming, where the caller
        # controls N exactly and a mismatch raises)
        n_local = bank_R_local.shape[1]
        cs = min(chunk_size or n_local, n_local)
        while n_local % cs:
            cs -= 1
        sim_local = task.stream_similarity(
            params, q_latent, ref_latent, bank_R_local, cs
        )
        # (B/D, N): gather the template-axis slices; rows re-interleave
        # by shard order, matching the bank_R layout jax.device_put used
        return jax.lax.all_gather(sim_local, TEMPLATE_AXIS, axis=1, tiled=True)

    def eval_fn(params, reference, query, bank_R):
        ref_latent = task.encode(params, reference, "mode")
        q_latent = task.encode(params, query, "mode")
        sim = shard_map(
            local_sweep,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, TEMPLATE_AXIS)),
            out_specs=P(DATA_AXIS),
            # the all_gather DOES replicate the output over the template
            # axis, but the static VMA check can't see through the
            # scan-of-chunks body; runtime identity is pinned by test
            check_vma=False,
        )(params, ref_latent, q_latent, bank_R)
        _, idx = jax.lax.top_k(sim, task.config.retrieval_k)
        return sim, idx

    jitted = jax.jit(
        eval_fn,
        in_shardings=(replicated, batch_sharding, batch_sharding, bank_sharding),
        out_shardings=(replicated, replicated),
    )

    # (shape/dtype signature → compiled executable): lower().compile()
    # does NOT populate jit's dispatch cache, so keep each executable —
    # otherwise every later call recompiles the identical program (and
    # without the barrier protection below)
    compiled_cache: dict = {}
    first_put = [True]

    def run(params, reference, query, bank_R):
        bank_R = jnp.asarray(bank_R)
        if bank_R.shape[1] % n_template:
            raise ValueError(
                f"template count {bank_R.shape[1]} is not divisible by the "
                f"template mesh axis ({n_template}); pick a mesh whose "
                "template axis divides the grid size"
            )
        if first_put[0]:
            # replicated device_put runs a cross-process assert_equal
            # all-gather — the process's first Gloo collective; align
            # ranks past any model-init compile skew before it (Gloo's
            # connect timeout is only ~30 s)
            process_barrier("streaming_eval_put")
            first_put[0] = False
        params = jax.device_put(params, replicated)
        reference = jax.device_put(jnp.asarray(reference), batch_sharding)
        query = jax.device_put(jnp.asarray(query), batch_sharding)
        bank_R = jax.device_put(bank_R, bank_sharding)
        sig = tuple(
            (x.shape, str(x.dtype))
            for x in jax.tree.leaves((params, reference, query, bank_R))
        )
        compiled = compiled_cache.get(sig)
        if compiled is None:
            # compile first (warm-vs-cold persistent-cache skew between
            # ranks dwarfs 30 s), then re-align, then run — the Gloo
            # rendezvous starts simultaneously everywhere.
            compiled = jitted.lower(params, reference, query, bank_R).compile()
            process_barrier("streaming_eval")
            compiled_cache[sig] = compiled
        return compiled(params, reference, query, bank_R)

    return run


def make_sharded_eval_fn(
    task, mesh: Mesh, chunk_size: Optional[int] = None
) -> Callable:
    """Build a jitted (params, reference, query, bank_R) → (similarity,
    nearest_idx) program with the batch over the data axis and the
    template bank over the template axis."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    bank_sharding = NamedSharding(mesh, P(DATA_AXIS, TEMPLATE_AXIS))
    replicated = NamedSharding(mesh, P())

    def eval_fn(params, reference, query, bank_R):
        bank = task.generate_template_bank(
            params, reference, bank_R, chunk_size=chunk_size
        )
        return task.retrieval(params, query, bank)

    jitted = jax.jit(
        eval_fn,
        in_shardings=(replicated, batch_sharding, batch_sharding, bank_sharding),
        out_shardings=(replicated, replicated),
    )

    def run(params, reference, query, bank_R):
        import jax.numpy as jnp

        params = jax.device_put(params, replicated)
        reference = jax.device_put(jnp.asarray(reference), batch_sharding)
        query = jax.device_put(jnp.asarray(query), batch_sharding)
        bank_R = jax.device_put(jnp.asarray(bank_R), bank_sharding)
        return jitted(params, reference, query, bank_R)

    return run
