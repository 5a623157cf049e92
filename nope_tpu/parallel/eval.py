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

from nope_tpu.parallel.mesh import DATA_AXIS, TEMPLATE_AXIS


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
