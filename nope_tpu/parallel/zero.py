"""ZeRO-1 sharded optimizer state over the data axis.

The reference's only distribution strategy is Lightning DDP
(``configs/machine/trainer/local.yaml:12``, SURVEY §2.8): params,
gradients AND optimizer moments fully replicated on every GPU.  For
AdamW the moments are 2x the param bytes, so replication caps the
trainable model size at roughly a third of what the HBM could hold.

The TPU-native extension: keep params replicated (pure data
parallelism for the forward/backward, XLA's psum for the gradient
all-reduce) but shard the AdamW ``mu``/``nu`` pytrees over the DATA
mesh axis.  Under GSPMD this is nothing more than a sharding
annotation on the optimizer-state leaves: XLA partitions the
elementwise moment update, computes each param-update shard locally,
and inserts the one ``all_gather`` needed to apply updates to the
replicated params — the exact collective schedule of ZeRO stage 1
(Rajbhandari et al., 2019), derived by the compiler instead of
hand-written bucketing code.

Memory per chip: moments shrink by the data-axis size; params and
gradients are unchanged.  Numerics are IDENTICAL to the replicated
layout (the update math never changes, only its partitioning) —
asserted leaf-for-leaf in ``tests/test_zero.py``.

Usage::

    shardings = zero1_state_shardings(state, mesh)
    state = jax.device_put(state, shardings)
    step = make_train_step(task, tx, state_shardings=shardings)
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nope_tpu.parallel.mesh import DATA_AXIS

# leaves smaller than this stay replicated: sharding a tiny bias/scale
# vector buys nothing and forces XLA to pad lane-misaligned shards
MIN_SHARD_SIZE = 16_384


def _leaf_sharding(
    leaf: Any, mesh: Mesh, n_shards: int, min_size: int = MIN_SHARD_SIZE
) -> NamedSharding:
    replicated = NamedSharding(mesh, P())
    shape = getattr(leaf, "shape", ())
    size = getattr(leaf, "size", 0)
    if len(shape) == 0 or size < min_size:
        return replicated
    # shard the largest axis divisible by the data-axis size; largest
    # first keeps shards balanced when several axes qualify (conv
    # kernels are (kh, kw, cin, cout) — cout is usually the winner)
    for axis in sorted(range(len(shape)), key=lambda a: -shape[a]):
        if shape[axis] % n_shards == 0:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return replicated


def zero1_state_shardings(
    state: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE
) -> Any:
    """A ``TrainState``-shaped pytree of :class:`NamedSharding`:
    optimizer-state leaves shard over the data axis (ZeRO-1), params /
    step stay replicated.  Pass to ``jax.device_put(state, ...)`` and to
    ``make_train_step(..., state_shardings=...)`` so the jitted step
    pins the layout on its output (donation then keeps it for free)."""
    n_shards = mesh.shape[DATA_AXIS]
    replicated = NamedSharding(mesh, P())

    def opt_leaf(x):
        return _leaf_sharding(x, mesh, n_shards, min_size)

    return state._replace(
        step=replicated,
        unet_params=jax.tree.map(lambda _: replicated, state.unet_params),
        vae_params=jax.tree.map(lambda _: replicated, state.vae_params),
        opt_state=jax.tree.map(opt_leaf, state.opt_state),
    )


def sharded_param_bytes(
    state: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE
) -> dict:
    """Per-chip byte accounting {replicated, zero1}: what the moments
    cost before/after sharding — the number the strategy exists for."""
    n_shards = mesh.shape[DATA_AXIS]
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(state.opt_state):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        s = _leaf_sharding(leaf, mesh, n_shards, min_size)
        sharded += nbytes // n_shards if s.spec != P() else nbytes
    return {"opt_state_replicated": total, "opt_state_zero1": sharded}
