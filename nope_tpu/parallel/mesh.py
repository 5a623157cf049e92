"""Device mesh construction and sharding specs.

The reference's only parallelism is Lightning DDP over NCCL
(``configs/machine/trainer/local.yaml:12``, SURVEY §2.8).  The TPU-native
replacement is a 2-axis ``jax.sharding.Mesh``:

- ``data``     — batch-parallel training (the DDP analogue).  Gradient
  reduction becomes a compiler-scheduled ``psum`` inside the jitted
  train step; no NCCL, no Lightning.
- ``template`` — the eval-time analogue of sequence parallelism: the
  SO(3) template bank (N = 26..2562 viewpoints) is embarrassingly
  parallel, so the batched U-Net sweep and the HBM-resident bank are
  sharded over this axis (SURVEY §5 "long-context" discussion).

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); mesh axes then span all processes with
ICI inside a slice and DCN across hosts.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TEMPLATE_AXIS = "template"


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group init (replaces the SLURM/NCCL wiring at
    ``train.py:39-41``).  Safe to call unconditionally: jax auto-detects
    cluster environments (SLURM, GKE, Cloud TPU); on a plain single
    process this is a no-op."""
    import os

    cluster_hints = ("COORDINATOR_ADDRESS", "SLURM_JOB_ID", "JAX_COORDINATOR_ADDRESS")
    if not kwargs and not any(h in os.environ for h in cluster_hints):
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:  # already initialised
        pass


_BARRIER_COUNTS: dict = {}


def process_barrier(tag: str = "nope", timeout_ms: int = 600_000) -> None:
    """Align all processes at a named coordination-service barrier.

    The first cross-process collective in a program triggers the CPU
    backend's Gloo context rendezvous, whose connect timeout (~30 s) is
    much shorter than realistic compile-time skew between ranks (on a
    loaded host one rank can hit a warm persistent-compile cache while
    another compiles cold for minutes).  A coordination-service barrier
    — which rides the already-established distributed client, no Gloo —
    re-aligns the ranks immediately before the collective so the
    rendezvous starts simultaneously everywhere.  No-op single-process
    and on backends without a distributed client (TPU runtimes hold
    their own longer timeouts).
    """
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:  # pragma: no cover - private API drift
        if not _BARRIER_COUNTS.get("__warned__"):
            _BARRIER_COUNTS["__warned__"] = True
            logging.warning(
                "process_barrier disabled: jax._src.distributed is not "
                "importable (private-API drift?) — multi-process runs with "
                "compile-time skew may hit Gloo's ~30 s rendezvous timeout"
            )
        return
    if client is None:
        return
    # same call sequence on every process → same generated barrier ids
    _BARRIER_COUNTS[tag] = _BARRIER_COUNTS.get(tag, 0) + 1
    client.wait_at_barrier(f"{tag}:{_BARRIER_COUNTS[tag]}", timeout_ms)


def create_mesh(
    data: Optional[int] = None,
    template: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, template) mesh.  By default all devices go to the
    data axis; pass ``template=k`` to carve out template parallelism for
    eval-heavy workloads."""
    devices = list(devices if devices is not None else jax.devices())
    if template < 1:
        raise ValueError(f"template axis must be >= 1, got {template}")
    if data is None:
        data = len(devices) // template
    if data < 1:
        raise ValueError(f"data axis must be >= 1, got {data}")
    if data * template > len(devices):
        raise ValueError(f"mesh {data}x{template} > {len(devices)} devices")
    dev_array = np.asarray(devices[: data * template]).reshape(data, template)
    return Mesh(dev_array, (DATA_AXIS, TEMPLATE_AXIS))


def shard_eval_batch(batch, mesh: Mesh, template_keys=("all_relativeR",)):
    """Place an eval batch on a (data, template) mesh: bank-like keys
    shard (data, template), other arrays shard the batch axis, scalars
    replicate.  Validates divisibility up front with actionable errors
    (XLA's own message is cryptic and only fires after compile)."""
    n_data = mesh.shape[DATA_AXIS]
    n_template = mesh.shape[TEMPLATE_AXIS]

    def put(k, v):
        v = np.asarray(v)
        if k in template_keys:
            if v.shape[1] % n_template:
                raise ValueError(
                    f"{k} template count {v.shape[1]} is not divisible by the "
                    f"template mesh axis ({n_template}); pick --mesh-template "
                    f"dividing the grid size"
                )
            spec = P(DATA_AXIS, TEMPLATE_AXIS)
        elif v.ndim >= 1:
            spec = P(DATA_AXIS)
        else:
            spec = P()
        if v.ndim >= 1 and v.shape[0] % n_data:
            raise ValueError(
                f"batch size {v.shape[0]} (key {k!r}) is not divisible by the "
                f"data mesh axis ({n_data}); adjust machine.batch_size"
            )
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in batch.items()}


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def template_sharding(mesh: Mesh, axis: int = 1, ndim: int = 2) -> NamedSharding:
    """Shard a bank-like array's template axis (default axis 1 of
    (B, N, ...))."""
    spec = [None] * ndim
    spec[axis] = TEMPLATE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of host arrays with the leading axis sharded over
    the data axis (and everything else replicated)."""
    def _put(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(_put, batch)
