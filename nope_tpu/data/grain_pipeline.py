"""Grain-based input pipeline (optional, production multi-host path).

The built-in thread-prefetched :class:`nope_tpu.data.pipeline.DataLoader`
is self-contained and fine for single-host training; this adapter wraps
the same map-style datasets in `grain <https://github.com/google/grain>`_
for process-based workers, deterministic global shuffling, and
per-process sharding on multi-host fleets — the idiomatic JAX input
stack.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def make_grain_loader(
    dataset: Any,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 0,
    num_epochs: Optional[int] = None,
    drop_remainder: bool = True,
    shard_by_process: bool = True,
):
    """Map-style dataset (len + __getitem__ → dict of numpy) → grain
    DataLoader yielding collated numpy batches.

    ``shard_by_process=True`` splits the index space across
    ``jax.process_count()`` processes (multi-host data parallelism);
    each process then feeds its local devices.
    """
    import grain.python as grain
    import jax

    class _Source(grain.RandomAccessDataSource):
        def __init__(self, ds):
            self._ds = ds

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, idx):
            return self._ds[int(idx)]

    if shard_by_process and jax.process_count() > 1:
        shard_options = grain.ShardByJaxProcess(drop_remainder=True)
    else:
        shard_options = grain.NoSharding()

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=shard_options,
    )
    return grain.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
