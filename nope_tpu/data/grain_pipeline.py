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


def _wrap_source(dataset: Any):
    """Adapt a map-style dataset to ``grain.RandomAccessDataSource``
    (single definition shared by both loader builders below)."""
    import grain.python as grain

    class _Source(grain.RandomAccessDataSource):
        def __init__(self, ds):
            self._ds = ds

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, idx):
            return self._ds[int(idx)]

    return _Source(dataset)


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
        data_source=_wrap_source(dataset),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )


class GrainLoader:
    """Epoch-wise grain loader, duck-typed like
    :class:`nope_tpu.data.pipeline.DataLoader` so it drops into
    ``CombinedLoader``/``Trainer`` unchanged (``machine.loader=grain``).

    Each ``__iter__`` builds a fresh ``grain.DataLoader`` for ONE epoch:
    worker PROCESSES (``num_workers``) parallelise decode on multi-core
    hosts — the reference's ``num_workers: 10`` torch workers
    (configs/machine/local.yaml:5) done the JAX-idiomatic way — and
    ``ShardByJaxProcess`` splits the record space across hosts so every
    process consumes a disjoint shard.  The dataset's ``set_epoch``
    sampling stream and the shuffle seed advance per epoch, and the
    construction happens BEFORE workers fork so the epoch state reaches
    the worker processes.

    ``set_state`` supports the Trainer's deterministic mid-epoch resume;
    the skipped batches of the resumed epoch are consumed and discarded
    (grain's sampler owns the shard-aware index order, so a slice-level
    skip is not expressible from outside) — a one-off cost of at most
    one epoch of reads, parallelised by the same workers.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 0,
        seed: int = 0,
        shard_by_process: bool = True,
        post_batch_fn=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_by_process = shard_by_process
        self.post_batch_fn = post_batch_fn
        self._epoch = 0
        self._start_batch = 0

    def _local_records(self) -> int:
        import jax

        n = len(self.dataset)
        if self.shard_by_process and jax.process_count() > 1:
            n = n // jax.process_count()  # ShardByJaxProcess(drop_remainder)
        return n

    def __len__(self) -> int:
        n = self._local_records()
        count = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if count == 0:
            raise ValueError(
                f"{n} local records yield 0 batches at batch_size="
                f"{self.batch_size} (drop_last={self.drop_last})"
            )
        return count

    def set_state(self, epoch: int, batch_offset: int = 0) -> None:
        """Position the loader for deterministic resume (same contract
        as ``pipeline.DataLoader.set_state``)."""
        self._epoch = int(epoch)
        self._start_batch = int(batch_offset)

    def __iter__(self):
        import grain.python as grain
        import jax

        from nope_tpu.data.pipeline import collate

        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)

        if self.shard_by_process and jax.process_count() > 1:
            shard_options = grain.ShardByJaxProcess(drop_remainder=True)
        else:
            shard_options = grain.NoSharding()
        # records (not batches) come out of grain: per-record decode runs
        # in the worker processes and grain re-sequences the output into
        # sampler order, so the record stream — and hence the host-side
        # collation below — is identical for ANY worker count (grain's
        # own Batch runs inside each worker, which makes batch
        # composition a function of worker_count)
        loader = grain.DataLoader(
            data_source=_wrap_source(self.dataset),
            sampler=grain.IndexSampler(
                num_records=len(self.dataset),
                shuffle=self.shuffle,
                seed=self.seed + self._epoch,  # fresh order every epoch
                num_epochs=1,
                shard_options=shard_options,
            ),
            operations=[],
            worker_count=self.num_workers,
        )
        self._epoch += 1
        start = self._start_batch
        self._start_batch = 0
        n_batches = len(self)
        buf, emitted = [], 0
        for rec in loader:
            buf.append(rec)
            if len(buf) == self.batch_size:
                if emitted >= start:
                    batch = collate(buf)
                    yield self.post_batch_fn(batch) if self.post_batch_fn else batch
                buf.clear()
                emitted += 1
                if emitted == n_batches:
                    break
        # drop_last=False: the final partial batch (counted by __len__,
        # so resume offsets stay consistent with the emitted stream)
        if buf and not self.drop_last and emitted < n_batches and emitted >= start:
            batch = collate(buf)
            yield self.post_batch_fn(batch) if self.post_batch_fn else batch


def make_native_post_batch(img_size: int):
    """Fused native composite+warp+normalize on grain-batched raw items
    (the grain counterpart of ``pipeline.make_native_collate``): grain's
    ``Batch`` stacks the RGBA frames and homographies; one C++ call per
    image role preprocesses the whole batch."""
    from nope_tpu import native

    def post(batch):
        out = {}
        for role in ("query", "reference"):
            out[role] = native.preprocess_batch(
                np.ascontiguousarray(batch[f"{role}_rgba"]),
                np.ascontiguousarray(batch[f"{role}_M"]),
                img_size,
            )
        for k, v in batch.items():
            if not k.endswith(("_rgba", "_M")):
                out[k] = v
        return out

    return post
