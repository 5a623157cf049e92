"""Loader/combiner tests + VSD metric oracle tests."""

import numpy as np
import pytest

from nope_tpu.data.pipeline import CombinedLoader, ConcatDataset, DataLoader, collate
from nope_tpu.evaluation import vsd_metrics


class ToyDataset:
    def __init__(self, n, dim=3, offset=0.0):
        self.n, self.dim, self.offset = n, dim, offset

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((self.dim,), float(i) + self.offset, np.float32)}


def test_dataloader_batching_and_shuffling():
    loader = DataLoader(ToyDataset(10), batch_size=3, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # drop_last
    assert all(b["x"].shape == (3, 3) for b in batches)
    seen = sorted(int(b["x"][i, 0]) for b in batches for i in range(3))
    assert len(set(seen)) == 9  # distinct items, one dropped
    # different epoch -> different order
    b2 = list(loader)
    assert not all(
        np.array_equal(a["x"], b["x"]) for a, b in zip(batches, b2)
    )


def test_dataloader_propagates_worker_errors():
    class Bad(ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Bad(4), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_combined_loader_max_size_cycle():
    big = DataLoader(ToyDataset(8), batch_size=2, shuffle=False)
    small = DataLoader(ToyDataset(2, offset=100.0), batch_size=2, shuffle=False)
    combined = CombinedLoader({"big": big, "small": small})
    steps = list(combined)
    assert len(steps) == 4  # max over loaders
    for step in steps:
        assert set(step) == {"big", "small"}
        assert step["small"]["x"].min() >= 100.0  # cycled, not exhausted


def test_concat_dataset():
    ds = ConcatDataset([ToyDataset(3), ToyDataset(2, offset=10.0)])
    assert len(ds) == 5
    assert float(ds[0]["x"][0]) == 0.0
    assert float(ds[3]["x"][0]) == 10.0
    assert float(ds[4]["x"][0]) == 11.0


def test_collate():
    out = collate([{"a": np.zeros(2)}, {"a": np.ones(2)}])
    assert out["a"].shape == (2, 2)


class EpochKeyedDataset(ToyDataset):
    """Items depend on (epoch, index) — models the datasets' epoch-keyed
    reference-sampling streams (shapenet.set_epoch)."""

    def __init__(self, n):
        super().__init__(n, dim=1)
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __getitem__(self, i):
        return {"x": np.asarray([1000.0 * self._epoch + i], np.float32)}


def _stream(combined, n_steps):
    out = []
    it = iter(combined)
    while len(out) < n_steps:
        try:
            out.append(next(it))
        except StopIteration:
            it = iter(combined)
    return [
        {name: b["x"][:, 0].tolist() for name, b in step.items()} for step in out
    ]


@pytest.mark.parametrize("resume_at", [1, 3, 4, 5, 7, 8, 11])
def test_combined_loader_set_state_replays_exact_stream(resume_at):
    """set_state(k) must continue the (epoch-keyed) item stream exactly
    as an uninterrupted run would — including mid-epoch offsets, wrap
    boundaries of the shorter cycled loader, and whole-epoch boundaries."""

    def build():
        return CombinedLoader({
            "big": DataLoader(EpochKeyedDataset(8), batch_size=2,
                              num_workers=1, seed=5),
            "small": DataLoader(EpochKeyedDataset(3), batch_size=2,
                                num_workers=1, seed=9),
        })

    total = 13
    full = _stream(build(), total)
    resumed = build()
    resumed.set_state(resume_at)
    cont = _stream(resumed, total - resume_at)
    assert cont == full[resume_at:]


# ---------------------------------------------------------------------------
# VSD metric oracles
# ---------------------------------------------------------------------------


def test_depth_to_dist_center_pixel():
    K = np.array([[100.0, 0, 2], [0, 100.0, 2], [0, 0, 1]])
    depth = np.zeros((5, 5))
    depth[2, 2] = 7.0  # principal point: distance == depth
    dist = vsd_metrics.depth_im_to_dist_im(depth, K)
    np.testing.assert_allclose(dist[2, 2], 7.0)
    depth[0, 0] = 10.0  # off-axis ray is longer
    dist = vsd_metrics.depth_im_to_dist_im(depth, K)
    assert dist[0, 0] > 10.0


def test_visib_masks_bop19_missing_depth_visible():
    d_test = np.zeros((4, 4))  # all missing depth
    d_model = np.ones((4, 4))
    mask = vsd_metrics.estimate_visib_mask_gt(d_test, d_model, delta=15.0)
    assert mask.all()  # bop19: visible where test depth is missing
    mask18 = vsd_metrics._estimate_visib_mask(d_test, d_model, 15.0, "bop18")
    assert not mask18.any()


def test_vsd_error_perfect_and_wrong():
    K = np.array([[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]])
    gt = np.zeros((16, 16))
    gt[4:12, 4:12] = 500.0
    test_depth = gt.copy()
    # perfect estimate -> error 0
    assert vsd_metrics.vsd_error_from_depths(test_depth, gt, gt, K) == 0.0
    # empty estimate -> all GT pixels are "complement" -> error 1
    empty = np.zeros_like(gt)
    assert vsd_metrics.vsd_error_from_depths(test_depth, gt, empty, K) == 1.0
    # both empty -> union empty -> defined as 1
    assert vsd_metrics.vsd_error_from_depths(test_depth, empty, empty, K) == 1.0
    # displaced estimate -> partial error in (0, 1)
    shifted = np.zeros_like(gt)
    shifted[8:16, 8:16] = 500.0
    err = vsd_metrics.vsd_error_from_depths(test_depth, gt, shifted, K)
    assert 0.0 < err <= 1.0


def test_vsd_scores_aggregation():
    errors = np.array(
        [
            [0.1, 0.9, 0.9, 0.9, 0.9],  # top1 hit
            [0.9, 0.2, 0.9, 0.9, 0.9],  # top3 hit
            [0.9, 0.9, 0.9, 0.9, 0.2],  # top5 hit
        ]
    )
    scores = vsd_metrics.vsd_scores(errors)
    assert scores["top 1, vsd_scores 0.3"] == pytest.approx(100 / 3)
    assert scores["top 3, vsd_scores 0.3"] == pytest.approx(200 / 3)
    assert scores["top 5, vsd_scores 0.3"] == pytest.approx(100.0)
    assert scores["top 1, vsd_median"] == pytest.approx(0.9)


def test_dataloader_early_abandonment_no_deadlock():
    """Abandoning the iterator mid-epoch (evaluate_geodesic max_batches)
    must not leave producer threads blocked on the bounded queue."""
    import threading
    import time

    loader = DataLoader(ToyDataset(64), batch_size=2, num_workers=2, prefetch=2)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        del it  # abandon with the queue full
    time.sleep(1.0)  # generous drain window
    assert threading.active_count() <= before + 1


def test_grain_loader_adapter():
    """Optional grain pipeline: batches match the dataset content."""
    pytest.importorskip("grain")
    from nope_tpu.data.grain_pipeline import make_grain_loader

    loader = make_grain_loader(
        ToyDataset(10), batch_size=2, shuffle=True, seed=3, num_epochs=1
    )
    batches = list(loader)
    assert len(batches) == 5
    seen = sorted(float(b["x"][i, 0]) for b in batches for i in range(2))
    assert seen == [float(i) for i in range(10)]


def test_grain_epoch_loader_trainer_contract():
    """GrainLoader (machine.loader=grain) honors the DataLoader duck
    type the Trainer needs: sized epochs, fresh shuffle order + dataset
    set_epoch stream per epoch, process workers, and set_state resume."""
    from nope_tpu.data.grain_pipeline import GrainLoader

    def build(num_workers=0):
        return GrainLoader(EpochKeyedDataset(10), batch_size=2,
                           num_workers=num_workers, seed=4,
                           shard_by_process=False)

    loader = build()
    assert len(loader) == 5
    e0 = [b["x"][:, 0].tolist() for b in loader]
    e1 = [b["x"][:, 0].tolist() for b in loader]
    assert len(e0) == len(e1) == 5
    # epoch 0 items carry the 0-epoch key; epoch 1 the 1000s key
    assert all(0 <= v < 10 for b in e0 for v in b)
    assert all(1000 <= v < 1010 for b in e1 for v in b)
    assert sorted(v for b in e1 for v in b) == [1000.0 + i for i in range(10)]
    assert e0 != [[v - 1000.0 for v in b] for b in e1]  # reshuffled

    # determinism: a fresh loader replays the same two epochs...
    loader2 = build()
    assert [b["x"][:, 0].tolist() for b in loader2] == e0
    # ...and worker PROCESSES yield the identical stream
    loader_mp = build(num_workers=2)
    assert [b["x"][:, 0].tolist() for b in loader_mp] == e0

    # set_state(epoch=1, offset=3): exact mid-epoch continuation
    loader3 = build()
    loader3.set_state(1, 3)
    assert [b["x"][:, 0].tolist() for b in loader3] == e1[3:]


def test_grain_loader_drop_last_false_emits_partial_tail():
    """drop_last=False must emit the final partial batch __len__ counts
    (it used to sit in the batching buffer and be silently dropped,
    desynchronizing set_state resume offsets from the emitted stream)."""
    from nope_tpu.data.grain_pipeline import GrainLoader

    def build():
        return GrainLoader(EpochKeyedDataset(10), batch_size=4, seed=4,
                           drop_last=False, shard_by_process=False)

    loader = build()
    assert len(loader) == 3
    e0 = [b["x"][:, 0].tolist() for b in loader]
    assert [len(b) for b in e0] == [4, 4, 2]
    assert sorted(v for b in e0 for v in b) == [float(i) for i in range(10)]
    # resume offset accounts for the partial batch
    resumed = build()
    resumed.set_state(0, 2)
    assert [b["x"][:, 0].tolist() for b in resumed][0] == e0[2]


def test_builder_rejects_unknown_loader(monkeypatch):
    """A typo'd machine.loader must fail fast, not silently fall back to
    the single-host thread loader (which would duplicate the dataset
    across hosts)."""
    from nope_tpu.configs import load_config
    from nope_tpu.data import builder

    monkeypatch.setattr(builder, "build_dataset", lambda cfg: ToyDataset(8))
    cfg = load_config(None, [
        "machine.loader=Grain", "machine.batch_size=2",
        "train_data_name=shapeNet", "data.datasets.shapeNet.name=shapeNet",
    ])
    with pytest.raises(ValueError, match="machine.loader"):
        builder.build_train_loaders(cfg)


def test_grain_loader_in_combined_loader_set_state():
    """The Trainer's deterministic resume works through the grain path
    (CombinedLoader.set_state -> GrainLoader.set_state)."""
    from nope_tpu.data.grain_pipeline import GrainLoader

    def build():
        return CombinedLoader({
            "g": GrainLoader(EpochKeyedDataset(8), batch_size=2, seed=2,
                             shard_by_process=False),
            "s": GrainLoader(EpochKeyedDataset(3), batch_size=2, seed=6,
                             shard_by_process=False),
        })

    full = _stream(build(), 9)
    resumed = build()
    resumed.set_state(6)
    assert _stream(resumed, 3) == full[6:]


def test_builder_grain_switch(tmp_path, monkeypatch):
    """machine.loader=grain swaps the training input stack end-to-end
    through the config/builder layer."""
    from nope_tpu.configs import load_config
    from nope_tpu.data import builder
    from nope_tpu.data.grain_pipeline import GrainLoader

    monkeypatch.setattr(builder, "build_dataset", lambda cfg: ToyDataset(8))
    cfg = load_config(None, [
        "machine.loader=grain", "machine.batch_size=2",
        "machine.num_workers=0", "train_data_name=shapeNet",
        "data.datasets.shapeNet.name=shapeNet",
    ])
    loaders = builder.build_train_loaders(cfg)
    assert isinstance(loaders["shapeNet"], GrainLoader)
    assert len(loaders["shapeNet"]) == 4
    batches = list(loaders["shapeNet"])
    assert len(batches) == 4 and batches[0]["x"].shape == (2, 3)


def test_grain_loader_yields_collated_batches():
    """The grain adapter (production multi-host input stack) must yield
    collated numpy batches covering the dataset exactly once."""
    from nope_tpu.data.grain_pipeline import make_grain_loader

    class Tiny:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full(3, float(i), np.float32),
                    "idx": np.asarray(i, np.int64)}

    loader = make_grain_loader(
        Tiny(), batch_size=4, shuffle=True, seed=0, num_epochs=1,
    )
    batches = list(loader)
    assert len(batches) == 2
    seen = sorted(int(i) for b in batches for i in np.atleast_1d(b["idx"]))
    assert seen == list(range(8))
    for b in batches:
        assert b["x"].shape == (4, 3)
        np.testing.assert_allclose(b["x"][:, 0], np.asarray(b["idx"], np.float32))
