"""Dataset readers (ShapeNet / Objaverse / BOP) and the training pipeline."""

from nope_tpu.data.pipeline import (  # noqa: F401
    CombinedLoader,
    ConcatDataset,
    DataLoader,
)
