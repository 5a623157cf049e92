"""Dataset readers (ShapeNet / Objaverse / BOP) and the training pipeline."""
