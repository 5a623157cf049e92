"""Dataclass config tree (Hydra-free).

Mirrors the reference's config groups (``/root/reference/configs/``:
user / machine / trainer / callback / model / data) as plain python
dataclasses with YAML loading and ``a.b.c=value`` CLI overrides — and
without the reference's breakages (stale ``_target_`` paths, the
missing ``data: all`` default; SURVEY appendix items 2-3).
"""

from nope_tpu.configs.config import (  # noqa: F401
    DataConfig,
    ExperimentConfig,
    MachineConfig,
    ModelConfig,
    OptimConfig,
    TestingConfig,
    TrainerConfig,
    apply_overrides,
    load_config,
)
