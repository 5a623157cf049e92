"""Device mesh + sharding helpers (data and template axes)."""

from nope_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    template_sharding,
    replicate,
    shard_batch,
)
