"""Device-mesh parallelism utilities (GSPMD data parallel over ICI)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    default_mesh,
    replicated,
    shard_batch,
)
