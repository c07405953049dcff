from mcpt_tpu.parallel.mesh import (
    lane_sharding,
    make_mesh,
    replicate_pack,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "lane_sharding",
    "replicated_sharding",
    "replicate_pack",
]
