from mcpt_tpu.parallel.mesh import (
    RenderSharding,
    lane_sharding,
    make_mesh,
    render_sharding,
    replicate_pack,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "lane_sharding",
    "replicated_sharding",
    "replicate_pack",
    "render_sharding",
    "RenderSharding",
]
