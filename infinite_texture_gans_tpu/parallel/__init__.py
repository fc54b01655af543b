from infinite_texture_gans_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
from infinite_texture_gans_tpu.parallel.sharded import (
    generate_one_pass_sharded,
    shard_images,
)
from infinite_texture_gans_tpu.parallel.wavefront import generate_canvas_wavefront

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "generate_one_pass_sharded",
    "shard_images",
    "generate_canvas_wavefront",
]
