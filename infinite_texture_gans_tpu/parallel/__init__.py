from infinite_texture_gans_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
