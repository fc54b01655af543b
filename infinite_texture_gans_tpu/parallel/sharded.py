"""Multi-device generation: the TPU-native answer to SURVEY.md §2.7's
"spatial parallelism" row.

The reference's patch-grid + halo mechanism is a *within-device* spatial
decomposition (merge->pad->crop per conv, models/layers.py:145-173). On TPU
the same decomposition scales across chips two ways:

1. :func:`shard_images` — the raster halo-scan engine is per-image
   independent state, so a batch of canvases shards trivially over the
   ``data`` mesh axis (serving throughput: N textures on N chips for the
   cost of one).

2. :func:`generate_one_pass_sharded` — for canvases that fit one generator
   pass, shard the merged grid's *width* axis across the mesh. Every conv's
   1-pixel halo then crosses device boundaries; XLA's SPMD partitioner
   inserts the collective-permute halo exchanges over ICI automatically —
   the idiomatic TPU form of ring/halo spatial parallelism (no hand-written
   NCCL/ppermute needed; the compiler schedules the overlap). Per-device
   memory is O(canvas/num_devices).

Both compose with the halo-scan engine: a huge canvas is generated as a
raster of one-pass-sized sub-canvases, each internally width-sharded.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_images(tree, mesh: Optional[Mesh]):
    """Shard a pytree of per-image arrays (leading axis = image) over the
    mesh's ``data`` axis; params stay replicated by the caller."""
    if mesh is None:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P("data")))


_SHARDED_FWD_CACHE: dict = {}
_SHARDED_FWD_CACHE_MAX = 16  # bound the per-(gen, mesh) jit cache (each new
# canvas geometry clones gen; unbounded growth would leak in long-running
# serving processes)


def _sharded_fwd(gen, mesh: Mesh):
    """Jitted one-pass forward whose OUTPUT width axis is sharded over the
    mesh. The latent input is tiny and stays replicated (its W = tot*base+2
    is never cleanly divisible); requesting the output sharding lets GSPMD
    propagate the spatial partition backward through every conv and insert
    the 1-px halo collective-permutes over ICI itself."""
    key = (gen, mesh)
    if key not in _SHARDED_FWD_CACHE:
        while len(_SHARDED_FWD_CACHE) >= _SHARDED_FWD_CACHE_MAX:
            _SHARDED_FWD_CACHE.pop(next(iter(_SHARDED_FWD_CACHE)))
        out_sharding = NamedSharding(mesh, P(None, None, "data", None))

        @functools.partial(jax.jit, out_shardings=out_sharding)
        def fwd(variables, z, maps):
            out, _ = gen.apply(variables, z, maps, train=False)
            return out

        _SHARDED_FWD_CACHE[key] = fwd
    return _SHARDED_FWD_CACHE[key]


def generate_one_pass_sharded(
    gen,
    variables,
    z_full: jnp.ndarray,
    maps_full: Optional[List[jnp.ndarray]] = None,
    total_patches_h: int = 3,
    total_patches_w: int = 3,
    mesh: Optional[Mesh] = None,
):
    """One-pass generation with the canvas width sharded across the mesh.

    z_full: (N, tot_h*base+2, tot_w*base+2, z_dim) merged latent. The output
    (N, tot_h*P, tot_w*P, C) canvas is sharded on its width axis (requires
    tot_w*P divisible by the mesh size — patch_res is >= 32 in practice so
    any mesh up to 32 chips divides it); per-device activation memory is
    O(canvas/num_devices).
    """
    big = gen.clone(num_patches_h=total_patches_h, num_patches_w=total_patches_w)
    if mesh is None:
        from infinite_texture_gans_tpu.sampling.infinite import _one_pass_fwd

        return _one_pass_fwd(big, variables, z_full, maps_full)
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    return _sharded_fwd(big, mesh)(variables, z_full, maps_full)
