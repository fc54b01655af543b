"""Zeros-padding baseline sampling + tiled inference.

Equivalents of reference utils.py:530-575 (sample_from_gen) and
utils.py:401-470 (tile_process, the Real-ESRGAN-style tiling that
demonstrates the seams local padding eliminates).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator


def sample_from_gen(
    gen: ResidualPatchGenerator,
    variables,
    key: jax.Array,
    num_images: int = 1,
    base_res: Optional[int] = None,
    tiles: bool = False,
):
    """Baseline (padding_mode='zeros') sampling: single z (N, base, base, zdim)
    through G (reference utils.py:530-575)."""
    base = base_res if base_res is not None else gen.base_res
    zk, mk = jax.random.split(key)
    z = jax.random.normal(zk, (num_images, base, base, gen.z_dim))
    maps = None
    if gen.type_norm == "SSM":
        keys = jax.random.split(mk, gen.n_layers_G)
        maps = [
            jax.random.normal(
                keys[i], (num_images, (2**i) * base, (2**i) * base, gen.map_dim)
            )
            for i in range(gen.n_layers_G)
        ]
    if tiles:
        scale = 2 ** (gen.n_layers_G - 1)
        return tile_process(gen, variables, z, scale=scale, tile_size=32, tile_pad=16)
    return _fwd(gen, variables, z, maps)


@functools.partial(jax.jit, static_argnames=("gen",))
def _fwd(gen, variables, z, maps=None):
    out, _ = gen.apply(variables, z, maps, train=False)
    return out


def tile_process(
    gen: ResidualPatchGenerator,
    variables,
    z: jnp.ndarray,
    scale: int = 4,
    tile_size: int = 32,
    tile_pad: int = 8,
):
    """Crop the latent into overlapping tiles, run G per tile, stitch outputs
    (reference utils.py:401-470). Exhibits the boundary artifacts that the
    local-padding pipeline exists to remove — kept for capability parity and
    for seam-MSE comparisons."""
    n, height, width, c = z.shape
    out_h, out_w = height * scale, width * scale
    output = jnp.zeros((n, out_h, out_w, gen.img_ch), dtype=jnp.float32)
    tiles_x = math.ceil(width / tile_size)
    tiles_y = math.ceil(height / tile_size)

    def fwd(variables, z_tile):
        return _fwd(gen, variables, z_tile)

    for y in range(tiles_y):
        for x in range(tiles_x):
            in_x0, in_y0 = x * tile_size, y * tile_size
            in_x1, in_y1 = min(in_x0 + tile_size, width), min(in_y0 + tile_size, height)
            px0, py0 = max(in_x0 - tile_pad, 0), max(in_y0 - tile_pad, 0)
            px1, py1 = min(in_x1 + tile_pad, width), min(in_y1 + tile_pad, height)

            tile = z[:, py0:py1, px0:px1, :]
            out_tile = fwd(variables, tile)

            ox0, oy0 = in_x0 * scale, in_y0 * scale
            tx0, ty0 = (in_x0 - px0) * scale, (in_y0 - py0) * scale
            tw, th = (in_x1 - in_x0) * scale, (in_y1 - in_y0) * scale
            output = output.at[:, oy0 : oy0 + th, ox0 : ox0 + tw, :].set(
                out_tile[:, ty0 : ty0 + th, tx0 : tx0 + tw, :]
            )
    return output
