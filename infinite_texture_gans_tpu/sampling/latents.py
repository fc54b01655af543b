"""Latent / modulation-map construction as pure functions of a PRNG key.

Equivalents of reference utils.py:221-256 (build_z / build_maps) and the
training-time z of utils.py:501-519. The full-canvas latent is materialised
once; sub-image inputs are overlapping *views* (slices) of it, which is what
guarantees that re-generated boundary patches see identical z across
generation steps.

Layout is NHWC. The z pad is 2 (one 3x3 valid conv consumes it); map pads
are 4 (two consecutive valid convs inside SSM).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Z_PAD = 2
MAP_PAD = 4


def build_z_full(
    key: jax.Array,
    num_images: int,
    z_dim: int,
    base_res: int,
    total_patches_h: int,
    total_patches_w: int,
) -> jnp.ndarray:
    """Full-canvas latent (N, tot_h*base+2, tot_w*base+2, z_dim)
    (reference utils.py:221-234)."""
    return jax.random.normal(
        key,
        (
            num_images,
            total_patches_h * base_res + Z_PAD,
            total_patches_w * base_res + Z_PAD,
            z_dim,
        ),
    )


def build_maps_full(
    key: jax.Array,
    num_images: int,
    map_dim: int,
    n_layers_G: int,
    base_res: int,
    total_patches_h: int,
    total_patches_w: int,
) -> List[jnp.ndarray]:
    """Per-layer full-canvas modulation maps, maps[i] of shape
    (N, tot_h*r+4, tot_w*r+4, map_dim), r = 2^i*base (reference utils.py:237-256)."""
    keys = jax.random.split(key, n_layers_G)
    maps = []
    for i in range(n_layers_G):
        r = (2**i) * base_res
        maps.append(
            jax.random.normal(
                keys[i],
                (
                    num_images,
                    total_patches_h * r + MAP_PAD,
                    total_patches_w * r + MAP_PAD,
                    map_dim,
                ),
            )
        )
    return maps


def build_train_z(
    key: jax.Array, num_images: int, z_dim: int, base_res: int, gh: int, gw: int
) -> jnp.ndarray:
    """Training-time latent (N, gh*base+2, gw*base+2, z_dim)
    (reference utils.py:501-503)."""
    return jax.random.normal(
        key, (num_images, gh * base_res + Z_PAD, gw * base_res + Z_PAD, z_dim)
    )


def build_train_maps(
    key: jax.Array,
    num_images: int,
    map_dim: int,
    n_layers_G: int,
    base_res: int,
    gh: int,
    gw: int,
) -> List[jnp.ndarray]:
    """Training-time merged SSM maps, one per layer, 4px oversized
    (reference utils.py:506-519 builds these then overlap-crops per patch;
    the merged map is the equivalent input for the merged-layout SSM)."""
    keys = jax.random.split(key, n_layers_G)
    return [
        jax.random.normal(
            keys[i],
            (
                num_images,
                gh * (2**i) * base_res + MAP_PAD,
                gw * (2**i) * base_res + MAP_PAD,
                map_dim,
            ),
        )
        for i in range(n_layers_G)
    ]


def slice_sub_z(z_full, r: int, c: int, base_res: int, gh: int, gw: int):
    """Overlapping sub-image latent window for canvas step (r, c): offset
    (r*(gh-1)*base, c*(gw-1)*base), size (gh*base+2, gw*base+2)."""
    r0 = r * (gh - 1) * base_res
    c0 = c * (gw - 1) * base_res
    return z_full[:, r0 : r0 + gh * base_res + Z_PAD, c0 : c0 + gw * base_res + Z_PAD, :]


def slice_sub_maps(maps_full, r: int, c: int, base_res: int, gh: int, gw: int):
    """Overlapping sub-image map windows, one per layer."""
    out = []
    for i, m in enumerate(maps_full):
        res = (2**i) * base_res
        r0 = r * (gh - 1) * res
        c0 = c * (gw - 1) * res
        out.append(m[:, r0 : r0 + gh * res + MAP_PAD, c0 : c0 + gw * res + MAP_PAD, :])
    return out


def row_strips(z_full, maps_full, r: int, base_res: int, gh: int):
    """Full-width latent/map strips for canvas row ``r`` — the ONE place the
    row-overlap index arithmetic lives (stride (gh-1)*res, height gh*res +
    pad; consumed by the raster engine, the streamed engine and the
    wavefront)."""
    r0 = r * (gh - 1) * base_res
    z_strip = z_full[:, r0 : r0 + gh * base_res + Z_PAD]
    maps_strips = None
    if maps_full is not None:
        maps_strips = [
            m[
                :,
                r * (gh - 1) * (2**i) * base_res : r * (gh - 1) * (2**i) * base_res
                + gh * (2**i) * base_res
                + MAP_PAD,
            ]
            for i, m in enumerate(maps_full)
        ]
    return z_strip, maps_strips


def truncated_normal_z(
    key: jax.Array, truncated: float, z_dim: int, b_size: int
) -> jnp.ndarray:
    """Truncated-normal latent sampler (reference utils.py:636-645 — there a
    host-side rejection loop; here an exact truncated normal on device)."""
    return jax.random.truncated_normal(key, -truncated, truncated, (b_size, z_dim))
