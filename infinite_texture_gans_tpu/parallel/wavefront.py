"""Wavefront canvas generation: one canvas, many chips, explicit ICI halo
exchange.

The raster dependency of patch-by-patch generation (SURVEY.md §3.2: sub-image
(r, c) needs the halo cache written by (r, c-1) and by row r-1) admits
anti-diagonal ("wavefront") parallelism — the maximum legal parallelism of
the reference's protocol. Each mesh device owns one canvas row of sub-images;
at global step t device d computes its column c = t - 2d (the lag-2
wavefront: (r+1, c) needs (r, c+1) because the row buffer it reads one pixel
past the column above). After every step each device ``ppermute``s its
accumulated bottom-row halo buffer to the device below — the explicit
ICI-neighbor halo exchange that replaces the reference's CPU-side halo
accumulation (models/layers.py:117-132). Within a device everything is the
same jitted generator step as the single-chip engine.

v2 (this file): canvases TALLER than the mesh run as **bands** — rows are
assigned cyclically (device d handles global rows d, d+n_dev, ...), each band
is one lag-2 wavefront pass, and the finalized bottom-row buffer of a band's
last device hands off to device 0 of the next band between passes. SSM map
strips are supported, and each device receives only ITS latent / map row
strips (inputs sharded on the mesh axis — no full-canvas replication). A
61x61-patch canvas on 8 devices runs in 8 band passes of (61 + 14) steps
instead of 3721 sequential steps. All bands share ONE compiled executable
(the band index is a traced scalar).
"""

from __future__ import annotations

import functools
from math import ceil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):  # check_rep was renamed check_vma
        kw["check_vma"] = kw.pop("check_rep", kw.pop("check_vma", True))
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from infinite_texture_gans_tpu.ops.padding import (
    GridPos,
    SiteState,
    finalize_row,
    init_halo_state,
    rotate_rows,
)
from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.sampling.infinite import canvas_geometry


@functools.lru_cache(maxsize=8)
def _band_fn(gen, mesh, steps_w, steps_h, num_images, tot_w, n_maps):
    """Compiled one-band wavefront pass, cached per geometry (a per-call jit
    closure would recompile every band/call)."""
    n_dev = mesh.devices.size
    gh, gw, base = gen.num_patches_h, gen.num_patches_w, gen.base_res
    P_res = gen.patch_resolution
    z_cols = gw * base + latents.Z_PAD
    specs = gen.site_specs()
    outer = gen.outer_padding
    total_T = steps_w + 2 * (n_dev - 1)
    perm = [(i, i + 1) for i in range(n_dev - 1)]

    map_specs = tuple(P("data") for _ in range(n_maps))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), map_specs, P(), P()),
        out_specs=(P("data"), P("data")),
        check_rep=False,
    )
    def band(variables, z_strips, maps_strips, row_read_init, band_idx):
        d = lax.axis_index("data")
        z_strip = z_strips[0]  # (N, z_rows_h, tot_w*base+2, zd)
        first_row = jnp.logical_and(band_idx == 0, d == 0)

        halo = init_halo_state(specs, num_images, gh, gw, tot_w, dtype=gen.dtype)
        if row_read_init:
            # device 0 continues below the previous band's last row
            halo = {
                name: SiteState(
                    v=site.v,
                    row_read=jnp.where(d == 0, row_read_init[name], site.row_read),
                    row_write=site.row_write,
                )
                for name, site in halo.items()
            }
        subs0 = jnp.zeros(
            (steps_w, num_images, gh * P_res, gw * P_res, gen.img_ch), gen.dtype
        )

        def body(carry, t):
            halo, subs = carry
            c = t - 2 * d
            active = jnp.logical_and(c >= 0, c < steps_w)
            cc = jnp.clip(c, 0, steps_w - 1)
            z_sub = lax.dynamic_slice_in_dim(
                z_strip, cc * (gw - 1) * base, z_cols, axis=2
            )
            maps_sub = None
            if maps_strips:
                maps_sub = [
                    lax.dynamic_slice_in_dim(
                        m[0],
                        cc * (gw - 1) * (2**i) * base,
                        gw * (2**i) * base + latents.MAP_PAD,
                        axis=2,
                    )
                    for i, m in enumerate(maps_strips)
                ]
            pos = GridPos(col=cc, first_row=first_row, first_col=cc == 0)
            out, halo_new = gen.apply(
                variables, z_sub, maps_sub, train=False, halo=halo, pos=pos
            )
            halo = jax.tree_util.tree_map(
                lambda old, new: jnp.where(active, new, old), halo, halo_new
            )
            subs = subs.at[cc].set(jnp.where(active, out, subs[cc]))

            # ICI halo exchange: ship this row's accumulated bottom-edge
            # buffers (border cells pre-filled) to the device below; the
            # receiver reads only the region its wavefront position has
            # already made final (lag 2 guarantees that). Device 0 has no
            # upstream neighbour and must keep its band-handoff buffer.
            sends = {
                name: finalize_row(site, outer).row_write
                for name, site in halo.items()
            }
            recvs = lax.ppermute(sends, "data", perm)
            halo = {
                name: SiteState(
                    v=site.v,
                    row_read=jnp.where(d == 0, site.row_read, recvs[name]),
                    row_write=site.row_write,
                )
                for name, site in halo.items()
            }
            return (halo, subs), None

        (halo, subs), _ = lax.scan(body, (halo, subs0), jnp.arange(total_T))
        # ready-for-next-row state; the host hands the LAST device's buffer
        # to device 0 of the next band
        rotated = {
            name: rotate_rows(finalize_row(site, outer)) for name, site in halo.items()
        }
        handoff = {name: site.row_read[None] for name, site in rotated.items()}
        return subs[None], handoff

    return band


def generate_canvas_wavefront(
    gen,
    variables,
    key: jax.Array,
    output_resolution_height: int,
    output_resolution_width: int,
    mesh: Mesh,
    num_images: int = 1,
    z_full: Optional[jnp.ndarray] = None,
    maps_full=None,
) -> np.ndarray:
    """Fill one (out_h, out_w) canvas with its sub-image rows pipelined
    across the mesh's ``data`` axis. Equal to :func:`generate_canvas`
    (tests assert it); supports BN and SSM generators and any canvas height
    (cyclic band assignment when steps_h > mesh size)."""
    P_res = gen.patch_resolution
    gh, gw = gen.num_patches_h, gen.num_patches_w
    base = gen.base_res
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(
        output_resolution_height, output_resolution_width, P_res, gh, gw
    )
    n_dev = mesh.devices.size
    if gw < 3:
        # Lag-2 is only provably equal to the sequential engine for gw >= 3:
        # with gw=2 the top-halo read window of column c overlaps column
        # c+2's later row_write by one pixel.
        raise ValueError(
            f"wavefront requires num_patches_w >= 3 (got {gw}); the lag-2 "
            "schedule's halo read window would race the row buffer"
        )

    zk, mk = jax.random.split(key)
    if z_full is None:
        z_full = latents.build_z_full(zk, num_images, gen.z_dim, base, tot_h, tot_w)
    if gen.type_norm == "SSM" and maps_full is None:
        maps_full = latents.build_maps_full(
            mk, num_images, gen.map_dim, gen.n_layers_G, gen.base_res, tot_h, tot_w
        )
    n_maps = len(maps_full) if maps_full is not None else 0

    n_bands = ceil(steps_h / n_dev)

    def strips_for_band(b):
        """Per-device row strips (device d gets ONLY its rows — the inputs
        are sharded on the mesh axis, not replicated). Index arithmetic
        lives in latents.row_strips."""
        rows = [min(b * n_dev + d, steps_h - 1) for d in range(n_dev)]
        per_row = [latents.row_strips(z_full, maps_full, r, base, gh) for r in rows]
        z_b = jnp.stack([z for z, _ in per_row])
        maps_b = ()
        if maps_full is not None:
            maps_b = tuple(
                jnp.stack([ms[i] for _, ms in per_row]) for i in range(n_maps)
            )
        return z_b, maps_b

    band = _band_fn(gen, mesh, steps_w, steps_h, num_images, tot_w, n_maps)

    canvas = np.zeros(
        (num_images, tot_h * P_res, tot_w * P_res, gen.img_ch), np.float32
    )
    handoff = {
        name: jnp.zeros_like(site.row_read)
        for name, site in init_halo_state(
            gen.site_specs(), num_images, gh, gw, tot_w, dtype=gen.dtype
        ).items()
    }
    for b in range(n_bands):
        z_b, maps_b = strips_for_band(b)
        subs, handoff_all = band(
            variables, z_b, maps_b, handoff, jnp.int32(b)
        )
        subs = np.asarray(subs)  # (n_dev, steps_w, N, gh*P, gw*P, C)
        handoff = jax.tree_util.tree_map(lambda a: a[-1], handoff_all)
        for d in range(n_dev):
            r = b * n_dev + d
            if r >= steps_h:
                break
            for c in range(steps_w):
                canvas[
                    :,
                    r * (gh - 1) * P_res : (r * (gh - 1) + gh) * P_res,
                    c * (gw - 1) * P_res : (c * (gw - 1) + gw) * P_res,
                    :,
                ] = subs[d, c]
    return canvas[:, :output_resolution_height, :output_resolution_width, :]
