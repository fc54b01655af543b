"""Wavefront canvas generation: one canvas, many chips, explicit ICI halo
exchange.

The raster dependency of patch-by-patch generation (SURVEY.md §3.2: sub-image
(r, c) needs the halo cache written by (r, c-1) and by row r-1) admits
anti-diagonal ("wavefront") parallelism — the maximum legal parallelism of
the reference's protocol. Here each mesh device owns one canvas row of
sub-images; at global step t device d computes its column c = t - 2d (the
lag-2 wavefront: (r+1, c) needs (r, c+1) because the row buffer it reads one
pixel past the column above). After every step each device ``ppermute``s its
accumulated bottom-row halo buffer to the device below — the explicit
ICI-neighbor halo exchange that replaces the reference's CPU-side halo
accumulation (models/layers.py:117-132). Within a device everything is the
same jitted generator step as the single-chip engine.

v1 scope: BN-norm generators (no SSM maps), canvas rows <= mesh size (one
row per device). Throughput: rows complete in a pipeline — T = steps_w +
2*(steps_h-1) steps total instead of steps_w*steps_h sequential steps.
"""

from __future__ import annotations

import functools
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
)
from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.sampling.infinite import canvas_geometry


def generate_canvas_wavefront(
    gen,
    variables,
    key: jax.Array,
    output_resolution_height: int,
    output_resolution_width: int,
    mesh: Mesh,
    num_images: int = 1,
    z_full: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Fill one (out_h, out_w) canvas with its sub-image rows pipelined
    across the mesh's ``data`` axis. Equal to :func:`generate_canvas`
    (tests assert it); requires steps_h <= mesh size and type_norm == 'BN'.
    """
    assert gen.type_norm == "BN", "wavefront v1 supports BN generators"
    P_res = gen.patch_resolution
    gh, gw = gen.num_patches_h, gen.num_patches_w
    base = gen.base_res
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(
        output_resolution_height, output_resolution_width, P_res, gh, gw
    )
    n_dev = mesh.devices.size
    if steps_h > n_dev:
        raise ValueError(
            f"wavefront v1 runs one canvas row per device: steps_h={steps_h} "
            f"> mesh size {n_dev}; generate in horizontal bands or use "
            "generate_canvas"
        )
    if gw < 3:
        # Lag-2 is only provably equal to the sequential engine for gw >= 3:
        # with gw=2 the top-halo read window of column c overlaps column
        # c+2's later row_write by one pixel.
        raise ValueError(
            f"wavefront requires num_patches_w >= 3 (got {gw}); the lag-2 "
            "schedule's halo read window would race the row buffer"
        )

    if z_full is None:
        z_full = latents.build_z_full(
            key, num_images, gen.z_dim, base, tot_h, tot_w
        )
    # every device needs its own row strip; replicate the (small) full latent
    z_rows_h = gh * base + latents.Z_PAD
    total_T = steps_w + 2 * (steps_h - 1)
    specs = gen.site_specs()
    outer = gen.outer_padding

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("data"),
        check_rep=False,
    )
    def wavefront(variables, z_full):
        d = lax.axis_index("data")
        r = jnp.minimum(d, steps_h - 1)  # devices past the last row idle on it
        r0 = r * (gh - 1) * base
        z_strip = lax.dynamic_slice_in_dim(z_full, r0, z_rows_h, axis=1)

        halo0 = init_halo_state(specs, num_images, gh, gw, tot_w, dtype=gen.dtype)
        subs0 = jnp.zeros(
            (steps_w, num_images, gh * P_res, gw * P_res, gen.img_ch), gen.dtype
        )
        perm = [(i, i + 1) for i in range(n_dev - 1)]

        def body(carry, t):
            halo, subs = carry
            c = t - 2 * r
            active = jnp.logical_and(c >= 0, c < steps_w)
            cc = jnp.clip(c, 0, steps_w - 1)
            z_sub = lax.dynamic_slice_in_dim(
                z_strip, cc * (gw - 1) * base, gw * base + latents.Z_PAD, axis=2
            )
            pos = GridPos(col=cc, first_row=r == 0, first_col=cc == 0)
            out, halo_new = gen.apply(
                variables, z_sub, None, train=False, halo=halo, pos=pos
            )
            halo = jax.tree_util.tree_map(
                lambda old, new: jnp.where(active, new, old), halo, halo_new
            )
            subs = subs.at[cc].set(jnp.where(active, out, subs[cc]))

            # ICI halo exchange: ship this row's accumulated bottom-edge
            # buffers (border cells pre-filled) to the device below; the
            # receiver reads only the region its wavefront position has
            # already made final (lag 2 guarantees that).
            sends = {
                name: finalize_row(site, outer).row_write
                for name, site in halo.items()
            }
            recvs = lax.ppermute(sends, "data", perm)
            halo = {
                name: SiteState(
                    v=site.v, row_read=recvs[name], row_write=site.row_write
                )
                for name, site in halo.items()
            }
            return (halo, subs), None

        (_, subs), _ = lax.scan(body, (halo0, subs0), jnp.arange(total_T))
        return subs[None]  # leading device axis for out_specs P('data')

    subs = np.asarray(wavefront(variables, z_full))  # (n_dev, steps_w, N, ...)
    canvas = np.zeros(
        (num_images, tot_h * P_res, tot_w * P_res, gen.img_ch), np.float32
    )
    for rr in range(steps_h):
        for c in range(steps_w):
            canvas[
                :,
                rr * (gh - 1) * P_res : (rr * (gh - 1) + gh) * P_res,
                c * (gw - 1) * P_res : (c * (gw - 1) + gw) * P_res,
                :,
            ] = subs[rr, c]
    return canvas[:, :output_resolution_height, :output_resolution_width, :]
