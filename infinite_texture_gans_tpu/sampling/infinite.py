"""Infinite-canvas generation engine.

Equivalent of reference utils.py:258-397 (sample_from_gen_PatchByPatch_test)
and utils.py:475-527 (the training-time 3x3-grid forward), re-designed:

* The halo cache is an explicit pytree threaded through the raster scan —
  no module state, jit-safe (reference: 4 mutable tensors inside every conv,
  models/layers.py:70-143, with per-step .cpu() round-trips).
* A whole canvas **row** of sub-images is ONE compiled ``lax.scan`` over
  columns (the halo cache is the scan carry); the host sees one dispatch and
  one D2H copy per row instead of one per sub-image. The reference's 9-way
  ``image_location`` string dispatch becomes traced boolean flags, so every
  canvas position runs the same program.
* Canvas assembly is write-full/last-writer-wins into a host buffer, which
  reproduces the reference's "crop off re-generated right column / bottom
  row" protocol (utils.py:364-377) with no branching.
* Device memory stays O(sub-image) + O(canvas row) halo buffers; the canvas
  lives on host.

The correctness definition is exact agreement with :func:`generate_one_pass`
(the same network run once over the whole canvas) — the identity the local
padding scheme is designed to achieve.
"""

from __future__ import annotations

import functools
from math import ceil
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.ops.padding import (
    GridPos,
    finalize_row,
    init_halo_state,
    rotate_rows,
)
from infinite_texture_gans_tpu.sampling import latents


def canvas_geometry(out_h: int, out_w: int, patch_res: int, gh: int, gw: int):
    """Steps and total patch counts for a target resolution
    (reference utils.py:294-303)."""
    steps_h = max(1, ceil((out_h / patch_res - 1) / (gh - 1)))
    steps_w = max(1, ceil((out_w / patch_res - 1) / (gw - 1)))
    total_h = steps_h * (gh - 1) + 1
    total_w = steps_w * (gw - 1) + 1
    return steps_h, steps_w, total_h, total_w


def _row_impl(gen, variables, z_strip, maps_strips, halo, first_row, steps_w):
    """One canvas row = lax.scan over its columns; the halo cache is the
    carry. z/map strips are full-row-width; each column's overlapping window
    is a dynamic_slice inside the scan (no host-side duplication). Ends with
    finalize+rotate so the returned cache is ready for the next row."""
    gh, gw, base = gen.num_patches_h, gen.num_patches_w, gen.base_res

    def body(halo, col):
        z_sub = lax.dynamic_slice_in_dim(
            z_strip, col * (gw - 1) * base, gw * base + latents.Z_PAD, axis=2
        )
        maps_sub = None
        if maps_strips is not None:
            maps_sub = [
                lax.dynamic_slice_in_dim(
                    m,
                    col * (gw - 1) * (2**i) * base,
                    gw * (2**i) * base + latents.MAP_PAD,
                    axis=2,
                )
                for i, m in enumerate(maps_strips)
            ]
        pos = GridPos(col=col, first_row=first_row, first_col=col == 0)
        out, halo = gen.apply(
            variables, z_sub, maps_sub, train=False, halo=halo, pos=pos
        )
        return halo, out

    halo, subs = lax.scan(body, halo, jnp.arange(steps_w, dtype=jnp.int32))
    halo = {
        name: rotate_rows(finalize_row(site, gen.outer_padding))
        for name, site in halo.items()
    }
    return subs, halo


@functools.partial(jax.jit, static_argnames=("gen", "steps_w"))
def _row_scan(gen, variables, z_strip, maps_strips, halo, first_row, steps_w):
    """Single-row dispatch (kept for the wavefront engine and tests).

    Module-level with the (hashable) flax module as a static arg, so the
    compiled executable is cached across ``generate_canvas`` calls — a jit
    closure created per call would recompile every time.
    """
    return _row_impl(gen, variables, z_strip, maps_strips, halo, first_row, steps_w)


@functools.partial(jax.jit, static_argnames=("gen", "steps_w", "n_rows", "has_maps"))
def _row_group_scan(gen, variables, z_full, maps_full, halo, r0, steps_w,
                    n_rows, has_maps):
    """``n_rows`` canvas rows in ONE dispatch: an outer lax.scan over rows
    around the per-row column scan, strips sliced from the full-canvas
    latents on device. Collapses the engine's host dispatch count from
    steps_h to ceil(steps_h / group) — the tunnel pays per-dispatch latency,
    the device does not (VERDICT r2 next-#4). ``r0`` is traced, so every
    equal-size group reuses one executable."""
    gh, base = gen.num_patches_h, gen.base_res

    def body(halo, k):
        r = r0 + k
        z_strip = lax.dynamic_slice_in_dim(
            z_full, r * (gh - 1) * base, gh * base + latents.Z_PAD, axis=1
        )
        maps_strips = None
        if has_maps:
            maps_strips = [
                lax.dynamic_slice_in_dim(
                    m,
                    r * (gh - 1) * (2**i) * base,
                    gh * (2**i) * base + latents.MAP_PAD,
                    axis=1,
                )
                for i, m in enumerate(maps_full)
            ]
        subs, halo = _row_impl(
            gen, variables, z_strip, maps_strips, halo, r == 0, steps_w
        )
        return halo, subs

    halo, subs = lax.scan(body, halo, jnp.arange(n_rows, dtype=jnp.int32))
    return subs, halo  # subs: (n_rows, steps_w, N, gh*P, gw*P, C)


def generate_canvas(
    gen: ResidualPatchGenerator,
    variables,
    key: jax.Array,
    output_resolution_height: int = 384,
    output_resolution_width: int = 384,
    num_images: int = 1,
    z_full: Optional[jnp.ndarray] = None,
    maps_full: Optional[List[jnp.ndarray]] = None,
    progress: bool = False,
    row_group: int = 4,
) -> np.ndarray:
    """Raster-scan patch-by-patch generation of an (out_h, out_w) canvas.

    Returns a host numpy array (N, out_h, out_w, img_ch) in [-1, 1].
    ``z_full``/``maps_full`` may be passed explicitly (e.g. to compare with
    the one-pass oracle); otherwise they are drawn from ``key``.
    ``row_group`` canvas rows are generated per device dispatch (the
    reference pays one forward + .cpu() per SUB-IMAGE, utils.py:360).
    """
    P = gen.patch_resolution
    gh, gw = gen.num_patches_h, gen.num_patches_w
    base = gen.base_res
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(
        output_resolution_height, output_resolution_width, P, gh, gw
    )

    zk, mk = jax.random.split(key)
    if z_full is None:
        z_full = latents.build_z_full(zk, num_images, gen.z_dim, gen.base_res, tot_h, tot_w)
    if gen.type_norm == "SSM" and maps_full is None:
        maps_full = latents.build_maps_full(
            mk, num_images, gen.map_dim, gen.n_layers_G, gen.base_res, tot_h, tot_w
        )

    halo = init_halo_state(gen.site_specs(), num_images, gh, gw, tot_w, dtype=gen.dtype)

    canvas = np.zeros(
        (num_images, tot_h * P, tot_w * P, gen.img_ch), dtype=np.float32
    )

    def flush(r0, subs_g):
        # One D2H copy per row GROUP; write each sub-image into the canvas —
        # later writes overwrite the re-generated right patch-column /
        # bottom patch-row (last-writer-wins == reference crop protocol,
        # utils.py:364-377).
        subs_np = np.asarray(subs_g)  # (n, steps_w, N, gh*P, gw*P, C)
        for k in range(subs_np.shape[0]):
            r = r0 + k
            for c in range(steps_w):
                canvas[
                    :,
                    r * (gh - 1) * P : (r * (gh - 1) + gh) * P,
                    c * (gw - 1) * P : (c * (gw - 1) + gw) * P,
                    :,
                ] = subs_np[k, c]
        if progress:
            print(
                f"  rows {r0 + 1}-{r0 + subs_np.shape[0]}/{steps_h} "
                f"({steps_w} sub-images each)",
                flush=True,
            )

    row_group = max(1, min(row_group, steps_h))
    pending = None
    for g0 in range(0, steps_h, row_group):
        n = min(row_group, steps_h - g0)
        subs_g, halo = _row_group_scan(
            gen, variables, z_full, maps_full, halo, jnp.int32(g0),
            steps_w, n, maps_full is not None,
        )
        try:  # start the D2H early; consume after the NEXT group dispatches
            subs_g.copy_to_host_async()
        except AttributeError:  # pragma: no cover - non-array backends
            pass
        if pending is not None:
            flush(*pending)
        pending = (g0, subs_g)
    flush(*pending)
    return canvas[:, :output_resolution_height, :output_resolution_width, :]


def generate_one_pass(
    gen: ResidualPatchGenerator,
    variables,
    z_full: jnp.ndarray,
    maps_full: Optional[List[jnp.ndarray]] = None,
    total_patches_h: int = 3,
    total_patches_w: int = 3,
):
    """One-pass oracle: run the generator once over the entire canvas grid.

    Mathematically what the patch-by-patch engine must reproduce exactly.
    Used for testing and for small canvases that fit in one pass (this is
    also the training-time forward for (gh, gw) = grid, reference
    utils.py:475-527).
    """
    big = gen.clone(
        num_patches_h=total_patches_h, num_patches_w=total_patches_w
    )
    return _one_pass_fwd(big, variables, z_full, maps_full)


@functools.partial(jax.jit, static_argnames=("gen",))
def _one_pass_fwd(gen, variables, z, maps):
    out, _ = gen.apply(variables, z, maps, train=False)
    return out


def sample_from_gen_patch_by_patch_train(
    gen: ResidualPatchGenerator, variables, key: jax.Array, num_images: int = 8
):
    """Training-time fake sampling: one (gh x gw)-grid forward -> merged fakes
    (reference utils.py:475-527). Pure function of (variables, key)."""
    zk, mk = jax.random.split(key)
    z = latents.build_train_z(
        zk, num_images, gen.z_dim, gen.base_res, gen.num_patches_h, gen.num_patches_w
    )
    maps = None
    if gen.type_norm == "SSM":
        maps = latents.build_train_maps(
            mk,
            num_images,
            gen.map_dim,
            gen.n_layers_G,
            gen.base_res,
            gen.num_patches_h,
            gen.num_patches_w,
        )
    out, _ = gen.apply(variables, z, maps, train=False)
    return out
