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
* Canvas assembly happens ON DEVICE: each dispatch group's overlap-trimmed
  band (the reference's "crop off re-generated right column / bottom row"
  protocol, utils.py:364-377) is painted into a device canvas, and the host
  receives ONE finished array — a tunneled host pays ~90 ms fixed latency
  per device->host transfer, so one transfer beats per-row copies
  (docs/PERF.md). Device memory is O(canvas); for canvases beyond HBM use
  :mod:`sampling.stream`, which keeps O(band) on both sides.

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


def dispatch_groups(steps_h: int, gh: int, P: int, row_group: int):
    """Row-group schedule for the raster engine: (r0, n_rows, kept_rows)
    triples. The LAST canvas row keeps its bottom patch-row (every other
    row's bottom patch-row is re-generated by the next row — the reference
    crop protocol, utils.py:364-377) so it always dispatches on its own."""
    body = steps_h - 1
    groups = [
        (g0, min(row_group, body - g0), (gh - 1) * P)
        for g0 in range(0, body, max(1, row_group))
    ]
    groups.append((steps_h - 1, 1, gh * P))
    return groups


@jax.jit
def _to_uint8_dev(x):
    """[-1, 1] float -> uint8 ON DEVICE, byte-identical to the save CLI
    (``sample.save_image``: (x*0.5+0.5)*255 + 0.5, torchvision rounding).
    Quantizes in f32: bf16's ~8 mantissa bits (ULP ~1 near 255) would break
    byte-identity with the host path."""
    x = x.astype(jnp.float32)
    return jnp.clip((x * 0.5 + 0.5) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)


def _assemble_band(subs_g, kept_rows: int, kept_cols: int, as_uint8: bool):
    """Trim one group of canvas rows and lay it out as a contiguous band
    (N, n_rows * kept_rows, canvas_w, C). Shared by the grouped painter and
    the one-dispatch engine."""
    main, tail = _trim_rows(subs_g, kept_rows, kept_cols, as_uint8)
    n, steps_w, N, kr, kc, C = main.shape
    band_main = jnp.transpose(main, (2, 0, 3, 1, 4, 5)).reshape(
        N, n * kr, steps_w * kc, C
    )
    band_tail = jnp.transpose(tail, (1, 0, 2, 3, 4)).reshape(N, n * kr, -1, C)
    return jnp.concatenate([band_main, band_tail], axis=2)


@functools.partial(jax.jit, static_argnames=(
    "kept_rows", "kept_cols", "as_uint8", "row_stride"))
def _paint_group(canvas_dev, subs_g, r0, kept_rows: int, kept_cols: int,
                 as_uint8: bool, row_stride: int):
    """Write one dispatch group's trimmed sub-images into the DEVICE canvas.

    The kept regions of a group tile a contiguous band (each group row k
    paints rows [(r0+k)*row_stride, +kept_rows) and kept_rows == row_stride
    for every body group), so the whole group lands as ONE
    dynamic_update_slice. Device-side assembly exists because the tunneled
    host pays ~90 ms FIXED latency per device->host array (docs/PERF.md):
    one transfer of the finished canvas beats per-group copies."""
    band = _assemble_band(subs_g, kept_rows, kept_cols, as_uint8)
    return lax.dynamic_update_slice(
        canvas_dev, band.astype(canvas_dev.dtype), (0, r0 * row_stride, 0, 0)
    )


@functools.partial(jax.jit, static_argnames=(
    "gen", "steps_h", "steps_w", "has_maps", "as_uint8", "out_h", "out_w"))
def _canvas_dispatch(gen, variables, z_full, maps_full, halo,
                     steps_h: int, steps_w: int, has_maps: bool,
                     as_uint8: bool, out_h: int, out_w: int):
    """The ENTIRE canvas in one device dispatch: raster scan over every row,
    overlap trimming, band assembly, optional uint8 quantization and the
    final crop all inside one jit. The host sees one dispatch and one
    device->host transfer of the finished (N, out_h, out_w, C) array — on a
    tunneled host each round trip costs ~90 ms fixed, so this is the wall-
    clock-optimal shape for any canvas whose ~2.25x sub-image working set
    fits in HBM (larger canvases: sampling/stream.py keeps O(band)).

    The reference pays one forward + .cpu() per sub-image
    (utils.py:341,360); this is steps_h * steps_w of them in one program."""
    gh, gw, base = gen.num_patches_h, gen.num_patches_w, gen.base_res
    P = gen.patch_resolution

    def body(halo, r):
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

    _, subs = lax.scan(body, halo, jnp.arange(steps_h, dtype=jnp.int32))
    # subs: (steps_h, steps_w, N, gh*P, gw*P, C). Body rows keep their top
    # (gh-1)*P rows (the bottom patch-row is re-generated by the next canvas
    # row — the reference crop protocol, utils.py:364-377); the last row
    # keeps everything. All shapes static, so assembly is pure reshapes.
    kept_cols = (gw - 1) * P
    bands = []
    if steps_h > 1:
        bands.append(_assemble_band(subs[:-1], (gh - 1) * P, kept_cols, as_uint8))
    bands.append(_assemble_band(subs[-1:], gh * P, kept_cols, as_uint8))
    canvas = jnp.concatenate(bands, axis=1) if len(bands) > 1 else bands[0]
    if not as_uint8:
        # honor wire='f32' (the grouped path paints into an f32 canvas;
        # returning the generator's bf16 here would hand callers an
        # ml_dtypes array that numpy reductions silently accumulate in)
        canvas = canvas.astype(jnp.float32)
    return canvas[:, :out_h, :out_w, :]


@functools.partial(jax.jit, static_argnames=("kept_rows", "kept_cols", "as_uint8"))
def _trim_rows(subs_g, kept_rows: int, kept_cols: int, as_uint8: bool = False):
    """Device-side overlap trimming: drop each sub-image's re-generated
    right patch-column and each canvas row's re-generated bottom patch-row
    BEFORE they cross the (slow) device->host wire — the kept regions tile
    the canvas exactly, so this transfers 1x the canvas instead of
    ~(gh*gw)/((gh-1)*(gw-1))x. ``as_uint8`` additionally quantizes on
    device (4x fewer bytes; byte-identical to the host save path).
    subs_g (n_rows, steps_w, N, gh*P, gw*P, C) ->
    main (n_rows, steps_w, N, kept_rows, kept_cols, C),
    tail (n_rows, N, kept_rows, gw*P - kept_cols, C)."""
    main = subs_g[:, :, :, :kept_rows, :kept_cols]
    tail = subs_g[:, -1, :, :kept_rows, kept_cols:]
    if as_uint8:
        main, tail = _to_uint8_dev(main), _to_uint8_dev(tail)
    return main, tail


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
    row_group: Optional[int] = None,
    wire: str = "f32",
) -> np.ndarray:
    """Raster-scan patch-by-patch generation of an (out_h, out_w) canvas.

    Returns a host numpy array (N, out_h, out_w, img_ch) — float32 in
    [-1, 1] for ``wire='f32'`` (exact: what the device computed), uint8 for
    ``wire='u8'`` (quantized ON DEVICE with the save-CLI mapping; 4x less
    device->host traffic — the wire, not the device, bounds inference wall
    time on a tunneled host, docs/PERF.md).
    ``z_full``/``maps_full`` may be passed explicitly (e.g. to compare with
    the one-pass oracle); otherwise they are drawn from ``key``.
    ``row_group=None`` (default) generates the WHOLE canvas — scan, overlap
    trimming, assembly, quantization, crop — in one device dispatch and one
    device->host transfer (the reference pays one forward + .cpu() per
    SUB-IMAGE, utils.py:360). Pass an integer to dispatch that many canvas
    rows at a time instead (bounds the device working set for canvases
    whose sub-image stack would not fit in HBM; sampling/stream.py
    additionally keeps the HOST at O(band)).
    """
    if wire not in ("f32", "u8"):
        raise ValueError(f"wire must be 'f32' or 'u8', got {wire!r}")
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

    as_uint8 = wire == "u8"
    if row_group is None:
        out = _canvas_dispatch(
            gen, variables, z_full, maps_full, halo, steps_h, steps_w,
            maps_full is not None, as_uint8,
            output_resolution_height, output_resolution_width,
        )
        if progress:
            print(
                f"  {steps_h}x{steps_w} sub-images in one dispatch",
                flush=True,
            )
        return np.asarray(out)

    kept_cols = (gw - 1) * P
    canvas_dev = jnp.zeros(
        (num_images, tot_h * P, tot_w * P, gen.img_ch),
        dtype=jnp.uint8 if as_uint8 else jnp.float32,
    )

    for r0, n, kept_rows in dispatch_groups(steps_h, gh, P, row_group):
        subs_g, halo = _row_group_scan(
            gen, variables, z_full, maps_full, halo, jnp.int32(r0),
            steps_w, n, maps_full is not None,
        )
        canvas_dev = _paint_group(
            canvas_dev, subs_g, jnp.int32(r0), kept_rows, kept_cols,
            as_uint8, (gh - 1) * P,
        )
        if progress:
            print(
                f"  rows {r0 + 1}-{r0 + n}/{steps_h} "
                f"({steps_w} sub-images each) dispatched",
                flush=True,
            )

    # crop on device, then ONE device->host transfer of the finished canvas
    out = canvas_dev[:, :output_resolution_height, :output_resolution_width, :]
    return np.asarray(out)


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
