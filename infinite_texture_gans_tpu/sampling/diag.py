"""Batched-diagonal canvas engine: wavefront parallelism on ONE chip.

The raster dependency of patch-by-patch generation (SURVEY.md §3.2 /
reference utils.py:317-337: sub-image (r, c) needs the halo written by
(r, c-1) and, at lag 2, by row r-1) admits anti-diagonal parallelism. The
multi-chip wavefront (:mod:`parallel.wavefront`) exploits it ACROSS devices;
this module exploits it WITHIN one device as MXU batching: ``lanes`` canvas
rows advance together as a ``jax.vmap`` batch axis over the generator, and
the per-step ``ppermute`` halo exchange becomes a ``jnp.roll`` on that axis.

The hypothesis was that batching wins device time: the sequential engine
runs one sub-image per scan step (batch ``num_images`` = 1 for the CLI),
so with L lanes every op runs at batch ``L*num_images`` while the step
count drops to roughly ``ceil(steps_h/L)*steps_w`` (the v3 cyclic schedule
of :func:`parallel.wavefront.schedule_constants`). **Measured on v5e it
does not win** (docs/PERF.md "Batched-diagonal engine"): the channels-major
Pallas tail is already MXU-efficient at batch 1, and the lane axis costs
XLA relayout copies plus schedule fill slots — 4096² Exp-1 traced 307 ms
(lanes=4) vs 287 ms sequential; a small-patch (P=32) model at 2048² traced
415 ms (lanes=8) vs 317 ms. The engine is kept as the correctness-proven
single-chip realization of the wavefront schedule — the profitable program
on hardware where batch-1 occupancy, not layout, is the bottleneck.

Equality with :func:`sampling.infinite.generate_canvas` is exact (same
numerics — vmap does not change per-lane arithmetic): asserted by
``tests/test_diag.py`` on the CPU f32 path. The lag-2 legality condition is
the same as the wavefront's (``num_patches_w >= 3``).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.ops.padding import (
    GridPos,
    SiteState,
    finalize_row,
    init_halo_state,
)
from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.sampling.infinite import (
    _assemble_band,
    canvas_geometry,
)


def _schedule_constants(steps_w: int, steps_h: int, lanes: int):
    """The v3 cyclic wavefront schedule (parallel/wavefront.py), imported
    lazily — parallel.wavefront itself imports sampling.infinite, and a
    module-level import here would make the sampling package __init__
    circular."""
    from infinite_texture_gans_tpu.parallel.wavefront import schedule_constants

    return schedule_constants(steps_w, steps_h, lanes)


def _bw(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where() with a per-lane (L,) mask broadcast against (L, ...) leaves."""
    return jnp.where(mask.reshape(mask.shape + (1,) * (a.ndim - 1)), a, b)


@functools.partial(jax.jit, static_argnames=(
    "gen", "lanes", "steps_w", "steps_h", "has_maps", "as_uint8",
    "out_h", "out_w", "num_images", "tot_w"))
def _diag_dispatch(gen, variables, z_rows, maps_rows, lanes: int,
                   steps_w: int, steps_h: int, has_maps: bool,
                   as_uint8: bool, out_h: int, out_w: int,
                   num_images: int, tot_w: int):
    """The whole canvas in ONE dispatch, ``lanes`` rows in flight.

    Same static v3 schedule as the multi-chip wavefront (row r starts at
    ``2*(r mod L) + (r div L) * stride``); carries per-lane halo caches plus
    a ``pending`` buffer for each lane's next row, and ships finalized
    bottom-row buffers downstream with a cyclic roll every step."""
    gh, gw, base = gen.num_patches_h, gen.num_patches_w, gen.base_res
    P = gen.patch_resolution
    z_cols = gw * base + latents.Z_PAD
    outer = gen.outer_padding
    stride, total_T, n_rows_max = _schedule_constants(steps_w, steps_h, lanes)

    d = jnp.arange(lanes, dtype=jnp.int32)
    ds = (d - 1) % lanes  # upstream lane (cyclic)

    halo1 = init_halo_state(gen.site_specs(), num_images, gh, gw, tot_w,
                            dtype=gen.dtype)
    halo = jax.tree_util.tree_map(
        lambda x: jnp.zeros((lanes,) + x.shape, x.dtype), halo1
    )
    pending = {name: jnp.zeros_like(s.row_read) for name, s in halo.items()}
    subs = jnp.zeros(
        (lanes, n_rows_max, steps_w, num_images, gh * P, gw * P, gen.img_ch),
        gen.dtype,
    )

    def lane_step(zr, mrs, halo_l, pending_l, ii, cc, r, active, start):
        """One lane's sub-image step (vmapped over the lane axis)."""
        halo_l = {
            name: SiteState(
                v=s.v,
                row_read=jnp.where(start, pending_l[name], s.row_read),
                row_write=jnp.where(start, 0, s.row_write).astype(
                    s.row_write.dtype
                ),
            )
            for name, s in halo_l.items()
        }
        z_sub = lax.dynamic_slice_in_dim(
            lax.dynamic_index_in_dim(zr, ii, 0, keepdims=False),
            cc * (gw - 1) * base, z_cols, axis=2,
        )
        maps_sub = None
        if has_maps:
            maps_sub = [
                lax.dynamic_slice_in_dim(
                    lax.dynamic_index_in_dim(m, ii, 0, keepdims=False),
                    cc * (gw - 1) * (2**k) * base,
                    gw * (2**k) * base + latents.MAP_PAD,
                    axis=2,
                )
                for k, m in enumerate(mrs)
            ]
        pos = GridPos(col=cc, first_row=r == 0, first_col=cc == 0)
        out, halo_new = gen.apply(
            variables, z_sub, maps_sub, train=False, halo=halo_l, pos=pos
        )
        halo_l = jax.tree_util.tree_map(
            lambda old, new: jnp.where(active, new, old), halo_l, halo_new
        )
        sends = {
            name: finalize_row(s, outer).row_write for name, s in halo_l.items()
        }
        return halo_l, sends, jnp.where(active, out, jnp.zeros_like(out))

    lane_step_v = jax.vmap(lane_step)

    def body(carry, t):
        halo, pending, subs = carry
        # --- static-schedule position arithmetic, vectorized over lanes ---
        u = t - 2 * d
        i = jnp.floor_divide(u, stride)
        c = u - i * stride
        r = i * lanes + d
        active = (i >= 0) & (c < steps_w) & (r < steps_h)
        us = t - 2 * ds
        i_s = jnp.floor_divide(us, stride)
        c_s = us - i_s * stride
        r_s = i_s * lanes + ds
        sender_active = (i_s >= 0) & (c_s < steps_w) & (r_s < steps_h)
        r_next = (i + 1) * lanes + d
        start = active & (c == 0)
        cc = jnp.clip(c, 0, steps_w - 1)
        ii = jnp.clip(i, 0, n_rows_max - 1)

        halo, sends, outs = lane_step_v(
            z_rows, maps_rows if has_maps else (), halo, pending,
            ii, cc, r, active, start,
        )
        # inactive lanes scatter out of bounds -> dropped
        subs = subs.at[d, jnp.where(active, ii, n_rows_max), cc].set(
            outs, mode="drop"
        )

        # --- lane halo exchange (the wavefront's ppermute as a roll):
        # lane l's finalized bottom-row buffer goes to lane (l+1) % L. The
        # receiver decides FROM THE SCHEDULE which of its rows the sender is
        # producing: its current row's upstream (live overwrite — lag 2
        # makes the read window final) or its next row's (held in pending
        # until that row starts). -----------------------------------------
        recvs = {name: jnp.roll(buf, 1, axis=0) for name, buf in sends.items()}
        accept_cur = sender_active & active & (r_s == r - 1)
        accept_pend = sender_active & (r_s == r_next - 1)
        halo = {
            name: SiteState(
                v=s.v,
                row_read=_bw(accept_cur, recvs[name], s.row_read),
                row_write=s.row_write,
            )
            for name, s in halo.items()
        }
        pending = {
            name: _bw(accept_pend, recvs[name], buf)
            for name, buf in pending.items()
        }
        return (halo, pending, subs), None

    (_, _, subs), _ = lax.scan(
        body, (halo, pending, subs), jnp.arange(total_T, dtype=jnp.int32)
    )

    # (L, n_rows_max, steps_w, ...) -> raster row order r = i*L + d, then the
    # same trim/assemble/quantize/crop as the sequential one-dispatch engine.
    subs = jnp.transpose(subs, (1, 0) + tuple(range(2, subs.ndim)))
    subs = subs.reshape((lanes * n_rows_max,) + subs.shape[2:])[:steps_h]
    kept_cols = (gw - 1) * P
    bands = []
    if steps_h > 1:
        bands.append(_assemble_band(subs[:-1], (gh - 1) * P, kept_cols, as_uint8))
    bands.append(_assemble_band(subs[-1:], gh * P, kept_cols, as_uint8))
    canvas = jnp.concatenate(bands, axis=1) if len(bands) > 1 else bands[0]
    if not as_uint8:
        canvas = canvas.astype(jnp.float32)
    return canvas[:, :out_h, :out_w, :]


def generate_canvas_diag(
    gen: ResidualPatchGenerator,
    variables,
    key: jax.Array,
    output_resolution_height: int = 384,
    output_resolution_width: int = 384,
    num_images: int = 1,
    lanes: Optional[int] = None,
    z_full: Optional[jnp.ndarray] = None,
    maps_full: Optional[List[jnp.ndarray]] = None,
    wire: str = "f32",
) -> np.ndarray:
    """Batched-diagonal patch-by-patch generation (see module docstring).

    Drop-in equal to :func:`sampling.infinite.generate_canvas` (one dispatch,
    one device->host transfer, same ``wire`` contract) with ``lanes`` canvas
    rows in flight as a vmap batch. ``lanes=None`` picks
    ``min(steps_h, 8)``; ``lanes=1`` degenerates to the sequential schedule.
    """
    if wire not in ("f32", "u8"):
        raise ValueError(f"wire must be 'f32' or 'u8', got {wire!r}")
    P = gen.patch_resolution
    gh, gw = gen.num_patches_h, gen.num_patches_w
    base = gen.base_res
    if gw < 3:
        raise ValueError(
            f"diagonal engine requires num_patches_w >= 3 (got {gw}); the "
            "lag-2 schedule's halo read window would race the row buffer"
        )
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(
        output_resolution_height, output_resolution_width, P, gh, gw
    )
    lanes = min(steps_h, 8) if lanes is None else max(1, min(lanes, steps_h))

    zk, mk = jax.random.split(key)
    if z_full is None:
        z_full = latents.build_z_full(
            zk, num_images, gen.z_dim, base, tot_h, tot_w
        )
    if gen.type_norm == "SSM" and maps_full is None:
        maps_full = latents.build_maps_full(
            mk, num_images, gen.map_dim, gen.n_layers_G, base, tot_h, tot_w
        )
    has_maps = maps_full is not None
    n_maps = len(maps_full) if has_maps else 0

    _, _, n_rows_max = _schedule_constants(steps_w, steps_h, lanes)
    # Per-lane row strips, stacked: lane l gets rows l, l+L, ... (clipped
    # repeats for the ragged tail are computed by an idle lane + discarded).
    per_lane = []
    for l in range(lanes):
        rows = [min(i * lanes + l, steps_h - 1) for i in range(n_rows_max)]
        per_lane.append(
            [latents.row_strips(z_full, maps_full, r, base, gh) for r in rows]
        )
    z_rows = jnp.stack([jnp.stack([z for z, _ in s]) for s in per_lane])
    maps_rows = ()
    if has_maps:
        maps_rows = tuple(
            jnp.stack([jnp.stack([ms[k] for _, ms in s]) for s in per_lane])
            for k in range(n_maps)
        )

    out = _diag_dispatch(
        gen, variables, z_rows, maps_rows, lanes, steps_w, steps_h,
        has_maps, wire == "u8",
        output_resolution_height, output_resolution_width,
        num_images, tot_w,
    )
    return np.asarray(out)
