"""Local padding — the core op of the framework — as pure functions.

Background (reference models/layers.py:38-173): every 3x3 conv in the
generator pads each patch with the border pixels of its *neighbouring*
patches instead of zeros, so patches tile seamlessly. The reference does this
by merging the patch batch into an image, outer-padding the border, and
re-cropping overlapping patches; at inference four mutable "padding variable"
tensors per conv carry borders of already-generated regions into the next
generation step (models/layers.py:70-143).

TPU-native formulation used here:

* Training / one-pass: local padding of a merged grid is *identical* to an
  edge-padded ("replicate") convolution on the merged image — interior patch
  halos are neighbour borders by construction. :func:`local_pad` is one
  ``jnp.pad``; the conv that follows is a plain valid conv. No data movement.

* Stateful patch-by-patch inference: the halo cache becomes an explicit
  functional :class:`SiteState` per conv site, carried through ``lax.scan``:

  - ``v``        (N, gh*H, 1, C): the column immediately left of the current
    sub-image (reference ``vertical_padding_variable``, the merged column at
    index (gw-1)*W - 1 of the previous step, models/layers.py:113).
  - ``row_read`` (N, 1, Wtot+2, C): full-canvas-width bottom-edge row written
    by the *previous* row of sub-images (reference accumulates this on CPU
    with growing torch.cat, models/layers.py:117-132; here it is a fixed
    canvas-coordinate buffer updated with ``dynamic_update_slice``). Index 0
    is canvas column -1, pre-filled by :func:`finalize_row` according to the
    outer padding mode, so reads at canvas offset (gw-1)*W*c - 1 need no
    branching.
  - ``row_write`` (N, 1, Wtot+2, C): the buffer being accumulated by the
    *current* row (the merged row at index (gh-1)*H - 1 of every step).
    Overlapping writes are last-writer-wins, which reproduces the reference's
    keep-left-(gw-1)-patches protocol exactly.

All grid positions compile to ONE program: the reference's 4-way branch on
``image_location`` strings (models/layers.py:78-101) becomes ``jnp.where``
on traced ``first_row`` / ``first_col`` flags.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import lax


class SiteSpec(NamedTuple):
    """Static description of one local-padding conv site in the generator."""

    name: str
    patch_res: int  # patch H (== W) in pixels at this site
    channels: int  # channels of the activation *entering* the padder


class SiteState(NamedTuple):
    """Functional halo cache for one conv site (see module docstring)."""

    v: jnp.ndarray  # (N, gh*H, 1, C)
    row_read: jnp.ndarray  # (N, 1, Wtot+2, C)
    row_write: jnp.ndarray  # (N, 1, Wtot+2, C)


class GridPos(NamedTuple):
    """Traced position of the current sub-image in the canvas raster.

    Replaces the reference's ``image_location`` string tags
    (utils.py:321-337). ``last_*`` flags are not needed on-device: cropping
    of re-generated patches happens on the host, and the always-write-full-
    width row-buffer protocol makes the last-column special case vanish.
    """

    col: jnp.ndarray  # int32 scalar, sub-image column index c
    first_row: jnp.ndarray  # bool scalar
    first_col: jnp.ndarray  # bool scalar


def local_pad(x: jnp.ndarray, pad: int = 1, outer_padding: str = "replicate") -> jnp.ndarray:
    """Outer-pad a merged grid; interior halos are already neighbour borders.

    Training-mode equivalent of the reference merge->F.pad->overlap-crop
    (models/layers.py:81-82 + 145-173): an edge/zero pad of the merged image
    followed by a valid conv produces exactly the per-patch locally-padded
    convs.
    """
    mode = "edge" if outer_padding == "replicate" else "constant"
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)


def _outer_col(x_edge: jnp.ndarray, outer_padding: str) -> jnp.ndarray:
    if outer_padding == "replicate":
        return x_edge
    return jnp.zeros_like(x_edge)


def halo_pad_step(
    x: jnp.ndarray,
    site: SiteState,
    pos: GridPos,
    gh: int,
    gw: int,
    outer_padding: str = "replicate",
) -> tuple[jnp.ndarray, SiteState]:
    """Assemble the padded input for one sub-image step and update the cache.

    Args:
      x: merged activation (N, gh*H, gw*W, C) for the current sub-image.
      site: halo cache for this conv site.
      pos: traced canvas position of the sub-image.

    Returns:
      (padded (N, gh*H+2, gw*W+2, C), updated SiteState).

    Semantics verified against the reference 4-branch ``padding()`` +
    ``update_padding_variables`` (models/layers.py:78-143); the end-to-end
    correctness definition is equality with the one-pass oracle (tests).
    """
    n, hm, wm, c = x.shape
    h, w = hm // gh, wm // gw

    # --- assemble padded input ------------------------------------------
    # Left column: own edge (replicate/zeros) at the canvas border, else the
    # cached neighbour column from the previous step in this row.
    left = jnp.where(pos.first_col, _outer_col(x[:, :, :1, :], outer_padding), site.v)
    right = _outer_col(x[:, :, -1:, :], outer_padding)
    tmp = jnp.concatenate([left, x, right], axis=2)  # (N, Hm, Wm+2, C)

    bottom = _outer_col(tmp[:, -1:, :, :], outer_padding)
    # Top row: read (1, Wm+2) from the previous-row buffer at canvas columns
    # [(gw-1)*W*c - 1, (gw-1)*W*c + Wm + 1); buffer index 0 = canvas col -1.
    offset = (gw - 1) * w * pos.col
    read = lax.dynamic_slice_in_dim(site.row_read, offset, wm + 2, axis=2)
    top = jnp.where(pos.first_row, _outer_col(tmp[:, :1, :, :], outer_padding), read)
    padded = jnp.concatenate([top, tmp, bottom], axis=1)  # (N, Hm+2, Wm+2, C)

    # --- update halo cache ----------------------------------------------
    # Column left of the *next* step in this row: merged col (gw-1)*W - 1.
    v_new = x[:, :, (gw - 1) * w - 1 : (gw - 1) * w, :]
    # Bottom-edge row for the *next* row of sub-images: merged row
    # (gh-1)*H - 1, written full-width at its canvas offset. Overlap with the
    # next step's write is overwritten (last-writer-wins == reference keep
    # protocol, models/layers.py:115-132).
    row_slice = x[:, (gh - 1) * h - 1 : (gh - 1) * h, :, :]
    row_write = lax.dynamic_update_slice_in_dim(
        site.row_write, row_slice, offset + 1, axis=2
    )
    return padded, SiteState(v=v_new, row_read=site.row_read, row_write=row_write)


def init_halo_state(
    specs: Sequence[SiteSpec],
    num_images: int,
    gh: int,
    gw: int,
    total_patches_w: int,
    dtype=jnp.float32,
) -> dict[str, SiteState]:
    """Zero-initialised halo cache for a canvas of ``total_patches_w`` columns."""
    state = {}
    for spec in specs:
        h = spec.patch_res
        wtot = total_patches_w * spec.patch_res
        state[spec.name] = SiteState(
            v=jnp.zeros((num_images, gh * h, 1, spec.channels), dtype),
            row_read=jnp.zeros((num_images, 1, wtot + 2, spec.channels), dtype),
            row_write=jnp.zeros((num_images, 1, wtot + 2, spec.channels), dtype),
        )
    return state


def finalize_row(state: SiteState, outer_padding: str = "replicate") -> SiteState:
    """Fill the canvas-border cells of a completed row buffer.

    Reference: the accumulated horizontal slice is replicate-padded by one on
    each side before consumption (models/layers.py:126). For 'constant' outer
    padding the zero init already has the right value.
    """
    buf = state.row_write
    if outer_padding == "replicate":
        buf = buf.at[:, :, 0, :].set(buf[:, :, 1, :])
        buf = buf.at[:, :, -1, :].set(buf[:, :, -2, :])
    return SiteState(v=state.v, row_read=state.row_read, row_write=buf)


def rotate_rows(state: SiteState) -> SiteState:
    """Start a new canvas row: consumed buffer <- accumulated buffer.

    Host-side pytree shuffle (zero copies); equivalent of the reference's
    ``for_current_row <- for_next_row`` handover (models/layers.py:125-129).
    """
    return SiteState(
        v=state.v,
        row_read=state.row_write,
        row_write=jnp.zeros_like(state.row_write),
    )
