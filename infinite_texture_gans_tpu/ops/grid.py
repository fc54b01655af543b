"""Patch-grid layout transforms (NHWC).

The reference keeps activations as a batch of patches and round-trips
patches<->merged image around every convolution with python loops of
``torch.cat`` (reference utils.py:577-613 merge_patches_into_image,
utils.py:658-742 crop_images — its hot inner loop). Here the canonical layout
is the *merged* grid ``(N, gh*H, gw*W, C)``; the patch view
``(N*gh*gw, H, W, C)`` is a pure reshape/transpose used only where an op is
genuinely per-patch (self-attention, final output assembly). XLA compiles
these to free layout changes or cheap copies — no host loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def patches_to_grid(patches: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(N*gh*gw, H, W, C) row-major patches -> merged (N, gh*H, gw*W, C).

    Row-major patch order matches the reference (utils.py:600-611): patch
    ``k*gh*gw + r*gw + c`` sits at grid row r, col c of image k.
    """
    n = patches.shape[0] // (gh * gw)
    h, w, c = patches.shape[1:]
    x = patches.reshape(n, gh, gw, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, gh * h, gw * w, c)


def grid_to_patches(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Merged (N, gh*H, gw*W, C) -> (N*gh*gw, H, W, C) row-major patches."""
    n, hm, wm, c = x.shape
    h, w = hm // gh, wm // gw
    x = x.reshape(n, gh, h, gw, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * gh * gw, h, w, c)


def merge_patches_into_image(
    patches: jnp.ndarray, num_rows: int = 3, num_cols: int = 3
) -> jnp.ndarray:
    """API-parity alias of :func:`patches_to_grid` (reference utils.py:577)."""
    return patches_to_grid(patches, num_rows, num_cols)


def crop_images(
    img: jnp.ndarray,
    cropping_size_h: int,
    cropping_size_w: int,
    stride: int,
) -> jnp.ndarray:
    """Sliding-window crop of (N, H, W, C) into (N*P, ch, cw, C) patches.

    Equivalent of reference utils.py:658-742 (there: a python while-loop of
    ``torch.cat`` per crop). Overlapping windows (stride < size) are gathered
    with a single strided slice per window offset; XLA fuses the stack.
    """
    n, img_h, img_w, c = img.shape
    rows = (img_h - cropping_size_h) // stride + 1
    cols = (img_w - cropping_size_w) // stride + 1
    crops = []
    for r in range(rows):
        for cc in range(cols):
            crops.append(
                img[
                    :,
                    r * stride : r * stride + cropping_size_h,
                    cc * stride : cc * stride + cropping_size_w,
                    :,
                ]
            )
    # (rows*cols, N, h, w, C) -> (N, rows*cols, h, w, C) -> (N*P, h, w, C)
    out = jnp.stack(crops, axis=1)
    return out.reshape(n * rows * cols, cropping_size_h, cropping_size_w, c)


def crop_image(
    img: jnp.ndarray,
    cropping_size_h: int,
    cropping_size_w: int,
    stride: int,
) -> jnp.ndarray:
    """Single-image variant of :func:`crop_images` (reference utils.py:715-742):
    (H, W, C) -> (P, ch, cw, C)."""
    return crop_images(img[None], cropping_size_h, cropping_size_w, stride)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample of merged NHWC activations.

    Equivalent of ``nn.Upsample(scale_factor=2, mode='nearest')``
    (reference models/generators.py:52). Implemented as reshape+broadcast so
    XLA lowers it to a layout change + broadcast rather than a gather.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)
