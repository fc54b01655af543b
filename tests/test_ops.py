"""Unit tests for patch-grid ops and local padding primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_texture_gans_tpu.ops.grid import (
    crop_images,
    grid_to_patches,
    patches_to_grid,
    upsample_nearest,
)
from infinite_texture_gans_tpu.ops.padding import local_pad


def test_grid_roundtrip():
    x = jnp.arange(2 * 12 * 15 * 4, dtype=jnp.float32).reshape(2, 12, 15, 4)
    p = grid_to_patches(x, 3, 5)
    assert p.shape == (2 * 15, 4, 3, 4)
    back = patches_to_grid(p, 3, 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patch_order_row_major():
    # patch (r, c) of image k must be batch entry k*gh*gw + r*gw + c
    # (reference utils.py:600-611 row-major order).
    gh, gw, h, w = 2, 3, 2, 2
    x = jnp.stack(
        [jnp.full((gh * h, gw * w, 1), k, dtype=jnp.float32) for k in range(2)]
    )
    x = x + jnp.arange(gh * h)[None, :, None, None] * 100
    x = x + jnp.arange(gw * w)[None, None, :, None]
    p = grid_to_patches(x, gh, gw)
    # entry r*gw + c should contain rows [r*h, (r+1)*h), cols [c*w, (c+1)*w)
    for r in range(gh):
        for c in range(gw):
            expect = np.asarray(x[0, r * h : (r + 1) * h, c * w : (c + 1) * w, :])
            np.testing.assert_array_equal(np.asarray(p[r * gw + c]), expect)


def test_crop_images_overlap():
    x = jnp.arange(1 * 6 * 6 * 1, dtype=jnp.float32).reshape(1, 6, 6, 1)
    # size 4 stride 2 -> 2x2 overlapping windows
    crops = crop_images(x, 4, 4, 2)
    assert crops.shape == (4, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(crops[0]), np.asarray(x[0, 0:4, 0:4, :]))
    np.testing.assert_array_equal(np.asarray(crops[1]), np.asarray(x[0, 0:4, 2:6, :]))
    np.testing.assert_array_equal(np.asarray(crops[3]), np.asarray(x[0, 2:6, 2:6, :]))


def test_upsample_nearest():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = upsample_nearest(x, 2)
    expect = np.array(
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], dtype=np.float32
    ).reshape(1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(y), expect)


def test_local_pad_replicate_and_constant():
    x = jnp.arange(1 * 2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
    rep = local_pad(x, 1, "replicate")
    assert rep.shape == (1, 4, 4, 1)
    assert rep[0, 0, 0, 0] == x[0, 0, 0, 0]
    con = local_pad(x, 1, "constant")
    assert con[0, 0, 0, 0] == 0.0


def test_local_pad_conv_equals_per_patch_neighbor_padding():
    """The correctness definition of training-mode local padding
    (SURVEY.md §4.3): a valid conv on the outer-padded merged grid equals,
    patch for patch, a valid conv on each patch padded with its neighbours'
    border pixels."""
    key = jax.random.key(0)
    gh = gw = 3
    h = w = 4
    c_in, c_out = 3, 5
    x = jax.random.normal(key, (2, gh * h, gw * w, c_in))
    kernel = jax.random.normal(jax.random.key(1), (3, 3, c_in, c_out))

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, kernel, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    merged_out = jax.jit(lambda x: conv(local_pad(x, 1, "replicate")))(x)

    # per-patch: crop overlapping (h+2, w+2) windows of the padded merged grid
    padded = local_pad(x, 1, "replicate")
    for r in range(gh):
        for cc in range(gw):
            window = padded[:, r * h : r * h + h + 2, cc * w : cc * w + w + 2, :]
            patch_out = jax.jit(conv)(window)
            np.testing.assert_allclose(
                np.asarray(patch_out),
                np.asarray(merged_out[:, r * h : (r + 1) * h, cc * w : (cc + 1) * w, :]),
                rtol=1e-5,
                atol=1e-5,
            )
