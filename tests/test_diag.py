"""Batched-diagonal single-chip engine (sampling/diag.py): equality with the
sequential raster engine across lane counts, ragged schedules, SSM, and the
u8 wire. Same correctness definition as the wavefront (the engines differ
only in scheduling, not numerics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.sampling.diag import generate_canvas_diag
from infinite_texture_gans_tpu.sampling.infinite import generate_canvas
from infinite_texture_gans_tpu.sampling.latents import build_maps_full, build_z_full


def tiny_gen(**kw):
    cfg = dict(
        z_dim=8, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    cfg.update(kw)
    return ResidualPatchGenerator(**cfg)


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = tiny_gen()
    z = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z)
    return gen, {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }


@pytest.mark.parametrize("lanes", [1, 2, 3])
def test_diag_matches_sequential_ragged(gen_and_vars, lanes):
    """5x4-step canvas: lanes=1 degenerates to the sequential schedule,
    lanes=2 exercises multi-cycle rows (n_rows_max=3, ragged tail), lanes=3
    a ragged cyclic assignment."""
    gen, variables = gen_and_vars
    P = gen.patch_resolution  # 32
    out_h, out_w = 11 * P, 9 * P  # 5 x 4 steps
    z = build_z_full(jax.random.key(7), 1, 8, 4, 11, 9)
    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_diag(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1,
        lanes=lanes, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_diag_ssm_and_u8_wire():
    """SSM maps thread through the lane scan; the u8 wire quantizes on
    device byte-identically to the sequential engine's."""
    gen = tiny_gen(type_norm="SSM", map_dim=1)
    z0 = jnp.zeros((1, 14, 14, 8))
    m0 = [jnp.zeros((1, r * 3 + 4, r * 3 + 4, 1)) for r in (4, 8, 16, 32)]
    variables = jax.jit(
        lambda z, m: gen.init(jax.random.key(0), z, m, train=True)
    )(z0, m0)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    P = gen.patch_resolution
    out_h, out_w = 7 * P, 7 * P  # 3 x 3 steps
    z = build_z_full(jax.random.key(3), 1, 8, 4, 7, 7)
    maps = build_maps_full(jax.random.key(4), 1, 1, 4, 4, 7, 7)
    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1,
        z_full=z, maps_full=maps, wire="u8",
    )
    out = generate_canvas_diag(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1,
        lanes=2, z_full=z, maps_full=maps, wire="u8",
    )
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)


def test_diag_rejects_narrow_grid(gen_and_vars):
    gen, variables = gen_and_vars
    gen2 = gen.clone(num_patches_w=2)
    with pytest.raises(ValueError, match="num_patches_w >= 3"):
        generate_canvas_diag(gen2, variables, jax.random.key(0), 64, 64)
