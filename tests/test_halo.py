"""Halo-cache state machine tests: stateful patch-by-patch generation must
equal one single pass of the generator over the whole canvas (the identity
local padding exists to achieve; SURVEY.md §4.2/4.5). Covers 1x1, 1xN, Nx1,
NxM step grids (all nine reference image_location classes), both norms and
both outer padding modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.sampling.infinite import (
    canvas_geometry,
    generate_canvas,
    generate_one_pass,
)


def make_gen(**kw):
    cfg = dict(
        z_dim=16,
        G_ch=8,
        base_res=4,
        n_layers_G=4,
        attention=True,
        img_ch=3,
        type_norm="BN",
        padding_mode="local",
        outer_padding="replicate",
    )
    cfg.update(kw)
    return ResidualPatchGenerator(**cfg)


def init_gen(gen, key=0):
    z = jnp.zeros(
        (1, gen.num_patches_h * gen.base_res + 2, gen.num_patches_w * gen.base_res + 2, gen.z_dim)
    )
    maps = None
    if gen.type_norm == "SSM":
        maps = latents.build_train_maps(
            jax.random.key(123), 1, gen.map_dim, gen.n_layers_G, gen.base_res,
            gen.num_patches_h, gen.num_patches_w,
        )
    return jax.jit(lambda z, m: gen.init(jax.random.key(key), z, m, train=True))(z, maps)


def check_canvas_equals_one_pass(gen, out_h, out_w, atol=2e-4):
    variables = init_gen(gen)
    P = gen.patch_resolution
    gh, gw = gen.num_patches_h, gen.num_patches_w
    _, _, tot_h, tot_w = canvas_geometry(out_h, out_w, P, gh, gw)

    key = jax.random.key(7)
    zk, mk = jax.random.split(key)
    z_full = latents.build_z_full(zk, 1, gen.z_dim, gen.base_res, tot_h, tot_w)
    maps_full = None
    if gen.type_norm == "SSM":
        maps_full = latents.build_maps_full(
            mk, 1, gen.map_dim, gen.n_layers_G, gen.base_res, tot_h, tot_w
        )

    canvas = generate_canvas(
        gen, variables, key, out_h, out_w, num_images=1,
        z_full=z_full, maps_full=maps_full,
    )
    oracle = generate_one_pass(gen, variables, z_full, maps_full, tot_h, tot_w)
    oracle = np.asarray(oracle)[:, :out_h, :out_w, :]
    np.testing.assert_allclose(canvas, oracle, atol=atol, rtol=1e-4)


def test_single_step_canvas():
    gen = make_gen()
    # 96 = 3x32 -> exactly one 3x3 sub-image (1st_row_last_row_1st_col_last_col)
    check_canvas_equals_one_pass(gen, 96, 96)


def test_one_row_canvas():
    gen = make_gen()
    # height one step, width three steps (1st_row_last_row x col classes)
    check_canvas_equals_one_pass(gen, 96, 96 + 4 * 64)


def test_one_col_canvas():
    gen = make_gen()
    check_canvas_equals_one_pass(gen, 96 + 4 * 64, 96)


def test_grid_canvas():
    gen = make_gen()
    # 3x3 steps -> exercises all nine location classes
    check_canvas_equals_one_pass(gen, 96 + 2 * 64, 96 + 2 * 64)


def test_grid_canvas_constant_outer_padding():
    gen = make_gen(outer_padding="constant")
    check_canvas_equals_one_pass(gen, 96 + 64, 96 + 64)


def test_grid_canvas_ssm():
    gen = make_gen(type_norm="SSM", map_dim=2)
    check_canvas_equals_one_pass(gen, 96 + 64, 96 + 64)


def test_grid_canvas_no_attention_5_layers():
    gen = make_gen(attention=False, n_layers_G=5)
    # patch res 64; 2x2 steps
    check_canvas_equals_one_pass(gen, 192 + 64, 192 + 64)


def test_six_layer_exactness_with_inactive_attention():
    """n_layers_G=6 (the Exp-1 depth) halo scan is bit-exact vs one-pass as
    long as the attention gate is inactive (gamma=0, its init value). With
    gamma != 0 a small deviation is INHERENT to the reference algorithm (the
    per-patch attention spreads sub-image edge-padding contamination into the
    cached halo column — see PARITY.md), so exactness is only guaranteed for
    the pure local-padding pathway."""
    import jax
    import jax.numpy as jnp

    from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
    from infinite_texture_gans_tpu.sampling.infinite import (
        generate_canvas,
        generate_one_pass,
    )
    from infinite_texture_gans_tpu.sampling.latents import build_z_full

    gen = ResidualPatchGenerator(
        z_dim=8, G_ch=8, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    z3 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z3)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    P = gen.patch_resolution  # 128
    z5 = build_z_full(jax.random.key(1), 1, 8, 4, 5, 5)
    pbp = generate_canvas(
        gen, variables, jax.random.key(0), 5 * P, 5 * P, num_images=1, z_full=z5
    )
    onep = np.asarray(generate_one_pass(gen, variables, z5, None, 5, 5))
    np.testing.assert_allclose(pbp, onep, atol=5e-5, rtol=1e-4)


def test_non_multiple_output_resolution():
    gen = make_gen()
    # output not a multiple of the patch size -> final crop path
    check_canvas_equals_one_pass(gen, 100, 150)


def test_one_dispatch_matches_grouped_engine():
    """The fused one-dispatch engine (row_group=None: scan + trim + assembly
    + quantize + crop inside ONE jit) must be bit-identical to the grouped
    painter path for both wires, including a non-multiple final crop."""
    gen = make_gen()
    variables = init_gen(gen)
    out_h, out_w = 96 + 2 * 64, 100  # 3x1 steps, cropped width
    _, _, tot_h, tot_w = canvas_geometry(
        out_h, out_w, gen.patch_resolution, gen.num_patches_h, gen.num_patches_w
    )
    z_full = latents.build_z_full(
        jax.random.key(3), 1, gen.z_dim, gen.base_res, tot_h, tot_w
    )
    for wire in ("f32", "u8"):
        fused = generate_canvas(
            gen, variables, jax.random.key(0), out_h, out_w,
            num_images=1, z_full=z_full, wire=wire,
        )
        for rg in (1, 2):
            grouped = generate_canvas(
                gen, variables, jax.random.key(0), out_h, out_w,
                num_images=1, z_full=z_full, wire=wire, row_group=rg,
            )
            np.testing.assert_array_equal(fused, grouped)


def test_f32_wire_returns_float32_for_bf16_net():
    """wire='f32' must hand the host a float32 canvas even when the net
    computes in bfloat16 (regression: the one-dispatch engine returned the
    generator dtype, and numpy reductions on an ml_dtypes bfloat16 canvas
    accumulate in bf16 — a measured 1024^2 seam/natural ratio moved from
    0.96 to ~116 purely from the dtype)."""
    gen = make_gen(dtype=jnp.bfloat16)
    variables = init_gen(gen)
    for rg in (None, 1):
        out = generate_canvas(
            gen, variables, jax.random.key(0), 96, 96, num_images=1, row_group=rg
        )
        assert out.dtype == np.float32, (rg, out.dtype)
