"""Analytic FLOPs model (utils/flops.py) sanity: hand-computed small cases
plus agreement with XLA's own HLO cost analysis (within the tolerance set by
XLA also counting elementwise ops and padding-position conventions)."""

import jax
import jax.numpy as jnp
import pytest

from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.utils import flops as F


def test_conv2d_flops_hand():
    # 3x3 conv, 4 -> 8 channels, 16x16 output: 2 * 4*8*9 * 256
    assert F.conv2d_flops(4, 8, 3, 16, 16) == 2 * 4 * 8 * 9 * 256


def test_generator_flops_scale_with_batch_and_grid():
    G = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False,
        type_norm="BN", padding_mode="local",
    )
    one = F.generator_forward_flops(G, num_images=1)
    assert F.generator_forward_flops(G, num_images=3) == 3 * one
    # a 6x6 grid has 4x the patches of 3x3 -> 4x the conv FLOPs
    assert F.generator_forward_flops(G, num_images=1, gh=6, gw=6) == 4 * one


def test_generator_flops_vs_xla_cost_analysis():
    G = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True,
        type_norm="BN", padding_mode="local", chw_tail="off",
    )
    z = jnp.zeros((2, 14, 14, 16))
    v = G.init(jax.random.key(0), z, train=False)
    c = jax.jit(lambda v, z: G.apply(v, z, train=False)[0]).lower(v, z).compile()
    ca = c.cost_analysis()
    xla = ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]
    mine = F.generator_forward_flops(G, num_images=2)
    assert mine == pytest.approx(xla, rel=0.15)


def test_generator_flops_vs_xla_cost_analysis_ssm():
    G = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False,
        type_norm="SSM", map_dim=2, padding_mode="local", chw_tail="off",
    )
    from infinite_texture_gans_tpu.sampling.latents import (
        build_maps_full,
        build_z_full,
    )

    z = build_z_full(jax.random.key(0), 1, 16, 4, 3, 3)
    maps = build_maps_full(jax.random.key(1), 1, 2, 4, 4, 3, 3)
    v = G.init(jax.random.key(0), z, maps, train=False)
    c = (
        jax.jit(lambda v, z, m: G.apply(v, z, m, train=False)[0])
        .lower(v, z, maps)
        .compile()
    )
    ca = c.cost_analysis()
    xla = ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]
    mine = F.generator_forward_flops(G, num_images=1)
    assert mine == pytest.approx(xla, rel=0.15)


def test_discriminator_flops_vs_xla_cost_analysis():
    D = PatchDiscriminator(base_ch=16, n_layers_D=3)
    x = jnp.zeros((4, 48, 48, 3))
    v = D.init(jax.random.key(0), x, train=False)
    c = jax.jit(lambda v, x: D.apply(v, x, train=False)).lower(v, x).compile()
    ca = c.cost_analysis()
    xla = ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]
    mine = F.discriminator_forward_flops(D, 48, 48, 4)
    assert mine == pytest.approx(xla, rel=0.15)


def test_train_step_flops_composition():
    G = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False,
        type_norm="BN", padding_mode="local",
    )
    D = PatchDiscriminator(base_ch=16, n_layers_D=3)
    g = F.generator_forward_flops(G, num_images=2)
    P = G.patch_resolution
    dr = F.discriminator_forward_flops(D, 48, 48, 4)
    df = F.discriminator_forward_flops(D, 3 * P, 3 * P, 2)
    want = 3 * g + 3 * (dr + df) + 2 * df
    got = F.train_step_flops(G, D, batch_size=4, crop=48, num_images=2)
    assert got == want
    # disc_iters=2 adds one fwd-only G sample and one more D update
    got2 = F.train_step_flops(
        G, D, batch_size=4, crop=48, num_images=2, disc_iters=2
    )
    assert got2 == want + g + 3 * (dr + df)


def test_canvas_flops_step_count():
    G = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False,
        type_norm="BN", padding_mode="local",
    )
    one = F.generator_forward_flops(G, num_images=1)
    P = G.patch_resolution  # 32
    # 1024/32 = 32 patches -> steps = ceil(31/2) = 16 per dim
    assert F.canvas_flops(G, 1024, 1024) == 16 * 16 * one


def test_peak_flops_lookup():
    class Dev:
        device_kind = "TPU v5 lite"

    assert F.peak_flops(Dev()) == 197e12
    assert F.peak_flops(Dev(), "float32") == 197e12 / 2

    class Dev5p:
        device_kind = "TPU v5"

    assert F.peak_flops(Dev5p()) == 459e12

    class Cpu:
        device_kind = "cpu"

    assert F.peak_flops(Cpu()) is None
