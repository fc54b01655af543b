"""Config / flag system.

Flag-for-flag equivalent of the reference argparse surface
(reference utils.py:15-132 prepare_parser, plus the sampling CLI flags of
test_sample.py:11-18), so reference command lines work unchanged. The parsed
namespace round-trips through checkpoints (the generator is reconstructed
from the stored config, reference test_sample.py:51-58).

TPU additions (all optional, default off): --mesh for multi-chip layouts
replacing --num_gpus/--gpu_list, --compute_dtype for bfloat16 compute.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict


def prepare_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()

    # data settings
    parser.add_argument('--data', type=str, default='single_image', help='type of data')
    parser.add_argument('--data_path', type=str, default='datasets/241.jpg', help='data path')
    parser.add_argument('--data_ext', type=str, default='jpg', help='data extension txt, png')
    parser.add_argument('--center_crop', type=int, default=None, help='center cropping')
    parser.add_argument('--random_crop', type=int, default=None, help='random cropping')
    parser.add_argument('--resize_h', type=int, default=None, help='resize for h')
    parser.add_argument('--resize_w', type=int, default=None, help='resize for w')
    parser.add_argument('--sampling', type=int, default=8000,
                        help='randomly sample --sampling instances from the training data if not None')

    # models settings
    parser.add_argument('--D_model', type=str, default='patch_GAN',
                        help='Discriminator model: residual_GAN, dcgan, sngan or patch_GAN')
    parser.add_argument('--attention', action='store_true', default=False,
                        help='use attention in the generator')
    parser.add_argument('--img_ch', type=int, default=3,
                        help='number of image channels, 1 grayscale / 3 RGB')
    parser.add_argument('--G_ch', type=int, default=52, help='base channel multiplier for G')
    parser.add_argument('--D_ch', type=int, default=64, help='base channel multiplier for D')
    parser.add_argument('--leak_G', type=float, default=0,
                        help='leaky relu slope in G, 0 uses ReLU')
    parser.add_argument('--leak_D', type=float, default=0,
                        help='leaky relu slope in D, 0 uses ReLU')
    parser.add_argument('--z_dim', type=int, default=128, help='latent dimension')
    parser.add_argument('--map_dim', type=int, default=1,
                        help='modulation map dimension when SSM is used')
    parser.add_argument('--spec_norm_D', default=False, action='store_true',
                        help='spectral normalization in D')
    parser.add_argument('--spec_norm_G', default=False, action='store_true',
                        help='spectral normalization in G')
    parser.add_argument('--n_layers_D', type=int, default=4, help='number of layers in D')
    parser.add_argument('--n_layers_G', type=int, default=6, help='number of layers in G')
    parser.add_argument('--norm_layer_D', type=str, default=None,
                        help='normalization layer in patchGAN (batch, instance)')
    parser.add_argument('--base_res', type=int, default=4, help='base resolution for G')
    parser.add_argument('--padding_mode', type=str, default='zeros',
                        help='padding used in G, zeros or local')
    parser.add_argument('--type_norm_G', type=str, default='BN',
                        help='normalization in G, BN or SSM')

    # optimizers settings
    parser.add_argument('--lr_G', type=float, default=2e-4, help='G learning rate')
    parser.add_argument('--lr_D', type=float, default=2e-4, help='D learning rate')
    parser.add_argument('--beta1', type=float, default=0, help='Adam beta1')
    parser.add_argument('--beta2', type=float, default=0.999, help='Adam beta2')
    parser.add_argument('--batch_size', type=int, default=64, help='discriminator batch size')

    # training settings
    parser.add_argument('--loss', type=str, default='standard',
                        help='loss function: standard, hinge or wgan '
                             '(implemented here; the reference parsed but ignored it, '
                             'hard-coding BCE — reference train.py:81). '
                             'wgan trains WGAN-GP: critic loss + gp_weight * '
                             'gradient penalty on real/fake interpolates')
    parser.add_argument('--gp_weight', type=float, default=10.0,
                        help='WGAN-GP gradient-penalty weight (only with --loss wgan)')
    parser.add_argument('--disc_iters', type=int, default=1,
                        help='D updates per G update')
    parser.add_argument('--epochs', type=int, default=1, help='number of epochs')
    parser.add_argument('--saving_rate', type=int, default=30,
                        help='save checkpoints every saving_rate epochs')
    parser.add_argument('--ema', action='store_true', default=False, help='keep EMA of G weights')
    parser.add_argument('--ema_decay', type=float, default=0.999, help='EMA decay rate')
    parser.add_argument('--decay_lr', type=str, default=None,
                        help='decay the learning rates (exp, step)')
    parser.add_argument('--seed', type=int, default=None,
                        help='None for random seed, fixed for reproduction')
    parser.add_argument('--smooth', default=False, action='store_true', help='smooth labels')

    # patch generation parameters
    parser.add_argument('--num_images', type=int, default=8,
                        help='number of images generated by the generator per step')
    parser.add_argument('--num_patches_width', type=int, default=3,
                        help='patches along the width of the image')
    parser.add_argument('--num_patches_height', type=int, default=3,
                        help='patches along the height of the image')
    parser.add_argument('--outer_padding', type=str, default='replicate',
                        help='border padding of outer patches: replicate or constant (zeros)')
    parser.add_argument('--padding_size', type=int, default=1, help='local padding size')
    parser.add_argument('--conv_reduction', type=int, default=2,
                        help='spatial reduction after the convolution')

    # device settings (GPU flags kept for CLI parity; mapped onto the mesh)
    parser.add_argument('--num_gpus', type=int, default=1,
                        help='number of devices (data-parallel shards)')
    parser.add_argument('--dev_num', type=int, default=0, help='device index when single-device')
    parser.add_argument('--gpu_list', nargs='+', default=None, type=int,
                        help='device indices used when num_gpus > 1')
    parser.add_argument('--num_workers', type=int, default=0, help='data loader workers')

    # folder name
    parser.add_argument('--fname', type=str, default='models_cp', help='folder to save checkpoints')

    # TPU-native additions
    parser.add_argument('--mesh', type=str, default=None,
                        help="device mesh spec, e.g. 'data:8' (overrides --num_gpus)")
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        help='conv compute dtype: float32 or bfloat16')
    parser.add_argument('--chw_tail', type=str, default='auto',
                        help="channels-major Pallas path for small-channel generator "
                             "layers: auto (TPU only, where shapes allow), on, off")
    parser.add_argument('--fuse_up', type=str, default='auto',
                        choices=['auto', 'off'],
                        help='subpixel-fused upsample+conv in the chw-tail ResBlocks '
                             '(training path, BN mode; ops/pallas_conv.py upconv)')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='if set, write a jax profiler trace of a few steps here '
                             '(forces --steps_per_dispatch 1 so the trace stays small)')
    parser.add_argument('--steps_per_dispatch', type=int, default=0,
                        help='single-image runs: train steps fused into one device '
                             'dispatch (lax.scan over the step, crops sampled in-jit). '
                             '0 = auto (largest divisor of steps-per-epoch <= 128); '
                             '1 disables. Identical numerics to per-step dispatch; '
                             'amortizes dispatch latency (docs/PERF.md)')
    parser.add_argument('--resume', type=str, default=None,
                        help='path to a framework checkpoint to resume training from '
                             '(params, optimizer states, EMA, epoch, loss history)')
    parser.add_argument('--platform', type=str, default='auto',
                        choices=['auto', 'cpu', 'tpu'],
                        help='pin the JAX platform (auto = ambient backend); '
                             'cpu lets the CLIs run on hosts without an '
                             'attached accelerator')

    return parser


def prepare_sample_parser() -> argparse.ArgumentParser:
    """Inference CLI flags (reference test_sample.py:11-18)."""
    parser = argparse.ArgumentParser()
    parser.add_argument('--output_resolution_height', type=int, default=384)
    parser.add_argument('--output_resolution_width', type=int, default=384)
    parser.add_argument('--output_name', type=str, default='241_generated.jpg')
    parser.add_argument('--model_path', type=str,
                        default='results/241_lp_bn_outerpadRepl/300__ema.pth')
    parser.add_argument('--tiles', default=False, action='store_true',
                        help='use tiling of the input (zeros-padding baseline)')
    parser.add_argument('--batch', type=int, default=1, help='number of images to generate')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--stream', default=False, action='store_true',
                        help='stream the canvas straight into a PNG: O(band) '
                             'host memory and ~9x less device->host traffic '
                             '(uint8, overlap-trimmed); use for very large '
                             'outputs. Output name must end in .png.')
    parser.add_argument('--row_group', type=int, default=None,
                        help='canvas rows generated per device dispatch. '
                             'Default (None) runs the WHOLE canvas in one '
                             'dispatch, which buffers every sub-image '
                             '(~2.25x the canvas) in device memory; set a '
                             'small value (e.g. 4) to bound device memory '
                             'for very large canvases without --stream.')
    parser.add_argument('--fuse_up', type=str, default='auto',
                        choices=['auto', 'all', 'off'],
                        help="subpixel-fused up-conv kernels at inference: "
                             "'all' runs every chw-tail block's upsample->BN"
                             "->ReLU->conv1 as one half-res Pallas kernel "
                             "with half-res halo caches (faster big-canvas "
                             "generation; output differs from the default "
                             "engine at float-regrouping ~1 LSB scale). "
                             "'auto' (default) keeps inference on the "
                             "unfused bit-exact-oracle kernels.")
    parser.add_argument('--export_pth', type=str, default=None,
                        help='instead of sampling, export the loaded '
                             'generator as a reference-format PyTorch .pth '
                             'checkpoint at this path (loads in the '
                             'reference repo\'s test_sample.py unchanged; '
                             'utils/torch_export.py)')
    parser.add_argument('--diag_lanes', type=int, default=None,
                        help='batched-diagonal engine: run this many canvas '
                             'rows in flight as one vmap batch (the single-'
                             'chip wavefront, sampling/diag.py). Measured at '
                             'device-time parity-to-slower vs the default '
                             'sequential engine on v5e (docs/PERF.md); '
                             'batching under bf16 also regroups floats, so '
                             'its bytes differ at ~1 LSB scale. Omit for the '
                             'default sequential schedule.')
    parser.add_argument('--platform', type=str, default='auto',
                        choices=['auto', 'cpu', 'tpu'],
                        help='pin the JAX platform (auto = ambient backend)')
    parser.add_argument('--mesh', type=str, default=None,
                        help="generate on a device mesh (e.g. 'data:8'): "
                             'canvas rows pipelined across chips with '
                             'ppermute halo exchange (parallel/wavefront.py).'
                             ' With --stream, slabs of rows are dispatched '
                             'and written incrementally (O(slab) memory per '
                             'device — arbitrarily large canvases on a pod).')
    parser.add_argument('--slab_rows', type=int, default=8,
                        help='canvas rows per mesh dispatch for '
                             '--mesh --stream (bounds per-device memory)')
    return parser


def apply_platform(args) -> None:
    """Pin the JAX platform from --platform. Must run before ANY backend
    touch (even jax.devices() initializes it); on hosts whose sitecustomize
    pre-imports jax with a pinned platform, env vars cannot re-pin — only
    jax.config can (CLAUDE.md / docs/PERF.md)."""
    platform = getattr(args, 'platform', 'auto')
    if platform and platform != 'auto':
        import jax

        jax.config.update('jax_platforms', platform)
        if platform == 'cpu':
            # XLA:CPU AOT executables are host-CPU-specific — keep them out
            # of the shared (accelerator) compilation cache
            from infinite_texture_gans_tpu import use_host_keyed_cache

            use_host_keyed_cache()


def args_to_dict(args: argparse.Namespace) -> Dict[str, Any]:
    return dict(vars(args))


def dict_to_args(d: Dict[str, Any]) -> argparse.Namespace:
    """Rebuild a namespace from a checkpoint-stored config, filling defaults
    for flags added after the checkpoint was written."""
    ns = prepare_parser().parse_args([])
    for k, v in d.items():
        setattr(ns, k, v)
    return ns


def generator_kwargs(args: argparse.Namespace) -> Dict[str, Any]:
    """Constructor kwargs for ResidualPatchGenerator from a config namespace
    (the mapping reference utils.py:197-201 does)."""
    import jax.numpy as jnp

    return dict(
        z_dim=args.z_dim,
        G_ch=args.G_ch,
        base_res=args.base_res,
        n_layers_G=args.n_layers_G,
        attention=args.attention,
        img_ch=args.img_ch,
        leak=args.leak_G,
        SN=args.spec_norm_G,
        type_norm=args.type_norm_G,
        map_dim=args.map_dim,
        padding_mode=args.padding_mode,
        outer_padding=args.outer_padding,
        num_patches_h=args.num_patches_height,
        num_patches_w=args.num_patches_width,
        padding_size=args.padding_size,
        conv_reduction=args.conv_reduction,
        dtype=jnp.bfloat16 if getattr(args, 'compute_dtype', 'float32') == 'bfloat16' else jnp.float32,
        chw_tail=getattr(args, 'chw_tail', 'auto'),
        fuse_up=getattr(args, 'fuse_up', 'auto'),
    )


def discriminator_kwargs(args: argparse.Namespace) -> Dict[str, Any]:
    import jax.numpy as jnp

    return dict(
        base_ch=args.D_ch,
        n_layers_D=args.n_layers_D,
        kw=4,
        SN=args.spec_norm_D,
        norm_layer=args.norm_layer_D,
        dtype=jnp.bfloat16 if getattr(args, 'compute_dtype', 'float32') == 'bfloat16' else jnp.float32,
    )
