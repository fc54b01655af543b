"""Inference CLI — equivalent of reference test_sample.py.

Loads a checkpoint (framework .ckpt or reference .pth), rebuilds the
generator from the config stored inside it, and generates an arbitrarily
large seamless texture via the patch-by-patch halo engine ('local' mode) or
the single-pass / tiled baseline ('zeros' mode).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from infinite_texture_gans_tpu.config import prepare_sample_parser
from infinite_texture_gans_tpu.sampling.infinite import generate_canvas
from infinite_texture_gans_tpu.sampling.tiled import sample_from_gen
from infinite_texture_gans_tpu.train.checkpoint import load_generator_from_checkpoint


def save_batch(imgs: np.ndarray, saving_path: str) -> None:
    """Save every canvas of a ``--batch N`` run: the first at the requested
    name (the reference saves exactly one image, test_sample.py:79), the
    rest as ``<stem>_k<ext>``. N canvases through ONE raster dispatch is
    the throughput mode — per-canvas device time drops ~30-43% and a
    tunneled host pays one dispatch turnaround instead of N
    (docs/PERF.md round 5); discarding N-1 of them would waste that."""
    save_image(imgs[0], saving_path)
    print("The image is saved as:", saving_path)
    stem, ext = os.path.splitext(saving_path)
    for k in range(1, imgs.shape[0]):
        p = f"{stem}_{k}{ext}"
        save_image(imgs[k], p)
        print("The image is saved as:", p)


def save_image(img: np.ndarray, path: str) -> None:
    """(H, W, C) float in [-1, 1] -> image file ((img*0.5+0.5), reference
    test_sample.py:79). Rounds like torchvision's save_image
    (mul(255).add_(0.5) before the uint8 cast) so the bytes match both the
    reference and the streamed path's ``_to_uint8``. A uint8 input (already
    quantized, e.g. on device by the canvas engine's u8 wire) is saved
    as-is — ONE saving code path for both wires."""
    from PIL import Image

    if img.dtype == np.uint8:
        arr = img
    else:
        arr = np.clip((img * 0.5 + 0.5) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    Image.fromarray(arr).save(path)


def main():
    from infinite_texture_gans_tpu.config import apply_platform

    args_sample = prepare_sample_parser().parse_args()
    apply_platform(args_sample)  # before any backend touch
    from infinite_texture_gans_tpu import route_cache_for_backend

    route_cache_for_backend()  # ambient-CPU sessions use the per-host dir
    from infinite_texture_gans_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args_sample.model_path)
    netG, variables, args = load_generator_from_checkpoint(
        args_sample.model_path, ckpt=ckpt
    )
    print(args)
    if getattr(args_sample, "export_pth", None):
        from infinite_texture_gans_tpu.utils.torch_export import export_generator_pth

        meta = ckpt.get("meta", {})
        export_generator_pth(
            args_sample.export_pth, variables, args,
            epoch=meta.get("epoch"), gloss=meta.get("Gloss"),
            dloss=meta.get("Dloss"), seed=meta.get("seed"),
            d_variables=ckpt.get("netD_variables"),
            d_norm_layer=getattr(args, "norm_layer_D", None),
        )
        print("Exported reference .pth checkpoint:", args_sample.export_pth)
        return
    if getattr(args_sample, "fuse_up", "auto") != netG.fuse_up:
        netG = netG.clone(fuse_up=args_sample.fuse_up)

    seed = args_sample.seed if args_sample.seed is not None else 0
    key = jax.random.key(seed)

    if getattr(args_sample, "stream", False) and args.padding_mode != "local":
        print(
            "Warning: --stream requires a local-padding checkpoint; the "
            "zeros-padding path generates in host memory instead"
        )
    if getattr(args_sample, "mesh", None) and args.padding_mode != "local":
        print(
            "Warning: --mesh requires a local-padding checkpoint (the "
            "wavefront pipelines the halo protocol); generating single-device"
        )
    mesh = None
    if getattr(args_sample, "mesh", None) and args.padding_mode == "local":
        from infinite_texture_gans_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args_sample.mesh, 1, None)
        if mesh is None:
            print(
                f"Warning: --mesh {args_sample.mesh} resolves to a single "
                "device; generating with the single-chip engine"
            )
    if mesh is not None:
        # multi-chip wavefront generation (rows pipelined across the mesh,
        # halo buffers exchanged over ICI with ppermute)
        from infinite_texture_gans_tpu.parallel.wavefront import (
            generate_canvas_wavefront,
            generate_canvas_wavefront_streamed,
        )

        if args_sample.batch > 1:
            print("Warning: --mesh generates a single image; ignoring --batch")
        folder = os.path.dirname(args_sample.model_path)
        saving_path = os.path.join(folder, args_sample.output_name)
        if getattr(args_sample, "stream", False):
            if not saving_path.endswith(".png"):
                saving_path += ".png"
            generate_canvas_wavefront_streamed(
                netG, variables, key,
                args_sample.output_resolution_height,
                args_sample.output_resolution_width,
                saving_path, mesh, slab_rows=args_sample.slab_rows,
                progress=True,
            )
        else:
            img = generate_canvas_wavefront(
                netG, variables, key,
                args_sample.output_resolution_height,
                args_sample.output_resolution_width,
                mesh, num_images=1,
            )
            save_image(np.asarray(img)[0], saving_path)
        print("The image is saved as:", saving_path)
        return
    if args.padding_mode == "local" and getattr(args_sample, "stream", False):
        from infinite_texture_gans_tpu.sampling.stream import generate_canvas_streamed

        if args_sample.batch > 1:
            print("Warning: --stream writes one PNG; generating a single image")
        folder = os.path.dirname(args_sample.model_path)
        saving_path = os.path.join(folder, args_sample.output_name)
        if not saving_path.endswith(".png"):
            saving_path += ".png"
        generate_canvas_streamed(
            netG,
            variables,
            key,
            output_resolution_height=args_sample.output_resolution_height,
            output_resolution_width=args_sample.output_resolution_width,
            path=saving_path,
            progress=True,
        )
        print("The image is saved as:", saving_path)
        return

    if args.padding_mode == "local":
        # uint8 wire: quantized on device with save_image's exact mapping
        # (byte-identical, tested) — 4x less D2H than shipping the float
        # canvas just to quantize it on the host.
        if getattr(args_sample, "diag_lanes", None):
            from infinite_texture_gans_tpu.sampling.diag import (
                generate_canvas_diag,
            )

            img_u8 = generate_canvas_diag(
                netG,
                variables,
                key,
                output_resolution_height=args_sample.output_resolution_height,
                output_resolution_width=args_sample.output_resolution_width,
                num_images=args_sample.batch,
                lanes=args_sample.diag_lanes,
                wire="u8",
            )
        else:
            img_u8 = generate_canvas(
                netG,
                variables,
                key,
                output_resolution_height=args_sample.output_resolution_height,
                output_resolution_width=args_sample.output_resolution_width,
                num_images=args_sample.batch,
                progress=True,
                row_group=args_sample.row_group,
                wire="u8",
            )
        folder = os.path.dirname(args_sample.model_path)
        saving_path = os.path.join(folder, args_sample.output_name)
        save_batch(np.asarray(img_u8), saving_path)
        return
    else:
        scale = 2 ** (netG.n_layers_G - 1)
        new_base_res = args_sample.output_resolution_height // scale
        img = np.asarray(
            sample_from_gen(
                netG,
                variables,
                key,
                num_images=args_sample.batch,
                base_res=new_base_res,
                tiles=args_sample.tiles,
            )
        )

    folder = os.path.dirname(args_sample.model_path)
    saving_path = os.path.join(folder, args_sample.output_name)
    save_batch(np.asarray(img), saving_path)


if __name__ == "__main__":
    main()
