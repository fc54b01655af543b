#!/usr/bin/env python
"""Batched-canvas occupancy: device s/canvas at num_images 1/2/4/8.

The sequential raster scan runs ONE (gh x gw)-patch-grid G forward per
canvas step — a batch-1 shape that leaves the MXU underoccupied
(mfu_canvas_1024_device ~0.04-0.06 vs 0.37 for the train step, VERDICT r4
weak #1). The engine has always supported generating N canvases in one
scan (``num_images`` — the batch dim of every kernel); this measures how
much of the per-step fixed cost that amortizes: device seconds per CANVAS
at N=1/2/4/8, via the same pipelined-dispatch + materializing-slice-
barrier method as bench.py's _canvas_device_seconds. The user-facing form
is ``test_sample.py --batch N`` (N textures from one dispatch).

Usage: python benchmarks/bench_canvas_batch.py [size] [ckpt]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def canvas_device_seconds(gen, variables, size, num_images, n_disp=3,
                          seed=33):
    from infinite_texture_gans_tpu.sampling import latents
    from infinite_texture_gans_tpu.sampling.infinite import (
        _canvas_dispatch, canvas_geometry, init_halo_state,
    )

    P, gh, gw = gen.patch_resolution, gen.num_patches_h, gen.num_patches_w
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(size, size, P, gh, gw)
    zk, mk = jax.random.split(jax.random.key(seed))
    z_full = latents.build_z_full(
        zk, num_images, gen.z_dim, gen.base_res, tot_h, tot_w
    )
    maps_full = None
    if gen.type_norm == "SSM":
        maps_full = latents.build_maps_full(
            mk, num_images, gen.map_dim, gen.n_layers_G, gen.base_res,
            tot_h, tot_w,
        )
    halo = init_halo_state(
        gen.site_specs(), num_images, gh, gw, tot_w, dtype=gen.dtype
    )
    dispatch = lambda: _canvas_dispatch(
        gen, variables, z_full, maps_full, halo, steps_h, steps_w,
        maps_full is not None, True, size, size,
    )
    out = dispatch()
    float(jax.device_get(out[0, -1, -1, 0]))  # warm + materialize
    t0 = time.time()
    for _ in range(n_disp):
        out = dispatch()
    float(jax.device_get(out[-1, -1, -1, 0]))
    return (time.time() - t0) / n_disp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ckpt = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "241_300ep_ema.ckpt",
    )
    from infinite_texture_gans_tpu.train.checkpoint import (
        load_generator_from_checkpoint,
    )
    from infinite_texture_gans_tpu.utils import flops as Fl

    G, variables, _ = load_generator_from_checkpoint(ckpt)
    peak = Fl.peak_flops(jax.devices()[0], "bfloat16")
    base = None
    for n in (1, 2, 4, 8):
        s = canvas_device_seconds(G, variables, size, n)
        per_canvas = s / n
        if base is None:
            base = per_canvas
        row = {
            "num_images": n,
            "device_s_per_dispatch": round(s, 4),
            "device_s_per_canvas": round(per_canvas, 4),
            "speedup_per_canvas": round(base / per_canvas, 3),
        }
        if peak:
            row["mfu_canvas_device"] = round(
                Fl.canvas_flops(G, size, size) / per_canvas / peak, 4
            )
        print(json.dumps({"size": size, **row}), flush=True)


if __name__ == "__main__":
    main()
