#!/usr/bin/env python
"""Batched-canvas occupancy: device s/canvas at num_images 1/2/4/8.

The sequential raster scan runs ONE (gh x gw)-patch-grid G forward per
canvas step — a batch-1 shape that leaves the MXU underoccupied
(mfu_canvas_1024_device ~0.04-0.06 vs 0.37 for the train step, VERDICT r4
weak #1). The engine has always supported generating N canvases in one
scan (``num_images`` — the batch dim of every kernel); this measures how
much of the per-step fixed cost that amortizes: device seconds per CANVAS
at N=1/2/4/8, xplane-traced via bench.py's _canvas_device_seconds (host
wall around a warm canvas dispatch is ~96% fixed tunnel turnaround and
does not amortize — docs/PERF.md round 5). The user-facing form is
``test_sample.py --batch N`` (N textures from one dispatch, all saved).

Usage: python benchmarks/bench_canvas_batch.py [size] [ckpt]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def canvas_device_seconds(gen, variables, size, num_images, seed=33):
    """Device seconds of one canvas dispatch — xplane-traced (see
    bench._canvas_device_seconds: host wall around this program is ~96%
    fixed tunnel turnaround and does not amortize)."""
    from bench import _canvas_device_seconds

    return _canvas_device_seconds(
        gen, variables, size, seed=seed, num_images=num_images
    )


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
        if s is None:
            print(json.dumps({"error": "xplane trace toolchain unavailable"}))
            return
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
