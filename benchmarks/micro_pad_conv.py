#!/usr/bin/env python
"""Microbenchmark: is the edge-pad before each local conv fused by XLA?

Compares, per generator conv shape of the Exp-1 recipe (G_ch=52,
n_layers_G=6, 3x3 grid, num_images=8):
  a) jnp.pad(edge) + valid conv   (the local-padding training path)
  b) SAME zero-pad conv           (XLA folds constant pad into the conv)
  c) valid conv on pre-padded x   (conv cost alone, no pad)

If (a) is meaningfully slower than (b)/(c), a Pallas fused pad+conv kernel
has headroom; otherwise XLA already fuses the pad and Pallas effort should go
elsewhere. Also times the same shapes in bfloat16.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def conv(x, k, padding):
    return lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timeit(fn, *args, iters=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    # (N, H, W, Cin, Cout): merged-grid activations entering each conv site,
    # Exp-1: base 4, grid 3x3, num_images 8 -> merged 12x12 ... 384x384
    shapes = [
        (8, 12, 12, 416, 416),
        (8, 24, 24, 416, 208),
        (8, 48, 48, 208, 104),
        (8, 96, 96, 104, 52),
        (8, 192, 192, 52, 26),
        (8, 384, 384, 26, 13),
        (8, 384, 384, 13, 3),
    ]
    results = []
    for dtype in (jnp.float32, jnp.bfloat16):
        for (n, h, w, ci, co) in shapes:
            key = jax.random.key(0)
            x = jax.random.normal(key, (n, h, w, ci), dtype)
            k = jax.random.normal(key, (3, 3, ci, co), dtype)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

            pad_conv = jax.jit(lambda x, k: conv(
                jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
                k, [(0, 0), (0, 0)]))
            same_conv = jax.jit(lambda x, k: conv(x, k, [(1, 1), (1, 1)]))
            valid_conv = jax.jit(lambda x, k: conv(x, k, [(0, 0), (0, 0)]))

            ms_a = timeit(pad_conv, x, k)
            ms_b = timeit(same_conv, x, k)
            ms_c = timeit(valid_conv, xp, k)
            results.append(dict(
                dtype=str(dtype.__name__), shape=[n, h, w, ci, co],
                edge_pad_conv_ms=round(ms_a, 4), same_conv_ms=round(ms_b, 4),
                valid_conv_ms=round(ms_c, 4),
                pad_overhead_pct=round(100 * (ms_a - ms_b) / ms_b, 1),
            ))
            print(json.dumps(results[-1]))
    total_a = sum(r["edge_pad_conv_ms"] for r in results if r["dtype"] == "float32")
    total_b = sum(r["same_conv_ms"] for r in results if r["dtype"] == "float32")
    print(json.dumps({"f32_total_edge_ms": round(total_a, 3),
                      "f32_total_same_ms": round(total_b, 3),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
