#!/usr/bin/env python
"""Test the lane-padding hypothesis: on TPU the minormost dim tiles to 128
lanes, so (…, C=13) elementwise/BN chains may waste ~10x bandwidth vs C=128.
Times elementwise + BN-style reduce on representative generator shapes in
channels-last vs channels-second layouts, fp32 and bf16."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=100):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def chain(x):
    # BN-ish normalize + activation + residual add: the elementwise traffic
    # around every conv in the generator
    m = x.mean(axis=(0, 1, 2), keepdims=True)
    v = x.var(axis=(0, 1, 2), keepdims=True)
    y = (x - m) * jax.lax.rsqrt(v + 1e-5)
    return jax.nn.relu(y) + x


@jax.jit
def chain_nchw(x):
    m = x.mean(axis=(0, 2, 3), keepdims=True)
    v = x.var(axis=(0, 2, 3), keepdims=True)
    y = (x - m) * jax.lax.rsqrt(v + 1e-5)
    return jax.nn.relu(y) + x


def main():
    shapes = [(8, 384, 384, 13), (8, 384, 384, 26), (8, 192, 192, 52), (8, 96, 96, 104)]
    for dtype in (jnp.float32, jnp.bfloat16):
        for (n, h, w, c) in shapes:
            x = jax.random.normal(jax.random.key(0), (n, h, w, c), dtype)
            xc = jnp.transpose(x, (0, 3, 1, 2))
            ms_nhwc = timeit(chain, x)
            ms_nchw = timeit(chain_nchw, xc)
            gb = n * h * w * c * x.dtype.itemsize * 3 / 1e9
            print(json.dumps({
                "dtype": x.dtype.name, "shape": [n, h, w, c],
                "nhwc_ms": round(ms_nhwc, 4), "nchw_ms": round(ms_nchw, 4),
                "nhwc_gbps": round(gb / ms_nhwc * 1e3, 1),
                "nchw_gbps": round(gb / ms_nchw * 1e3, 1),
            }))


if __name__ == "__main__":
    main()
