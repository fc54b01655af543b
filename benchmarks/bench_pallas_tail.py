#!/usr/bin/env python
"""Validate + benchmark the Pallas CHW tail conv on real TPU.

1. Correctness: compiled Mosaic forward/VJP vs the XLA oracle at the Exp-1
   tail shapes (C=26->13 and 13->3 at 384^2, batch 8).
2. Speed: device-trace time of 10 chained fused convs, Pallas CHW vs the
   equivalent XLA NHWC chain (BN-apply + relu + edge pad + conv).
"""

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from infinite_texture_gans_tpu.ops.pallas_conv import (
    conv3x3_chw,
    conv3x3_chw_reference,
)

SHAPES = [(8, 26, 384, 384, 13), (8, 13, 384, 384, 3)]


def make(key, n, c, h, w, co, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return (
        jax.random.normal(ks[0], (n, c, h, w), dtype),
        (jax.random.normal(ks[1], (3, 3, c, co), jnp.float32) * 0.2).astype(dtype),
        jax.random.normal(ks[2], (co,), jnp.float32).astype(dtype),
        (1 + 0.1 * jax.random.normal(ks[3], (c,), jnp.float32)).astype(dtype),
        (0.1 * jax.random.normal(ks[4], (c,), jnp.float32)).astype(dtype),
    )


def check_correct():
    for (n, c, h, w, co) in SHAPES:
        x, wk, b, sc, sh = make(jax.random.key(0), n, c, h, w, co)
        y = conv3x3_chw(x, wk, b, sc, sh, True, "replicate")
        ref = conv3x3_chw_reference(x, wk, b, sc, sh, True, "replicate")
        err = float(jnp.abs(y - ref).max())
        print(json.dumps({"fwd_shape": [n, c, h, w, co], "max_err": err}))
        assert err < 1e-3, err

        def lp(x, wk, b, sc, sh):
            return jnp.sum(jnp.sin(conv3x3_chw(x, wk, b, sc, sh, True, "replicate")))

        def lr(x, wk, b, sc, sh):
            return jnp.sum(jnp.sin(conv3x3_chw_reference(x, wk, b, sc, sh, True, "replicate")))

        gp = jax.grad(lp, argnums=(0, 1, 2))(x, wk, b, sc, sh)
        gr = jax.grad(lr, argnums=(0, 1, 2))(x, wk, b, sc, sh)
        errs = [
            float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-12))
            for a, r in zip(gp, gr)
        ]
        print(json.dumps({"grad_shape": [n, c, h, w, co], "rel_err_dx_dw_db": errs}))
        assert max(errs) < 2e-3, errs


def xla_chain_nhwc(x, wk, b, sc, sh):
    a = jax.nn.relu(x * sc + sh)
    a = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(a, wk, (1, 1), [(0, 0), (0, 0)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def device_ms(trace_dir, key="jit_many"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                tot = 0.0
                for ev in line.events:
                    if meta.get(ev.metadata_id, "").startswith(key):
                        tot += ev.duration_ps / 1e9
                return tot
    return float("nan")


def bench(dtype):
    n, c, h, w, co = 8, 26, 384, 384, 26  # keep channels fixed so it chains
    x, wk, b, sc, sh = make(jax.random.key(1), n, c, h, w, co, dtype)
    xh = jnp.transpose(x, (0, 2, 3, 1))
    sc_n = sc[None, None, None, :]
    sh_n = sh[None, None, None, :]

    @jax.jit
    def many_pallas(x, wk, b, sc, sh):
        acc = x
        for _ in range(10):
            acc = conv3x3_chw(acc, wk, b, sc, sh, True, "replicate")
        return acc

    @jax.jit
    def many_xla(x, wk, b, sc, sh):
        acc = x
        for _ in range(10):
            acc = xla_chain_nhwc(acc, wk, b, sc, sh)
        return acc

    out = {}
    for tag, fn, args in (
        ("pallas_chw", many_pallas, (x, wk, b, sc, sh)),
        ("xla_nhwc", many_xla, (xh, wk, b, sc_n, sh_n)),
    ):
        r = fn(*args)
        jax.block_until_ready(r)
        td = f"/tmp/ptail_{tag}_{dtype.__name__}"
        os.system(f"rm -rf {td}")
        jax.profiler.start_trace(td)
        r = fn(*args)
        jax.block_until_ready(r)
        jax.profiler.stop_trace()
        out[tag] = round(device_ms(td), 3)
    out["dtype"] = dtype.__name__
    out["speedup"] = round(out["xla_nhwc"] / out["pallas_chw"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    check_correct()
    bench(jnp.float32)
    bench(jnp.bfloat16)
