#!/usr/bin/env python
"""Device-trace comparison of tail-layer conv formulations.

The trace of the Exp-1 step showed the C=13/26 layers at ~34GB/s effective:
NHWC stores C in the 128-lane dim, so small-C arrays are physically ~10x
padded in HBM. Candidate fixes, measured by device time (host timing through
the tunnel is unreliable):

  a) nhwc:  BN-chain + edge-pad + conv, NHWC (status quo)
  b) nchw:  same ops in NCHW (W dense in lanes) with NCHW conv dim numbers
  c) dots:  NCHW storage, conv as 9 shifted dot_generals (no conv op)

Each variant runs the representative chain x -> norm-ish elementwise ->
edge-pad -> 3x3 conv for the two big tail shapes, 10 iterations inside one
jit, under jax.profiler; the parse step sums the device plane.
"""

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

SHAPES = [(8, 384, 384, 26, 13), (8, 384, 384, 13, 3), (8, 192, 192, 52, 26)]


def bn_chain(x, axes):
    m = x.mean(axis=axes, keepdims=True)
    v = x.var(axis=axes, keepdims=True)
    return jax.nn.relu((x - m) * lax.rsqrt(v + 1e-5))


def nhwc(x, k):
    h = bn_chain(x, (0, 1, 2))
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(h, k, (1, 1), [(0, 0), (0, 0)],
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


def nchw(x, k):
    h = bn_chain(x, (0, 2, 3))
    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    return lax.conv_general_dilated(h, k, (1, 1), [(0, 0), (0, 0)],
                                    dimension_numbers=("NCHW", "HWIO", "NCHW"))


def dots(x, k):
    n, c, hh, ww = x.shape
    h = bn_chain(x, (0, 2, 3))
    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    out = None
    for dy in range(3):
        for dx in range(3):
            win = h[:, :, dy : dy + hh, dx : dx + ww]
            # (Co, C) x (N, C, H, W) contract C -> (Co, N, H, W)
            t = lax.dot_general(k[dy, dx].T, win, (((1,), (1,)), ((), ())))
            out = t if out is None else out + t
    return jnp.transpose(out, (1, 0, 2, 3))


def run(tag, fn, args_list, iters=10):
    @jax.jit
    def many(args_list):
        outs = []
        for (x, k) in args_list:
            acc = x
            for _ in range(iters):
                acc_out = fn(acc, k)
                # genuine data dependence so no iteration is DCE'd
                acc = acc + 0.001 * acc_out.mean()
            outs.append(acc)
        return outs

    r = many(args_list)
    jax.block_until_ready(r)
    trace_dir = f"/tmp/tailconv_{tag}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    r = many(args_list)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    return trace_dir


def device_ms(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                tot = defaultdict(float)
                meta = {m.id: m.name for m in plane.event_metadata.values()}
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    if name.startswith("jit_many"):
                        tot[name] += ev.duration_ps / 1e9
                return sum(tot.values())
    return float("nan")


def main():
    results = {}
    for tag, fn, layout in (("nhwc", nhwc, "nhwc"), ("nchw", nchw, "nchw"),
                            ("dots", dots, "nchw")):
        args_list = []
        for (n, hh, ww, ci, co) in SHAPES:
            key = jax.random.key(0)
            if layout == "nhwc":
                x = jax.random.normal(key, (n, hh, ww, ci))
            else:
                x = jax.random.normal(key, (n, ci, hh, ww))
            k = jax.random.normal(key, (3, 3, ci, co))
            args_list.append((x, k))
        td = run(tag, fn, args_list)
        results[tag] = round(device_ms(td), 3)
        print(json.dumps({tag: results[tag]}))
    print(json.dumps({"device_ms_10iters_3shapes": results}))


if __name__ == "__main__":
    main()
