#!/usr/bin/env python
"""Warm-wall-clock benchmark of the inference engines on the bundled
trained checkpoint (examples/241_300ep_ema.ckpt, Exp-1 architecture).

Measures, per canvas size: the in-memory engine with the f32 and u8 wires
(row-grouped dispatch + device-side assembly, sampling/infinite.py) and the
streamed PNG engine (sampling/stream.py). Each is run once cold (compile +
cache) and N times warm; prints one JSON line per (engine, size).

Usage: python benchmarks/bench_inference.py [sizes...]  (default 1024 2048)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1024, 2048]
    import jax

    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas
    from infinite_texture_gans_tpu.sampling.stream import generate_canvas_streamed
    from infinite_texture_gans_tpu.train.checkpoint import (
        load_generator_from_checkpoint,
    )

    gen, variables, _ = load_generator_from_checkpoint(
        "examples/241_300ep_ema.ckpt"
    )
    reps = 3
    for size in sizes:
        for engine in ("mem_f32", "mem_u8", "stream"):
            def run(k):
                if engine == "stream":
                    return generate_canvas_streamed(
                        gen, variables, jax.random.key(k), size, size,
                        f"/tmp/bench_inf_{size}.png",
                    )
                return generate_canvas(
                    gen, variables, jax.random.key(k), size, size,
                    num_images=1, wire=engine.split("_")[1],
                )

            t0 = time.time()
            run(0)
            cold_s = time.time() - t0
            t0 = time.time()
            for k in range(1, reps + 1):
                run(k)
            warm_s = (time.time() - t0) / reps
            print(json.dumps({
                "engine": engine, "size": size,
                "cold_s": round(cold_s, 3), "warm_s": round(warm_s, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
