#!/usr/bin/env python
"""Trace one warm canvas generation (sequential and/or diagonal engine).

Usage: python benchmarks/trace_canvas.py [size] [lanes] [dir] [fuse_up]
  size     canvas edge in px (default 4096)
  lanes    0 = sequential engine, N = diagonal engine with N lanes (default 0)
  dir      trace dir (default /tmp/itg_trace_canvas)
  fuse_up  'auto' (default) | 'all' | 'off' — generator fuse_up override
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python benchmarks/parse_trace.py <dir> 40
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from infinite_texture_gans_tpu.train.checkpoint import (
    load_generator_from_checkpoint,
)


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/itg_trace_canvas"
    fuse = sys.argv[4] if len(sys.argv) > 4 else "auto"

    G, v, _ = load_generator_from_checkpoint("examples/241_300ep_ema.ckpt")
    if fuse != G.fuse_up:
        G = G.clone(fuse_up=fuse)
    key = jax.random.key(5)

    if lanes:
        from infinite_texture_gans_tpu.sampling.diag import generate_canvas_diag

        def run():
            return generate_canvas_diag(G, v, key, size, size, lanes=lanes, wire="u8")
    else:
        from infinite_texture_gans_tpu.sampling.infinite import generate_canvas

        def run():
            return generate_canvas(G, v, key, size, size, wire="u8")

    run()  # compile + warm
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()
    print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
