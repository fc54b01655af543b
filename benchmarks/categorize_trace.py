#!/usr/bin/env python
"""Category rollup of a train-step xplane trace (companion to
parse_trace.py, which prints the raw per-op table).

Buckets every 'XLA Ops' event by op-name pattern so the per-step breakdown
in docs/PERF.md can be produced mechanically. Categories are heuristic but
stable across rounds; the residual bucket is printed so nothing hides.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python benchmarks/categorize_trace.py /tmp/trace [n_steps]
"""

import sys
from collections import defaultdict

from parse_trace import load_xspace
import glob


CATS = [
    ("pallas conv3x3 fwd", lambda n: "_conv3x3_chw_fwd" in n),
    ("pallas conv3x3 dx", lambda n: "_conv3x3_chw_dx" in n),
    ("pallas conv3x3 dw", lambda n: "_conv3x3_chw_dw" in n),
    ("pallas conv1x1", lambda n: "_conv1x1_chw" in n),
    ("pallas upsample", lambda n: "_upsample2_chw" in n or "_up2" in n),
    ("pallas stem", lambda n: "_conv4x4s2" in n or "_stem" in n),
    ("layout copies", lambda n: n.startswith("%copy")),
    ("convolution (XLA)", lambda n: "convolution" in n),
    ("reduce fusions", lambda n: "reduce" in n),
    ("dynamic-update-slice", lambda n: "dynamic-update-slice" in n or "dynamic_update" in n),
]


def main(trace_dir: str, n_steps: int = 5) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    xs = load_xspace(paths[-1])
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cat_ms = defaultdict(float)
            residual = defaultdict(float)
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
                ms = ev.duration_ps / 1e9
                for cname, pred in CATS:
                    if pred(name):
                        cat_ms[cname] += ms
                        break
                else:
                    cat_ms["other fusions/elementwise"] += ms
                    residual[name.split(" = ")[0]] += ms
            total = sum(cat_ms.values())
            print(f"total {total:.2f} ms over {n_steps} steps "
                  f"=> {total / n_steps:.2f} ms/step")
            for cname, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
                print(f"  {cname:28s} {ms / n_steps:7.3f} ms/step "
                      f"({100 * ms / total:4.1f}%)")
            print("top residual ('other') ops:")
            for n, ms in sorted(residual.items(), key=lambda kv: -kv[1])[:20]:
                print(f"    {ms / n_steps:7.3f} ms/step  {n[:100]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 5)
