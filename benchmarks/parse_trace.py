#!/usr/bin/env python
"""Parse a jax.profiler xplane trace into a per-op device-time table.

Host-side timing through the tunneled TPU backend is unreliable for small
programs; the xplane trace records device-side op durations — the ground
truth used to decide optimization targets. Parses the XSpace proto directly
(the tensorboard profiler plugin's C++ bridge is version-broken here).

Usage: python benchmarks/parse_trace.py /tmp/itg_trace [top_n]
"""

import glob
import json
import sys
from collections import defaultdict


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main(trace_dir: str, top_n: int = 25) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = load_xspace(paths[-1])

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
            if not totals:
                continue
            grand = sum(totals.values())
            print(f"== plane: {plane.name} | line: {line.name!r} "
                  f"total {grand:.2f} ms, {sum(counts.values())} events")
            rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
            for name, ms in rows:
                print(json.dumps({
                    "op": name[:110], "ms": round(ms, 3),
                    "pct": round(100 * ms / grand, 1), "n": counts[name],
                }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/itg_trace",
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
