#!/usr/bin/env python
"""Parse a jax.profiler xplane trace into a per-op device-time table.

Host-side timing through the tunneled TPU backend is unreliable for small
programs; the xplane trace records device-side op durations — the ground
truth used to decide optimization targets. Parses the XSpace proto directly
(the tensorboard profiler plugin's C++ bridge is version-broken here).

Usage: python benchmarks/parse_trace.py /tmp/itg_trace [top_n]
       python benchmarks/parse_trace.py /tmp/itg_trace --cat   # category sums
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


CATEGORIES = [
    # (label, substring match on the HLO op name); first hit wins
    ("pallas conv3x3 fwd", "_conv3x3_chw_fwd"),
    ("pallas conv3x3 dx", "_conv3x3_chw_dx"),
    ("pallas conv3x3 dw", "_conv3x3_chw_dw"),
    ("pallas upconv fwd", "_upconv3x3_fwd"),
    ("pallas upconv dx", "_upconv3x3_dx"),
    ("pallas upconv dw", "_upconv3x3_dw"),
    ("pallas upconv fwd", "_upconv_kernel"),
    ("pallas upconv dx", "_updx_kernel"),
    ("pallas upconv dw", "_updw_kernel"),
    ("pallas up-add", "_up2_add"),
    ("pallas conv1x1", "_conv1x1_chw"),
    ("pallas upsample", "_up2_chw"),
    ("pallas stem", "_stem_"),
    ("pallas ssm embed", "ssm_embed"),
    ("layout copies", "%copy"),
    # CAUTION: name-based. XLA sometimes names a conv-rooted kOutput fusion
    # "convert_reduce_fusion" (the D's conv3 on the real batch lands here —
    # verified against the compiled HLO: conv_general_dilated with a
    # convolution backend_config at ~100% MFU). Treat the "XLA reduce"
    # bucket as an upper bound; check the top-op table before acting on it.
    ("XLA reduce", "reduce"),
    ("dynamic-update-slice", "dynamic-update-slice"),
    ("XLA convolution", "convolution"),
    ("fusions", "fusion"),
]


def categorize(name: str) -> str:
    # match on the instruction's own name (before " = "), not the full HLO
    # text — operand names would otherwise pollute the buckets
    head = name.split(" ", 1)[0]
    for label, key in CATEGORIES:
        if key in head:
            return label
    if "custom-call" in name.split(" = ", 1)[-1].split("(", 1)[0]:
        return "pallas other"
    return "other"


def print_categories(plane, ev_meta, n_steps: int) -> None:
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        totals = defaultdict(float)
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
            # control-flow WRAPPER events (%while = the lax.scan of a
            # superstep dispatch, %conditional) span their body ops, which
            # appear as separate events — counting both double-counts the
            # whole scan (seen as a giant 'other' bucket in round 4)
            head = name.split(" ", 1)[0]
            if head.startswith("%while") or head.startswith("%conditional"):
                continue
            totals[categorize(name)] += ev.duration_ps / 1e9
        grand = sum(totals.values())
        print(f"== categories (total {grand:.2f} ms over {n_steps} steps, "
              f"{grand / max(1, n_steps):.2f} ms/step)")
        for label, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
            print(json.dumps({"cat": label, "ms_per_step": round(ms / max(1, n_steps), 3),
                              "ms_total": round(ms, 2)}))


def main(trace_dir: str, top_n: int = 25, cat: bool = False) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = load_xspace(paths[-1])

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        if cat:
            # count real steps as Steps-line events with >1 ms device time
            n_steps = max(1, sum(
                1 for line in plane.lines if line.name == "Steps"
                for ev in line.events if ev.duration_ps > 1e9))
            print_categories(plane, ev_meta, n_steps)
            continue
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
    argv = [a for a in sys.argv[1:] if a != "--cat"]
    main(argv[0] if argv else "/tmp/itg_trace",
         int(argv[1]) if len(argv) > 1 else 25,
         cat="--cat" in sys.argv)
