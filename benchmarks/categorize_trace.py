#!/usr/bin/env python
"""Category rollup of an xplane trace (copy/pallas/reduce/fusion/...), plus
the top ops of a chosen category. Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python benchmarks/categorize_trace.py /tmp/trace [category] [n_steps]
"""
import glob, re, sys, collections


def main(trace_dir, show_cat="copy", n_steps=5):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace(); xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "Steps":
                ds = sorted(ev.duration_ps / 1e9 for ev in line.events)
                print("step times (ms):", [round(d, 2) for d in ds[-n_steps:]])
            if line.name != "XLA Ops":
                continue
            cats = collections.Counter()
            names = collections.defaultdict(float)
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
                ms = ev.duration_ps / 1e9
                lhs = name.split("=")[0]
                if "_conv3x3_chw" in lhs or "_conv1x1_chw" in lhs: cat = "pallas_conv"
                elif "_up2_" in lhs or "up2" in lhs: cat = "pallas_up"
                elif lhs.strip().startswith("%copy") or lhs.strip().startswith("%bitcast"): cat = "copy"
                elif "dynamic-update-slice" in lhs: cat = "dus"
                elif "convolution" in lhs: cat = "conv_fusion"
                elif "reduce" in lhs: cat = "reduce"
                elif "fusion" in lhs: cat = "fusion"
                else: cat = "other"
                cats[cat] += ms
                if cat == show_cat:
                    names[name[:130]] += ms
            tot = sum(cats.values())
            for k, v in cats.most_common():
                print(f"{k:12s} {v / n_steps:7.3f} ms/step")
            print(f"TOTAL {tot / n_steps:.3f} ms/step")
            print(f"-- top {show_cat} ops (ms/step):")
            for n, v in sorted(names.items(), key=lambda kv: -kv[1])[:14]:
                print(f"{v / n_steps:7.3f}  {n}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "copy",
         int(sys.argv[3]) if len(sys.argv) > 3 else 5)
