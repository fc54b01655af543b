#!/usr/bin/env python
"""Sweep the Pallas conv kernels' block-height (VMEM budget) on the TPU,
measured via device xplane traces (host timing through the tunnel is
unreliable — dispatch returns early; docs/PERF.md).

Round-3 trace context: in the full train step the tail fwd kernels measure
0.5-1.0 ms each (~2% MFU). This isolates each kernel shape at several
block heights to find the fast configuration.

Usage: python benchmarks/bench_kernel_bh.py [fwd|dx|dw]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def device_ms_total(trace_dir: str, match: str) -> float:
    """TOTAL device ms across all ops whose name contains ``match`` (the
    caller divides by its known call count — a per-event mean would bias
    comparisons if a configuration split the work into more ops/events)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parse_trace import load_xspace

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    xs = load_xspace(paths[-1])
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else ""
                if match in name:
                    total += ev.duration_ps / 1e9
    return total


def main(which: str = "fwd"):
    import jax
    import jax.numpy as jnp

    from infinite_texture_gans_tpu.ops import pallas_conv as pc

    shapes = [
        ("b5c1", (8, 52, 192, 256), 26, 192),
        ("b6c1", (8, 26, 384, 384), 13, 384),
        ("b6c2", (8, 13, 384, 384), 13, 384),
    ]
    budgets = [3, 6, 10, 14]
    iters = 20

    for name, xshape, co, w_true in shapes:
        n, c, h, w = xshape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((n, co, h, w)), jnp.bfloat16)
        wp = jnp.asarray(rng.standard_normal((3 * co, 3 * c)) * 0.1, jnp.bfloat16)
        wpt = jnp.asarray(rng.standard_normal((3 * c, 3 * co)) * 0.1, jnp.bfloat16)
        b = jnp.zeros((co, 1), jnp.bfloat16)
        sc = jnp.ones((c, 1, w), jnp.bfloat16)
        sh = jnp.zeros((c, 1, w), jnp.bfloat16)
        for budget_mb in budgets:
            def pick(h_, w_, c_rows, nbytes, _b=budget_mb):
                want = max(8, _b * 1024 * 1024 // max(1, c_rows * w_ * nbytes))
                cands = [d for d in range(8, h_ + 1, 8) if h_ % d == 0]
                if not cands:
                    return h_
                fit = [d for d in cands if d <= want]
                return fit[-1] if fit else cands[0]

            pc._pick_bh = pick
            bh = pick(h, w, 6 * c + 9 * co, 2)
            if which == "fwd":
                pc._conv3x3_chw_fwd.clear_cache()
                f = lambda xx: pc._conv3x3_chw_fwd(
                    xx, wp, b, sc, sh, relu=True, outer_padding="replicate",
                    w_true=w_true, emit_padded=True)
                arg, match = x, "_conv3x3_chw_fwd"
            elif which == "dx":
                pc._conv3x3_chw_dx.clear_cache()
                f = lambda gg: pc._conv3x3_chw_dx(
                    x, gg, wpt, sc, sh, relu=True, outer_padding="replicate",
                    w_true=w_true)
                arg, match = g, "_conv3x3_chw_dx"
            else:
                pc._conv3x3_chw_dw.clear_cache()
                f = lambda gg: pc._conv3x3_chw_dw(
                    x, gg, sc, sh, relu=True, outer_padding="replicate",
                    w_true=w_true)
                arg, match = g, "_conv3x3_chw_dw"
            tdir = f"/tmp/ksweep/{name}_{which}_{budget_mb}"
            try:
                y = f(arg)
                jax.block_until_ready(y)
                with jax.profiler.trace(tdir):
                    for _ in range(iters):
                        y = f(arg)
                    jax.block_until_ready(y)
                ms = device_ms_total(tdir, match) / iters
                gflop = 2 * 9 * c * co * n * h * w / 1e9
                print(f"{name} {which} budget={budget_mb:3d}MB bh={bh:3d} "
                      f"nt={h // bh:3d}: {ms:7.3f} ms/call "
                      f"{gflop / max(ms, 1e-9):6.1f} TF/s-eff", flush=True)
            except Exception as e:
                print(f"{name} {which} budget={budget_mb}MB bh={bh}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fwd")
