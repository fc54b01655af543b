#!/usr/bin/env python
"""Ablation study of the Pallas conv3x3 fwd kernel's internal stages, via
device traces. Each variant REMOVES one stage (producing wrong outputs) to
attribute the kernel's time:

  base   : unmodified kernel
  nostack: _rows_stack uses the aligned dy=0 slice three times (isolates the
           cost of the dy=1,2 MISALIGNED sublane slices)
  noshift: _combine_partials adds partials without the two lane shifts
  bf16p  : partials in bf16 instead of f32
  nomm   : matmul replaced with a slab-sized broadcast (isolates MXU cost)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def device_ms(trace_dir: str, match: str) -> float:
    from parse_trace import load_xspace

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    xs = load_xspace(paths[-1])
    total, n = 0.0, 0
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
                    n += 1
    return total / max(n, 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from infinite_texture_gans_tpu.ops import pallas_conv as pc

    orig_stack = pc._rows_stack
    orig_combine = pc._combine_partials

    def stack_aligned(slab, bh):
        c, w = slab.shape[0], slab.shape[2]
        s0 = slab[:, 0:bh, :].reshape(c, bh * w)
        return jnp.concatenate([s0, s0, s0], axis=0)

    def combine_noshift(p, co, bh, w, zeros_mode, w_true):
        p0 = p[0:co].reshape(co, bh, w)
        p1 = p[co:2 * co].reshape(co, bh, w)
        p2 = p[2 * co:].reshape(co, bh, w)
        return p0 + p1 + p2

    variants = {
        "base": {},
        "nostack": {"_rows_stack": stack_aligned},
        "noshift": {"_combine_partials": combine_noshift},
        "both": {"_rows_stack": stack_aligned, "_combine_partials": combine_noshift},
    }

    shapes = [
        ("b6c2", (8, 13, 384, 384), 13, 384),
        ("b5c1", (8, 52, 192, 256), 26, 192),
    ]
    iters = 20
    for name, xshape, co, w_true in shapes:
        n, c, h, w = xshape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        wp = jnp.asarray(rng.standard_normal((3 * co, 3 * c)) * 0.1, jnp.bfloat16)
        b = jnp.zeros((co, 1), jnp.bfloat16)
        sc = jnp.ones((c, 1, w), jnp.bfloat16)
        sh = jnp.zeros((c, 1, w), jnp.bfloat16)
        for vname, patches in variants.items():
            for attr, fn in patches.items():
                setattr(pc, attr, fn)
            pc._conv3x3_chw_fwd.clear_cache()
            try:
                f = lambda xx: pc._conv3x3_chw_fwd(
                    xx, wp, b, sc, sh, relu=True, outer_padding="replicate",
                    w_true=w_true, emit_padded=True)
                y = f(x)
                jax.block_until_ready(y)
                tdir = f"/tmp/kabl/{name}_{vname}"
                with jax.profiler.trace(tdir):
                    for _ in range(iters):
                        y = f(x)
                    jax.block_until_ready(y)
                ms = device_ms(tdir, "_conv3x3_chw_fwd")
                print(f"{name} {vname:8s}: {ms:7.3f} ms/call", flush=True)
            except Exception as e:
                print(f"{name} {vname}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
            finally:
                pc._rows_stack = orig_stack
                pc._combine_partials = orig_combine


if __name__ == "__main__":
    main()
