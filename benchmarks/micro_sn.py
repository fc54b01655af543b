#!/usr/bin/env python
"""Microbench the D spectral-norm chain (power iteration + normalize +
bf16 convert) against restructured variants, on device, via xplane trace.

VERDICT (2026-08, v5e): nothing to win — all three variants trace at
~0.01 ms/weight in isolation, and the Exp-1 step's suspicious-looking
"(f32[], f32[], bf16[W]) fusion" ops (0.78 ms/step total) turned out to be
the D convs' WEIGHT-GRADIENT convolutions (kOutput fusions with a
convolution backend_config, op_name `transpose(jvp(PatchDiscriminator))/
convN/conv_general_dilated`) that merely absorb the SN backward's two
scalar reduces as side outputs — a good fusion, mislabeled by its tuple
shape, same lesson as `convert_reduce_fusion` in docs/PERF.md. Kept as
the measurement that closed the question. Variants:

  current : v = normalize(W^T u); u = normalize(W v); sigma = u^T W v
  two_pass: v = normalize(W^T u); z = W v; sigma = ||z||; u = z / sigma
            (algebraically identical: u^T W v with u = Wv/||Wv|| IS ||Wv||)
  mxu     : two_pass with the matvecs as (1,K)@(K,O) dots, f32 acc

Usage: python benchmarks/micro_sn.py [/tmp/itg_trace_sn]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

SHAPES = [(4, 4, 64, 128), (4, 4, 128, 256), (4, 4, 256, 512)]
EPS = 1e-12


def current(kernel, u, v):
    o = kernel.shape[-1]
    w_mat = kernel.reshape(-1, o).T
    v_ = w_mat.T @ u
    v_ = v_ / (jnp.linalg.norm(v_) + EPS)
    u_ = w_mat @ v_
    u_ = u_ / (jnp.linalg.norm(u_) + EPS)
    sigma = jnp.dot(u_, w_mat @ v_)
    return (kernel / sigma).astype(jnp.bfloat16), u_, v_


def two_pass(kernel, u, v):
    o = kernel.shape[-1]
    w = kernel.reshape(-1, o)  # (K, O), O minor
    v_ = w @ u  # (K,) contract over O
    v_ = v_ / (jnp.linalg.norm(v_) + EPS)
    z = v_ @ w  # (O,) contract over K
    sigma = jnp.linalg.norm(z) + EPS
    u_ = z / sigma
    return (kernel / sigma).astype(jnp.bfloat16), u_, v_


def mxu(kernel, u, v):
    o = kernel.shape[-1]
    w = kernel.reshape(-1, o)
    v_ = lax.dot_general(u[None, :], w, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)[0]
    v_ = v_ / (jnp.linalg.norm(v_) + EPS)
    z = lax.dot_general(v_[None, :], w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[0]
    sigma = jnp.linalg.norm(z) + EPS
    u_ = z / sigma
    return (kernel / sigma).astype(jnp.bfloat16), u_, v_


def main(trace_dir: str) -> None:
    variants = {"current": current, "two_pass": two_pass, "mxu": mxu}
    kernels = [
        jax.random.normal(jax.random.key(i), s, jnp.float32)
        for i, s in enumerate(SHAPES)
    ]
    us = [jax.random.normal(jax.random.key(10 + i), (s[-1],), jnp.float32)
          for i, s in enumerate(SHAPES)]
    vs = [jax.random.normal(jax.random.key(20 + i),
                            (s[0] * s[1] * s[2],), jnp.float32)
          for i, s in enumerate(SHAPES)]

    fns = {}
    for name, fn in variants.items():
        @jax.jit
        def run(ks, us_, vs_, fn=fn):
            outs = [fn(k, u, v) for k, u, v in zip(ks, us_, vs_)]
            return [o[0].sum() for o in outs], [o[1] for o in outs]

        # numerics sanity + compile
        sums, u_new = run(kernels, us, vs)
        fns[name] = run
        print(name, [float(s) for s in sums])

    for name, run in fns.items():
        sub = os.path.join(trace_dir, name)
        with jax.profiler.trace(sub):
            for _ in range(20):
                out = run(kernels, us, vs)
            jax.block_until_ready(out)
        print("traced", name, "to", sub)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/itg_trace_sn")
