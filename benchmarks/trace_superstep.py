#!/usr/bin/env python
"""Trace ONE superstep dispatch (K steps incl. in-jit crop sampling).

The per-step trace (trace_step.py) times the fused train step on a fixed
real batch; the production path (train_loop + bench.py) runs
``make_train_superstep`` — the same step under ``lax.scan`` with the real
crops sampled in-jit. This script traces that exact dispatch so the wall
rate (bench.py) can be reconciled against device time category by category.

Usage: python benchmarks/trace_superstep.py [/tmp/itg_trace_super] [K=25]
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python benchmarks/parse_trace.py /tmp/itg_trace_super --cat [K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from infinite_texture_gans_tpu.config import (
    discriminator_kwargs, generator_kwargs, prepare_parser,
)
from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.train.train_step import (
    host_key,
    create_train_state, make_train_superstep,
)


def main(trace_dir: str, k: int) -> None:
    args = prepare_parser().parse_args([])
    args.padding_mode = "local"; args.attention = True
    args.n_layers_G = 6; args.n_layers_D = 4
    args.spec_norm_D = True; args.smooth = True; args.ema = True
    args.random_crop = 192; args.batch_size = 64; args.num_images = 8
    args.compute_dtype = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
    superstep = make_train_superstep(
        G, D, tx_G, tx_D, crop=args.random_crop, batch_size=args.batch_size,
        loss_type=args.loss, smooth=True, disc_iters=1, num_images=8,
        ema_decay=0.999, use_ema=True,
    )
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (768, 1024, 3), dtype=np.uint8))

    def keys(seed):
        base = jax.random.key(seed)
        ck, sk = jax.random.split(base)
        return (jax.random.split(ck, k), jax.random.split(sk, k))

    ck, sk = keys(0)
    state, _ = superstep(state, img, ck, sk)  # compile + warm
    jax.block_until_ready(state.params_G)

    jax.profiler.start_trace(trace_dir)
    ck, sk = keys(1)
    state, m = superstep(state, img, ck, sk)
    jax.block_until_ready(state.params_G)
    jax.profiler.stop_trace()
    print("g_loss[-1] =", float(m["g_loss"][-1]))
    print(f"trace written to {trace_dir} (one dispatch of K={k} steps; "
          f"divide totals by {k})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/itg_trace_super",
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
