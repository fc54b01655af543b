#!/usr/bin/env python
"""Trace a few full Exp-1 train steps (bf16 default) and dump the xplane dir.

Usage: python benchmarks/trace_step.py [/tmp/itg_trace_step]
       BENCH_RECIPE=ssm python benchmarks/trace_step.py [...]  # Exp-3-style
       SSM recipe (type_norm SSM, n_layers 5/3, crop 128) instead of Exp-1
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python benchmarks/parse_trace.py /tmp/itg_trace_step 40
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
from infinite_texture_gans_tpu.train.train_step import host_key, create_train_state, make_train_step


def main(trace_dir: str) -> None:
    args = prepare_parser().parse_args([])
    args.padding_mode = "local"; args.attention = True
    args.n_layers_G = 6; args.n_layers_D = 4
    args.spec_norm_D = True; args.smooth = True; args.ema = True
    args.random_crop = 192; args.batch_size = 64; args.num_images = 8
    if os.environ.get("BENCH_RECIPE") == "ssm":
        # Exp-3-style SSM recipe (reference README.md:41-47 row 3)
        args.type_norm_G = "SSM"; args.map_dim = 1
        args.n_layers_G = 5; args.n_layers_D = 3; args.random_crop = 128
    args.compute_dtype = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
    step = make_train_step(
        G, D, tx_G, tx_D, loss_type=args.loss, smooth=True, disc_iters=1,
        num_images=8, ema_decay=0.999, use_ema=True,
    )
    real = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch_size, args.random_crop, args.random_crop, 3),
        dtype=np.float32).clip(-1, 1))

    for i in range(3):  # compile + warm
        state, _ = step(state, real, jax.random.key(i))
    jax.block_until_ready(state.params_G)

    jax.profiler.start_trace(trace_dir)
    for i in range(5):
        state, _ = step(state, real, jax.random.key(100 + i))
    jax.block_until_ready(state.params_G)
    jax.profiler.stop_trace()
    print("trace written to", trace_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/itg_trace_step")
