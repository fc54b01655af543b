#!/usr/bin/env python
"""Throughput scaling vs discriminator batch size (one chip, Exp-1 shapes).

Each step trains D on `batch` real crops + 8 fake 3x3-patch grids and G on
the fakes — so larger --batch_size raises D work per step. Prints one JSON
line per config. Keys are pre-materialized (docs/PERF.md tunnel pitfalls).

Usage: python benchmarks/bench_scaling.py [batch ...]   (default 32 64 128)
"""

import json
import os
import sys
import time

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


def run(batch: int, n_steps: int = 30) -> dict:
    args = prepare_parser().parse_args([])
    args.padding_mode = "local"; args.attention = True
    args.n_layers_G = 6; args.n_layers_D = 4
    args.spec_norm_D = True; args.smooth = True; args.ema = True
    args.random_crop = 192; args.batch_size = batch; args.num_images = 8
    args.compute_dtype = "bfloat16"

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
    step = make_train_step(
        G, D, tx_G, tx_D, loss_type=args.loss, smooth=True, disc_iters=1,
        num_images=8, ema_decay=0.999, use_ema=True,
    )
    real = jax.device_put(np.random.default_rng(0).standard_normal(
        (batch, 192, 192, 3), dtype=np.float32).clip(-1, 1))
    keys = list(jax.random.split(jax.random.key(2), n_steps + 1))
    jax.block_until_ready(keys)
    state, _ = step(state, real, keys[-1])
    jax.block_until_ready(state.params_G)
    t0 = time.time()
    for i in range(n_steps):
        state, _ = step(state, real, keys[i])
    jax.block_until_ready(state.params_G)
    dt = time.time() - t0
    return {
        "batch_size": batch,
        "steps_per_sec": round(n_steps / dt, 2),
        "real_crops_per_sec": round(batch * n_steps / dt, 1),
        "fake_patches_per_sec": round(8 * 9 * n_steps / dt, 1),
    }


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 64, 128]
    for b in batches:
        print(json.dumps(run(b)), flush=True)


if __name__ == "__main__":
    main()
