"""End-to-end training driver.

Equivalent of reference train.py:12-227, with the loop body compiled into a
single jitted step (train_step.py). Flow, prints, loss accounting, checkpoint
cadence, the EMA side model and the losses.png plot match the reference; the
multi-device path uses a data mesh instead of nn.DataParallel.
"""

from __future__ import annotations

import math
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from infinite_texture_gans_tpu.config import (
    args_to_dict,
    discriminator_kwargs,
    generator_kwargs,
    prepare_parser,
)
from infinite_texture_gans_tpu.data.datasets import (
    DeviceCropSampler,
    DeviceMultiImageSampler,
    MultipleImagesDataset,
    Prefetcher,
    RotatingMultiImageSampler,
    SingleImageDataset,
    prepare_data,
)
from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from infinite_texture_gans_tpu.utils.watchdog import StallWatchdog
from infinite_texture_gans_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_train_state,
)
from infinite_texture_gans_tpu.train.train_step import (
    create_train_state,
    dispatch_plan,
    host_key,
    make_train_step,
    make_train_superstep,
)


def prepare_device(args):
    """Device selection (reference utils.py:134-145): --dev_num picks the
    primary device for single-device runs (the analog of the reference's
    CUDA_VISIBLE_DEVICES / cuda:<n>); multi-device layouts map --num_gpus /
    --gpu_list onto the mesh (``make_mesh``)."""
    import threading

    import jax

    # A tunneled accelerator backend can HANG at init when its transport is
    # down; tell the user what is happening and how to proceed instead of
    # freezing silently.
    hint = threading.Timer(
        75.0,
        lambda: print(
            "device backend init is taking unusually long — the accelerator "
            "tunnel may be down; rerun with --platform cpu to train on CPU",
            flush=True,
        ),
    )
    hint.daemon = True
    hint.start()
    try:
        devices = jax.devices()
    finally:
        hint.cancel()
    idx = min(getattr(args, "dev_num", 0) or 0, len(devices) - 1)
    return devices[idx]


def prepare_seed(args) -> int:
    """Random seed unless fixed (reference utils.py:147-156)."""
    seed = args.seed if args.seed is not None else random.randint(1, 10000)
    print("Random Seed: ", seed)
    return seed


def prepare_models(args):
    """Model factory (reference utils.py:195-208). Only patch_GAN builds a
    discriminator — other --D_model values error, matching the reference's
    effective behaviour (unbound netD)."""
    netG = ResidualPatchGenerator(**generator_kwargs(args))
    if args.D_model == "patch_GAN":
        netD = PatchDiscriminator(**discriminator_kwargs(args))
    else:
        raise ValueError(
            f"--D_model {args.D_model}: only patch_GAN is wired into the "
            "training pipeline (reference utils.py:205-208)"
        )
    return netG, netD


def prepare_filename(args) -> str:
    """Checkpoint prefix <fname>/<epochs>_ (reference utils.py:211-218)."""
    import os

    filename = f"{args.epochs}_"
    if args.fname is not None:
        os.makedirs(args.fname, exist_ok=True)
        filename = f"{args.fname}/{filename}"
    return filename


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def train(args) -> None:
    from infinite_texture_gans_tpu.config import apply_platform

    apply_platform(args)  # must precede prepare_device's jax.devices()
    device = prepare_device(args)
    from infinite_texture_gans_tpu import route_cache_for_backend

    route_cache_for_backend()  # ambient-CPU sessions use the per-host dir
    if getattr(args, "num_workers", 0):
        print(
            "Warning: --num_workers is ignored — single-image batches are "
            "sampled on device and the host prefetcher is a single thread"
        )
    # Deterministic resume needs the ORIGINAL run's seed: per-epoch keys
    # derive from fold_in(root_key(seed), epoch), so a resumed run that
    # drew a fresh random seed would replay epochs with different
    # crops/latents (caught round 5 on hardware: a no---seed resume
    # diverged from the uninterrupted run at the first resumed epoch).
    # The checkpoint stores the seed — restore it unless the user
    # explicitly overrides with --seed.
    resume_ckpt = None
    if getattr(args, "resume", None):
        resume_ckpt = load_checkpoint(args.resume)
        ckpt_seed = resume_ckpt.get("meta", {}).get("seed")
        if args.seed is None and ckpt_seed is not None:
            args.seed = int(ckpt_seed)
            print(
                f"--resume: restored the run's seed {args.seed} from the "
                "checkpoint (deterministic resume; pass --seed to override)"
            )
    seed = prepare_seed(args)
    print(args)

    dataset = prepare_data(args)
    print("Training samples: ", len(dataset))

    netG, netD = prepare_models(args)

    steps_per_epoch = max(1, math.ceil(len(dataset) / args.batch_size))
    if len(dataset) % args.batch_size and steps_per_epoch > 1:
        print(
            f"note: --sampling {len(dataset)} is not a multiple of "
            f"--batch_size {args.batch_size}; on-device epochs run "
            f"{steps_per_epoch} FULL batches (the reference's DataLoader "
            "draws a short final batch instead — PARITY.md deviations)"
        )
    # root key on the host CPU backend, and every eager key-chain op under
    # the CPU default-device context: tiny eager ops across a (possibly
    # tunneled) accelerator boundary are a latency lottery
    # (train_step.host_key; docs/PERF.md round 4). The derived key arrays
    # stay uncommitted, so they remain valid args for any device/mesh jit.
    import contextlib

    try:
        _cpu0 = jax.local_devices(backend="cpu")[0]
        cpu_keys = lambda: jax.default_device(_cpu0)
    except RuntimeError:
        cpu_keys = contextlib.nullcontext
    key = host_key(seed)
    with cpu_keys():
        key, init_key = jax.random.split(key)
    state, tx_G, tx_D = create_train_state(netG, netD, args, init_key, steps_per_epoch)

    print(netG)
    print(netD)
    print("# Params. G: ", param_count(state.params_G))
    print("# Params. D: ", param_count(state.params_D))

    mesh = make_mesh(
        getattr(args, "mesh", None), args.num_gpus, getattr(args, "gpu_list", None)
    )
    if mesh is not None:
        print(f"mesh: {mesh}")
        state = replicate(state, mesh)
    elif device is not jax.devices()[0]:
        # --dev_num selected a non-default device: pin state + data there
        state = jax.device_put(state, device)

    step_kw = dict(
        loss_type=args.loss,
        smooth=args.smooth,
        disc_iters=args.disc_iters,
        num_images=args.num_images,
        ema_decay=args.ema_decay,
        use_ema=args.ema,
        gp_weight=getattr(args, "gp_weight", 10.0),
        mesh=mesh,
    )
    train_step = make_train_step(netG, netD, tx_G, tx_D, **step_kw)

    filename = prepare_filename(args)
    start_time = time.time()
    G_losses, D_losses = [], []
    start_epoch = 0
    if resume_ckpt is not None:
        ckpt = resume_ckpt
        state, start_epoch = restore_train_state(state, ckpt, steps_per_epoch)
        G_losses = list(ckpt["meta"].get("Gloss", []))
        D_losses = list(ckpt["meta"].get("Dloss", []))
        if mesh is not None:
            state = replicate(state, mesh)
        print(f"Resumed from {args.resume} at epoch {start_epoch}")

    # training batches are sampled ON DEVICE whenever the source data fits
    # in HBM (single_image: the one ~1MB texture; multiple_images: the
    # padded image stack up to DeviceMultiImageSampler.MAX_DEVICE_MB) —
    # shipping 64x192^2 crops per step would be ~28MB of H2D each step;
    # under a mesh the sampler emits batches already sharded on their
    # leading axis (no per-step device-to-device re-shard)
    sampler_put = (
        None if device is jax.devices()[0]
        else (lambda x: jax.device_put(x, device))
    )
    if isinstance(dataset, SingleImageDataset):
        device_sampler = DeviceCropSampler(
            dataset, mesh=mesh, device_put=sampler_put
        )
    elif isinstance(dataset, MultipleImagesDataset):
        device_sampler, why_not = DeviceMultiImageSampler.maybe_build(
            dataset, mesh=mesh, device_put=sampler_put,
            batch_size=args.batch_size, seed=args.seed,
        )
        if device_sampler is None:
            print(
                f"on-device multi-image sampling disabled ({why_not}); "
                "falling back to the host prefetcher"
            )
        elif isinstance(device_sampler, RotatingMultiImageSampler):
            print(
                f"multi-image dataset exceeds the device cap: rotating "
                f"HBM subset of {device_sampler.subset_size}/"
                f"{device_sampler.n_images} images per dispatch "
                "(next window's H2D overlaps compute)"
            )
        else:
            print(
                f"multi-image batches sampled on device "
                f"({len(dataset.files)} images stacked in HBM)"
            )
    else:
        device_sampler = None

    # K steps per device dispatch on the on-device-sampled path: the epoch
    # becomes a handful of lax.scan dispatches (crops sampled in-jit) instead
    # of 2 jit calls per step. Same key derivation and algorithm (equal to
    # the per-step path up to reduction-order float noise,
    # tests/test_train.py::test_superstep_matches_per_step); worth ~20% wall
    # on a high-latency dispatch link (docs/PERF.md round 3).
    spd = getattr(args, "steps_per_dispatch", 0) or 0
    if args.profile_dir:
        spd = 1  # keep the profiler trace to a few steps
    k_dispatch, k_remainder = (
        dispatch_plan(steps_per_epoch, 128 if spd == 0 else spd)
        if device_sampler is not None
        else (1, 0)
    )
    superstep = None
    if k_dispatch > 1:
        superstep = make_train_superstep(
            netG,
            netD,
            tx_G,
            tx_D,
            crop=(device_sampler.random_crop or None),
            batch_size=args.batch_size,
            sampler=device_sampler.kind,
            **step_kw,
        )
        print(
            f"steps per dispatch: {k_dispatch}"
            + (f" (+ one {k_remainder}-step remainder chunk)" if k_remainder else "")
        )

    profiled = False
    saver = AsyncCheckpointer()

    # Deferred epoch-metrics fetch: ``pending`` holds the previous epoch's
    # packed (still-on-device) metrics so its device_get can overlap with the
    # CURRENT epoch's compute instead of inserting a host round trip between
    # epochs (see the comment at the pack site below).
    pending = None  # (epoch, names, packed_device_array, batch_sizes)

    def _flush_epoch_metrics(entry):
        e, names, packed_dev, batch_sizes = entry
        packed = jax.device_get(packed_dev)
        watchdog.beat()  # a completed fetch is REAL device progress
        stacked = {n: packed[i] for i, n in enumerate(names)}
        d_run = g_run = 0.0
        for i, b_size in enumerate(batch_sizes):
            d_run += float(stacked["d_loss_fake"][i]) * args.num_images + float(
                stacked["d_loss_real"][i]
            ) * b_size
            g_run += float(stacked["g_loss"][i]) * args.num_images
        d_run /= max(1, sum(batch_sizes))
        g_run /= max(1, args.num_images * len(batch_sizes))
        # device_get above blocks until epoch ``e`` finished on device, so
        # the elapsed/steps-per-sec report stays accurate even though the
        # print is issued one epoch late.
        elapsed_min = (time.time() - start_time) / 60
        steps_sec = (e + 1) * steps_per_epoch / (time.time() - start_time)
        print(
            "[%d/%d]\tLoss_D: %.4f\tLoss_G: %.4f, elapsed_time = %.4f min (%.2f steps/s)"
            % (e + 1, args.epochs, d_run, g_run, elapsed_min, steps_sec)
        )
        G_losses.append(g_run)
        D_losses.append(d_run)

    print("Starting Training Loop...")
    # Warns (stderr, once per episode) if the device stops making progress
    # — a wedged remote-device connection blocks forever with no exception;
    # the operator must probe/kill/--resume (utils/watchdog.py).
    watchdog = StallWatchdog().start()
    try:
        for epoch in range(start_epoch, args.epochs):
            # rotating multi-image sampler: (seed, epoch)-seeded window
            # permutation — resume replays the same windows, and each
            # ``device_sampler.img`` access below consumes one window and
            # stages the next window's H2D behind the running dispatch
            if hasattr(device_sampler, "prepare_epoch"):
                device_sampler.prepare_epoch(epoch)
            # Per-epoch keys derive from (root key, epoch index), NOT a
            # sequentially-advanced chain: a run resumed at epoch k draws
            # exactly the keys the uninterrupted run would have drawn
            # (deterministic-by-seed restart, SURVEY.md §5; tested
            # resumed ≡ uninterrupted in tests/test_train.py).
            with cpu_keys():  # local eager key ops (see root-key comment)
                data_key, epoch_key = jax.random.split(
                    jax.random.fold_in(key, epoch)
                )
                step_keys = jax.random.split(epoch_key, steps_per_epoch)
                crop_keys = (
                    jax.random.split(data_key, steps_per_epoch)
                    if device_sampler is not None
                    else None
                )
            # Metrics stay on device during the epoch (a float() per step would
            # force a host sync and serialize dispatch); one block at epoch end.
            epoch_metrics = []
            batch_sizes = []
            if superstep is not None:
                n_full = steps_per_epoch // k_dispatch
                chunks = [
                    slice(ci * k_dispatch, (ci + 1) * k_dispatch)
                    for ci in range(n_full)
                ]
                if k_remainder:
                    # the remainder chunk re-enters the SAME jitted superstep
                    # with (remainder,)-length key arrays — jit compiles that
                    # second scan shape once and every epoch reuses it
                    chunks.append(slice(n_full * k_dispatch, steps_per_epoch))
                for sl in chunks:
                    state, metrics = superstep(
                        state, device_sampler.img, crop_keys[sl], step_keys[sl]
                    )
                    epoch_metrics.append(metrics)  # dict of (K,) arrays
                batch_sizes = [args.batch_size] * steps_per_epoch
            else:
                if device_sampler is not None:
                    prefetcher = (
                        device_sampler.sample(crop_keys[i], args.batch_size)
                        for i in range(steps_per_epoch)
                    )
                else:
                    prefetcher = Prefetcher(
                        dataset,
                        args.batch_size,
                        steps_per_epoch,
                        seed=int(jax.random.randint(data_key, (), 0, 2**31 - 1)),
                        device_put=(lambda x: shard_batch(x, mesh)),
                    )
                if args.profile_dir and not profiled and epoch == 0:
                    jax.profiler.start_trace(args.profile_dir)
                for i, real_x in enumerate(prefetcher):
                    state, metrics = train_step(state, real_x, step_keys[i])
                    epoch_metrics.append(metrics)
                    batch_sizes.append(real_x.shape[0])
                    if args.profile_dir and not profiled and epoch == 0 and i == 4:
                        jax.block_until_ready(state.params_G)
                        jax.profiler.stop_trace()
                        profiled = True

            # Gather the per-step scalars into ONE device array (device_get
            # on the raw list would move ~3*steps_per_epoch tiny arrays, one
            # round trip per metric), but DEFER the fetch by one epoch: a
            # device_get here blocks until this epoch's dispatches finish and
            # pays a host round trip (~0.1-0.2 s on the axon tunnel) BETWEEN
            # epochs — dead air on the device. The packed array rides on
            # device until the NEXT epoch has been dispatched, so the fetch
            # overlaps its compute and the device never idles (worth ~6% wall
            # at 125-step epochs through the tunnel; docs/PERF.md). Superstep
            # chunks arrive pre-stacked as (K,) arrays; per-step metrics as
            # scalars.
            combine = jnp.concatenate if superstep is not None else jnp.stack
            names = sorted(epoch_metrics[0])
            packed_dev = jnp.stack(
                [combine([m[n] for m in epoch_metrics]) for n in names]
            )
            if pending is not None:
                _flush_epoch_metrics(pending)
                pending = None
            current = (epoch, names, packed_dev, batch_sizes)
            ckpt_due = args.saving_rate is not None and (
                (epoch + 1) % args.saving_rate == 0 or (epoch + 1) == args.epochs
            )
            if ckpt_due or (epoch + 1) == args.epochs:
                # the checkpoint meta embeds the loss history through THIS
                # epoch, and the final epoch plots it — fetch now.
                _flush_epoch_metrics(current)
            else:
                pending = current

            if ckpt_due:
                saver.submit(
                    filename + f"{epoch + 1}.ckpt",
                    {
                        "meta": {
                            "epoch": epoch + 1,
                            "args": args_to_dict(args),
                            "seed": seed,
                            "Gloss": G_losses,
                            "Dloss": D_losses,
                        },
                        "netG_variables": {"params": state.params_G, **state.aux_G},
                        "netD_variables": {"params": state.params_D, **state.aux_D},
                        "opt_G": state.opt_G,
                        "opt_D": state.opt_D,
                        "ema": state.ema if state.ema is not None else {},
                    },
                )

            if epoch + 1 == args.epochs:
                if args.ema:
                    saver.submit(
                        filename + "_ema.ckpt",
                        {
                            "meta": {"args": args_to_dict(args)},
                            "netG_variables": {
                                "params": state.ema["params"],
                                "batch_stats": state.ema["batch_stats"],
                            },
                        },
                    )
                _plot_losses(G_losses, D_losses, filename)
    except BaseException:
        # Drain in-flight saves so a crash/Ctrl-C does not kill the
        # daemon worker mid-write (truncated checkpoint file); swallow
        # the drain's own errors so they never mask the original one.
        try:
            saver.wait()
        except Exception:
            pass
        watchdog.stop()
        raise
    saver.wait()  # all submitted checkpoints on disk before train() returns
    watchdog.stop()


def _plot_losses(G_losses, D_losses, filename) -> None:
    """losses.png (reference train.py:220-227)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig = plt.figure(figsize=(10, 5))
    plt.title("Generator and Discriminator Loss During Training")
    plt.plot(G_losses, label="G")
    plt.plot(D_losses, label="D")
    plt.xlabel("iterations")
    plt.ylabel("Loss")
    plt.legend()
    fig.savefig(filename + "losses.png")
    plt.close(fig)


def main():
    args = prepare_parser().parse_args()
    train(args)


if __name__ == "__main__":
    main()
