#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: G+D training steps/sec on the Experiment-1 recipe shape
(BASELINE.md: crop 192 batch 64 real images, 8 fake images of 3x3 patches of
128px through the G_ch=52 / n_layers_G=6 / attention generator, BCE loss,
spec_norm_D, EMA). Also reports patches/sec/chip and 1024x1024 generation
wall-clock as secondary metrics inside the same JSON object.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is our measured PyTorch-CPU-equivalent... not measurable here;
vs_baseline is reported as the ratio to the round-1 recorded TPU number when
BENCH_BASELINE.json exists, else 1.0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _supervise() -> int:
    """Run the benchmark in a CHILD process with a per-attempt timeout and
    retries. A single process's axon connection can wedge forever (threads
    parked at ~0 CPU) while FRESH connections work fine (CLAUDE.md) — a
    hang the in-process backend probe cannot catch once the run is past
    init. Each retry is a new process (new connection), and the persistent
    XLA compilation cache makes retries converge even when an attempt was
    killed mid-compile on a cold host: every compile finished before the
    kill is a disk cache hit for the next attempt."""
    attempts = int(os.environ.get("ITG_BENCH_ATTEMPTS", "3"))
    per_attempt_s = float(os.environ.get("ITG_BENCH_ATTEMPT_S", "1200"))
    env = dict(os.environ, ITG_BENCH_CHILD="1")
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                timeout=per_attempt_s, env=env, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {i + 1}/{attempts}: no result in "
                f"{per_attempt_s:.0f}s (hung connection or cold compile) — "
                "retrying in a fresh process",
                file=sys.stderr,
            )
            continue
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("{")), None
        )
        if r.returncode == 0 and line is not None:
            print(line)
            return 0
        print(
            f"bench attempt {i + 1}/{attempts} failed (rc={r.returncode}):\n"
            f"{r.stderr[-2000:]}",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "train_steps_per_sec_exp1",
        "value": 0.0,
        "unit": "steps/s",
        "vs_baseline": 0.0,
        "error": f"no attempt finished within {per_attempt_s:.0f}s x "
                 f"{attempts} (tunnel hang or failure) — see the last "
                 "BENCH_r*.json / docs/PERF.md for measured numbers",
    }))
    return 1


def _canvas_device_seconds(gen, variables, size: int, seed: int = 33,
                           num_images: int = 1):
    """DEVICE seconds of ONE whole-canvas dispatch, from an xplane trace
    (sum of device-plane op durations, control-flow wrapper events
    excluded — benchmarks/parse_trace.py's method, inline). Host-side
    timing CANNOT measure this program on the tunneled backend: a warm
    1024^2 canvas dispatch costs ~450 ms of fixed per-call turnaround
    around 17.7 ms of device time (round 5, measured), and back-to-back
    dispatches do NOT amortize it — so only the device trace is ground
    truth (CLAUDE.md). Returns None when the trace toolchain (tensorflow
    protobuf defs) is unavailable."""
    import glob
    import tempfile

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks"),
        )
        from parse_trace import load_xspace
    except Exception:
        return None
    import jax

    from infinite_texture_gans_tpu.sampling import latents
    from infinite_texture_gans_tpu.sampling.infinite import (
        _canvas_dispatch,
        canvas_geometry,
        init_halo_state,
    )

    P, gh, gw = gen.patch_resolution, gen.num_patches_h, gen.num_patches_w
    steps_h, steps_w, tot_h, tot_w = canvas_geometry(size, size, P, gh, gw)
    zk, mk = jax.random.split(jax.random.key(seed))
    z_full = latents.build_z_full(
        zk, num_images, gen.z_dim, gen.base_res, tot_h, tot_w
    )
    maps_full = None
    if gen.type_norm == "SSM":
        maps_full = latents.build_maps_full(
            mk, num_images, gen.map_dim, gen.n_layers_G, gen.base_res,
            tot_h, tot_w,
        )
    halo = init_halo_state(
        gen.site_specs(), num_images, gh, gw, tot_w, dtype=gen.dtype
    )
    dispatch = lambda: _canvas_dispatch(
        gen, variables, z_full, maps_full, halo, steps_h, steps_w,
        maps_full is not None, True, size, size,
    )
    out = dispatch()
    float(jax.device_get(out[0, -1, -1, 0]))  # warm + materialize
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        out = dispatch()
        float(jax.device_get(out[0, -1, -1, 0]))
        jax.profiler.stop_trace()
        paths = sorted(glob.glob(f"{td}/**/*.xplane.pb", recursive=True))
        if not paths:
            return None
        xs = load_xspace(paths[-1])
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = (
                    ev_meta[ev.metadata_id].name
                    if ev.metadata_id in ev_meta else "?"
                )
                head = name.split(" ", 1)[0]
                if head.startswith("%while") or head.startswith("%conditional"):
                    continue
                total_ps += ev.duration_ps
    return (total_ps / 1e12) or None


def _wait_for_backend(max_wait_s: int = 900) -> bool:
    """The axon tunnel occasionally goes down, and a backend-init attempt
    then HANGS (not errors) — which would hang this whole benchmark. Probe
    device init in a subprocess with a timeout, retrying for up to
    ``max_wait_s``, so bench.py either runs or fails fast with an honest
    JSON line instead of wedging the driver."""
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        time.sleep(30)


def main() -> None:
    if not _wait_for_backend():
        print(json.dumps({
            "metric": "train_steps_per_sec",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "error": "device backend unavailable (axon tunnel down; init "
                     "probe hung/failed for 15 min) — see BENCH_r02.json / "
                     "docs/PERF.md for the last measured numbers",
        }))
        return
    t_setup = time.time()
    import jax
    import jax.numpy as jnp

    from infinite_texture_gans_tpu import route_cache_for_backend

    route_cache_for_backend()  # ambient-CPU sessions use the per-host dir

    from infinite_texture_gans_tpu.config import (
        discriminator_kwargs,
        generator_kwargs,
        prepare_parser,
    )
    from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
    from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas
    from infinite_texture_gans_tpu.train.train_step import (
        create_train_state,
        host_key,
        make_train_step,
        make_train_superstep,
    )

    # Experiment-1 recipe (BASELINE.md / reference README.md:34)
    args = prepare_parser().parse_args([])
    args.padding_mode = "local"
    args.attention = True
    args.n_layers_G = 6
    args.n_layers_D = 4
    args.spec_norm_D = True
    args.smooth = True
    args.ema = True
    args.random_crop = 192
    args.batch_size = 64
    args.num_images = 8
    # production config: bfloat16 compute (+ channels-major Pallas tail on
    # TPU); override with BENCH_COMPUTE_DTYPE=float32 for the parity dtype.
    args.compute_dtype = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))

    # CPU-committed key: the eager key ops around state init must not
    # dispatch across the tunnel (latency lottery; train_step.host_key)
    key = host_key(0)
    state, tx_G, tx_D = create_train_state(G, D, args, key, steps_per_epoch=125)
    step_kw = dict(
        loss_type=args.loss, smooth=args.smooth, disc_iters=args.disc_iters,
        num_images=args.num_images, ema_decay=args.ema_decay, use_ema=args.ema,
    )

    # The production train loop runs K steps per device dispatch
    # (train_step.make_train_superstep: lax.scan over the fused step with
    # the real crops sampled in-jit from the on-device source texture) —
    # bench the same path at the production dispatch size: the Exp-1 recipe
    # has 125 steps/epoch and dispatch_chunk(125, 128) = 125, so one timed
    # dispatch IS one production epoch. (A 10-step superstep xplane trace
    # measures 20.14 ms/step of device time — identical to the per-step
    # path's 20.1 ms, i.e. the in-scan crop sampling is free; what a longer
    # loop amortizes is only the fixed ~35 ms host dispatch latency of the
    # axon tunnel.) BENCH_MODE=step measures the per-step-dispatch path
    # instead (the round-1/2 methodology; ~5 ms/step dispatch latency
    # through the tunnel sits on top of the device step there).
    n_steps = int(os.environ.get("BENCH_STEPS", "125"))
    per_step_mode = os.environ.get("BENCH_MODE") == "step"
    img = jax.device_put(
        np.random.default_rng(3).integers(0, 256, (440, 614, 3), dtype=np.uint8)
    )
    if per_step_mode:
        step = make_train_step(G, D, tx_G, tx_D, **step_kw)
        real = jax.device_put(
            np.random.default_rng(0).standard_normal(
                (args.batch_size, args.random_crop, args.random_crop, 3),
                dtype=np.float32,
            ).clip(-1, 1)
        )
        # warmup / compile. The barrier MATERIALIZES the metrics: on this
        # tunneled backend block_until_ready has been observed to return
        # while the compile/execution is still in flight, which would push
        # ~150 s of warmup into the first timed dispatch (docs/PERF.md r4).
        state, m0 = step(state, real, jax.random.key(1))
        assert np.isfinite(float(np.asarray(jax.device_get(m0["g_loss"]))))
        setup_s = time.time() - t_setup
        # pre-split keys ON DEVICE and materialize the list BEFORE the
        # timer: both a fresh jax.random.key(i) and a first key-array index
        # inside the loop would remote-compile/transfer through the axon
        # tunnel and poison the measurement
        step_keys = list(jax.random.split(jax.random.key(2), n_steps))
        jax.block_until_ready(step_keys)
        t0 = time.time()
        for i in range(n_steps):
            state, metrics = step(state, real, step_keys[i])
        # materializing barrier — see the superstep branch's comment
        final_g_loss = float(np.asarray(jax.device_get(metrics["g_loss"])))
        dt = time.time() - t0
        assert np.isfinite(final_g_loss)
    else:
        superstep = make_train_superstep(
            G, D, tx_G, tx_D, crop=args.random_crop,
            batch_size=args.batch_size, **step_kw,
        )
        # Production steady state (train_loop.py): epoch N+1 is dispatched
        # before epoch N's metrics are fetched, so the host round trip
        # overlaps device compute and back-to-back dispatches keep the
        # device queue full. Time M pipelined dispatches with ONE final
        # block — a single timed dispatch would charge a full tunnel round
        # trip (~0.15 s) against one epoch, which production never pays.
        n_disp = int(os.environ.get("BENCH_DISPATCHES", "3"))
        crop_keys = jax.random.split(jax.random.key(1), (n_disp + 2) * n_steps)
        step_keys = jax.random.split(jax.random.key(2), (n_disp + 2) * n_steps)
        # warmup / compile: TWO full-length dispatches, each closed by a
        # MATERIALIZING barrier. One warmup is not enough: (a) on this
        # tunneled backend block_until_ready has been seen returning while
        # compile/execution is still in flight, and (b) the first
        # steady-state dispatch consumes the DONATED output of the warmup,
        # whose layouts can differ from create_train_state's device_put
        # layouts — either way ~150 s of one-time cost lands in the first
        # timed dispatch (measured; docs/PERF.md r4).
        for w in range(2):
            sl = slice(w * n_steps, (w + 1) * n_steps)
            state, m0 = superstep(state, img, crop_keys[sl], step_keys[sl])
            assert np.isfinite(float(np.asarray(jax.device_get(m0["g_loss"]))[-1]))
        setup_s = time.time() - t_setup
        t0 = time.time()
        for d in range(2, n_disp + 2):
            sl = slice(d * n_steps, (d + 1) * n_steps)
            state, metrics = superstep(state, img, crop_keys[sl], step_keys[sl])
        # The barrier must MATERIALIZE data, not just wait: on a degraded
        # tunnel block_until_ready has been observed to return early
        # (~8 ms for 3x125 steps — a 47,000 steps/s artifact), while an
        # actual D2H of the final metrics cannot lie. Costs one tunnel
        # round trip (~0.15 s on ~7.5 s measured) — an honest lower bound.
        final_g_loss = float(np.asarray(jax.device_get(metrics["g_loss"]))[-1])
        dt = time.time() - t0
        assert np.isfinite(final_g_loss)
        n_steps *= n_disp
    steps_per_sec = n_steps / dt
    # patches through G per train step: num_images * 3x3 (train fake grid)
    patches_per_sec = steps_per_sec * args.num_images * 9

    # 1024^2 generation wall-clock (after warmup of the step function)
    gen_vars = {"params": state.params_G, **state.aux_G}
    t0 = time.time()
    img = generate_canvas(G, gen_vars, jax.random.key(9), 1024, 1024, num_images=1)
    gen_1024_s = time.time() - t0
    # second run: compiled path only
    t0 = time.time()
    img = generate_canvas(G, gen_vars, jax.random.key(10), 1024, 1024, num_images=1)
    gen_1024_warm_s = time.time() - t0
    # The f32 wire above ships the exact float canvas for the seam metrics;
    # the PRODUCTION save path (sample.py) uses the u8 wire (quantized on
    # device, 4x less D2H — the wire, not the device, bounds wall time
    # through the tunnel). Time it separately so the headline reflects what
    # a user pays.
    generate_canvas(G, gen_vars, jax.random.key(11), 1024, 1024, num_images=1,
                    wire="u8")  # compile
    t0 = time.time()
    generate_canvas(G, gen_vars, jax.random.key(12), 1024, 1024, num_images=1,
                    wire="u8")
    gen_1024_warm_u8_s = time.time() - t0

    from infinite_texture_gans_tpu.utils.metrics import adjacent_mse_baseline, seam_mse

    # width=1 keeps the metric comparable with rounds 1-2 (and with
    # adjacent_mse_baseline, which is also a 1-line statistic)
    seam = seam_mse(img, G.patch_resolution, width=1)
    natural = adjacent_mse_baseline(img)

    # Streamed engine: device-side uint8 + overlap trimming + async D2H
    # (sampling/stream.py) — the production path for large canvases.
    from infinite_texture_gans_tpu.sampling.stream import generate_canvas_streamed

    generate_canvas_streamed(G, gen_vars, jax.random.key(13), 1024, 1024, "/tmp/bench_s.png")
    t0 = time.time()
    generate_canvas_streamed(G, gen_vars, jax.random.key(14), 1024, 1024, "/tmp/bench_s.png")
    gen_1024_streamed_warm_s = time.time() - t0

    # Engine exactness on hardware: patch-by-patch (stateful halo cache) must
    # reproduce the one-pass oracle bit-for-bit up to accumulation order.
    from infinite_texture_gans_tpu.sampling.infinite import generate_one_pass
    from infinite_texture_gans_tpu.sampling.latents import build_z_full

    # Engine exactness is measured in f32 on the NHWC path on both sides:
    # it is a property of the halo-cache scan vs the one-pass oracle, and
    # must not be polluted by bf16 rounding or by cross-path float flavor
    # (an untrained net's unnormalized activations amplify either to ~1e-2;
    # the Pallas-kernel equivalence has its own tests).
    import jax.numpy as jnp

    G32 = G.clone(dtype=jnp.float32, chw_tail="off")
    vars32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x, gen_vars
    )
    z5 = build_z_full(jax.random.key(11), 1, args.z_dim, args.base_res, 5, 5)
    pbp = generate_canvas(
        G32, vars32, jax.random.key(11), 5 * G.patch_resolution,
        5 * G.patch_resolution, num_images=1, z_full=z5,
    )
    onep = np.asarray(generate_one_pass(G32, vars32, z5, None, 5, 5))
    engine_max_err = float(np.abs(pbp - onep).max())

    # Trained-model seam check — the SELF-PROVING seam number (the fields
    # above use the bench's own 21-step net and measure the TPU
    # accumulation-noise floor instead; see seam_note). Runs when the
    # bundled trained checkpoint is present. The fused-up-conv eval engine
    # (--fuse_up all) and the batched-diagonal engine (--diag_lanes) get
    # their own trained seam ratios so a quality regression in either shows
    # up in the driver artifact, not only in the CPU test suite
    # (BENCH_SEAM_ENGINES=0 skips the two extra engine compiles).
    trained_seam = {}
    ckpt_path = os.path.join("examples", "241_300ep_ema.ckpt")
    if os.path.exists(ckpt_path):
        from infinite_texture_gans_tpu.train.checkpoint import (
            load_generator_from_checkpoint,
        )

        Gt, vt, _ = load_generator_from_checkpoint(ckpt_path)
        # 3 latent seeds: fresh-run single-seed ratios ranged 0.89-1.14
        # across rounds, so a single seed cannot separate a real seam
        # regression from seed luck — report the per-seed list + mean/range
        # (VERDICT r4 #9). Seed 21 stays first for continuity with r2-r4.
        ratios = []
        for sd in (21, 22, 23):
            img_t = generate_canvas(
                Gt, vt, jax.random.key(sd), 1024, 1024, num_images=1
            )
            s_t = seam_mse(img_t, Gt.patch_resolution, width=1)
            n_t = adjacent_mse_baseline(img_t)
            ratios.append(s_t / max(n_t, 1e-12))
            if sd == 21:
                trained_seam = {
                    "seam_ratio_trained_1024": round(ratios[0], 4),
                    "seam_mse_trained_1024": s_t,
                    "adjacent_mse_natural_trained": n_t,
                }
        trained_seam["seam_ratio_trained_1024_seeds"] = [
            round(r, 4) for r in ratios
        ]
        trained_seam["seam_ratio_trained_1024_mean"] = round(
            float(np.mean(ratios)), 4
        )
        trained_seam["seam_ratio_trained_1024_range"] = [
            round(min(ratios), 4), round(max(ratios), 4)
        ]
        if os.environ.get("BENCH_SEAM_ENGINES", "1") != "0":
            img_f = generate_canvas(
                Gt.clone(fuse_up="all"), vt, jax.random.key(21), 1024, 1024,
                num_images=1,
            )
            trained_seam["seam_ratio_trained_1024_fused"] = round(
                seam_mse(img_f, Gt.patch_resolution, width=1)
                / max(adjacent_mse_baseline(img_f), 1e-12), 4,
            )
            from infinite_texture_gans_tpu.sampling.diag import (
                generate_canvas_diag,
            )

            img_d = generate_canvas_diag(
                Gt, vt, jax.random.key(21), 1024, 1024, num_images=1
            )
            trained_seam["seam_ratio_trained_1024_diag"] = round(
                seam_mse(img_d, Gt.patch_resolution, width=1)
                / max(adjacent_mse_baseline(img_d), 1e-12), 4,
            )

    # MFU: measured throughput vs the analytic model-FLOPs bound
    # (utils/flops.py; validated against XLA's HLO cost analysis). Canvas
    # MFU is DEVICE-side (pipelined dispatches + materializing slice
    # barrier, _canvas_device_seconds) — the retired
    # mfu_canvas_1024_u8_wall field divided by tunnel wall time, which is
    # dominated by the ~15 MB/s wire D2H: it measured the wire, not the
    # chip (VERDICT r4 weak #1).
    from infinite_texture_gans_tpu.utils import flops as Fl

    step_flops = Fl.train_step_flops(
        G, D, batch_size=args.batch_size, crop=args.random_crop,
        num_images=args.num_images, disc_iters=args.disc_iters,
    )
    peak = Fl.peak_flops(jax.devices()[0], args.compute_dtype)

    # device-side canvas seconds on the trained flagship G (bundled ckpt)
    # when present, else the bench's own net — 1024^2 and the 4096^2
    # headline the round-4 verdict asked to publish and attack
    canvas_dev = {}
    if os.environ.get("BENCH_CANVAS_DEVICE", "1") != "0":
        Gc, vc = (Gt, vt) if trained_seam else (G, gen_vars)
        s1k = _canvas_device_seconds(Gc, vc, 1024)
        s4k = _canvas_device_seconds(Gc, vc, 4096)
        # the occupancy lever: N canvases through ONE scan (the batch dim
        # of every kernel; CLI: test_sample.py --batch N) — per-canvas
        # device time drops as the batch fills the MXU (round-5 audit: the
        # dominant canvas cost is tiny batch-1 XLA convs at 12^2-96^2)
        s1k_b4 = _canvas_device_seconds(Gc, vc, 1024, num_images=4)
        if s1k:
            canvas_dev["gen_1024_device_s"] = round(s1k, 4)
        if s4k:
            canvas_dev["gen_4096_device_s"] = round(s4k, 4)
        if s1k_b4:
            canvas_dev["gen_1024_device_s_per_canvas_b4"] = round(
                s1k_b4 / 4, 4
            )
        if peak and s1k:
            canvas_dev["mfu_canvas_1024_device"] = round(
                Fl.canvas_flops(Gc, 1024, 1024) / s1k / peak, 4
            )
        if peak and s4k:
            canvas_dev["mfu_canvas_4096_device"] = round(
                Fl.canvas_flops(Gc, 4096, 4096) / s4k / peak, 4
            )
        if peak and s1k_b4:
            canvas_dev["mfu_canvas_1024_device_b4"] = round(
                Fl.canvas_flops(Gc, 1024, 1024) / (s1k_b4 / 4) / peak, 4
            )

    mfu = {}
    if peak:
        mfu = {
            "train_step_model_tflops": round(step_flops / 1e12, 3),
            "mfu_train_step": round(step_flops * steps_per_sec / peak, 4),
        }

    # SSM-mode step throughput + MFU (VERDICT r4 weak #2: the SSM recipe
    # had no MFU/floor number). Exp-3-style shapes: SSM norm, n_layers_G 5,
    # n_layers_D 3, crop 128 — timed through the same production superstep
    # path as the headline. BENCH_SSM=0 skips (e.g. cold-cache hosts).
    # cold-host guard: on a fresh compile cache the SSM branch's superstep
    # compile can push the attempt past the supervisor's per-attempt
    # timeout; skip it when the run is already deep into its budget — the
    # retry (with everything above now disk-cached) will reach it
    ssm_deadline = float(os.environ.get("ITG_BENCH_SSM_DEADLINE_S", "700"))
    ssm = {}
    if (os.environ.get("BENCH_SSM", "1") != "0"
            and time.time() - t_setup < ssm_deadline):
        args_s = prepare_parser().parse_args([])
        args_s.padding_mode = "local"
        args_s.attention = True
        args_s.type_norm_G = "SSM"
        args_s.n_layers_G = 5
        args_s.n_layers_D = 3
        args_s.spec_norm_D = True
        args_s.smooth = True
        args_s.ema = True
        args_s.random_crop = 128
        args_s.batch_size = 64
        args_s.num_images = 8
        args_s.compute_dtype = args.compute_dtype
        Gs = ResidualPatchGenerator(**generator_kwargs(args_s))
        Ds = PatchDiscriminator(**discriminator_kwargs(args_s))
        state_s, tx_Gs, tx_Ds = create_train_state(
            Gs, Ds, args_s, host_key(5), steps_per_epoch=125
        )
        superstep_s = make_train_superstep(
            Gs, Ds, tx_Gs, tx_Ds, crop=args_s.random_crop,
            batch_size=args_s.batch_size, loss_type=args_s.loss,
            smooth=args_s.smooth, disc_iters=args_s.disc_iters,
            num_images=args_s.num_images, ema_decay=args_s.ema_decay,
            use_ema=args_s.ema,
        )
        k_ssm = 125
        n_disp_s = int(os.environ.get("BENCH_SSM_DISPATCHES", "2"))
        ck = jax.random.split(jax.random.key(6), (n_disp_s + 2) * k_ssm)
        sk = jax.random.split(jax.random.key(7), (n_disp_s + 2) * k_ssm)
        img_s = jax.device_put(
            np.random.default_rng(8).integers(
                0, 256, (450, 600, 3), dtype=np.uint8
            )
        )
        for w in range(2):  # two materialized warmups (donation layouts)
            sl = slice(w * k_ssm, (w + 1) * k_ssm)
            state_s, m_s = superstep_s(state_s, img_s, ck[sl], sk[sl])
            assert np.isfinite(
                float(np.asarray(jax.device_get(m_s["g_loss"]))[-1])
            )
        t0 = time.time()
        for d in range(2, n_disp_s + 2):
            sl = slice(d * k_ssm, (d + 1) * k_ssm)
            state_s, m_s = superstep_s(state_s, img_s, ck[sl], sk[sl])
        assert np.isfinite(
            float(np.asarray(jax.device_get(m_s["g_loss"]))[-1])
        )
        dt_s = time.time() - t0
        ssm_sps = n_disp_s * k_ssm / dt_s
        flops_ssm = Fl.train_step_flops(
            Gs, Ds, batch_size=args_s.batch_size, crop=args_s.random_crop,
            num_images=args_s.num_images, disc_iters=args_s.disc_iters,
        )
        ssm = {"ssm_steps_per_sec": round(ssm_sps, 2)}
        if peak:
            ssm["train_step_model_tflops_ssm"] = round(flops_ssm / 1e12, 3)
            ssm["mfu_train_step_ssm"] = round(flops_ssm * ssm_sps / peak, 4)
        del state_s, superstep_s  # free the SSM HBM before returning

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    vs_baseline = (steps_per_sec / baseline) if baseline else 1.0

    result = {
        "metric": "train_steps_per_sec_exp1",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 4),
        "extra": {
            "patches_per_sec_per_chip": round(patches_per_sec, 2),
            "gen_1024_wall_s_cold": round(gen_1024_s, 3),
            "gen_1024_wall_s_warm": round(gen_1024_warm_s, 3),
            "gen_1024_wall_s_warm_u8": round(gen_1024_warm_u8_s, 3),
            "gen_1024_streamed_warm_s": round(gen_1024_streamed_warm_s, 3),
            "seam_mse_1024": seam,
            "adjacent_mse_natural": natural,
            "seam_note": (
                "all seam/engine numbers here are measured on an UNTRAINED "
                "21-step net and are dominated by the TPU accumulation-"
                "noise floor (PARITY.md: unconverged BN stacks chaotically "
                "amplify reduction-order epsilon; on CPU the same check is "
                "exactly 0.0 — see tests/test_halo.py). The trained-model "
                "seam/natural ratio is 1.02 at 4096^2 (README)."
            ),
            "engine_vs_onepass_max_err": engine_max_err,
            **mfu,
            **canvas_dev,
            **ssm,
            **trained_seam,
            "setup_compile_s": round(setup_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "compute_dtype": getattr(args, "compute_dtype", "float32"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("ITG_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
