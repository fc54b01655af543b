"""Multi-device tests on the simulated 8-device CPU mesh (SURVEY.md §4.4):
data-parallel train step, image-sharded canvas generation, and spatially
(width-) sharded one-pass generation must all agree with single-device runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from infinite_texture_gans_tpu.parallel.sharded import (
    generate_one_pass_sharded,
    shard_images,
)
from infinite_texture_gans_tpu.sampling.infinite import (
    generate_canvas,
    generate_one_pass,
)
from infinite_texture_gans_tpu.sampling.latents import build_z_full


def tiny_gen(**kw):
    cfg = dict(
        z_dim=8, G_ch=8, base_res=4, n_layers_G=4, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
    )
    cfg.update(kw)
    return ResidualPatchGenerator(**cfg)


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = tiny_gen()
    z = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    return gen, variables


def test_mesh_factory():
    mesh = make_mesh("data:8")
    assert mesh is not None and mesh.devices.shape == (8,)
    assert make_mesh(None, 1) is None


def test_one_pass_width_sharded_matches_single(gen_and_vars):
    """Width-sharded one-pass: XLA SPMD inserts the conv halo exchanges; the
    result must equal the unsharded run."""
    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    # 16-patch-wide canvas: W axis = 16*4+2 = 66 px at base res
    z = build_z_full(jax.random.key(1), 1, 8, 4, 3, 16)
    ref = np.asarray(generate_one_pass(gen, variables, z, None, 3, 16))
    out = np.asarray(
        generate_one_pass_sharded(gen, variables, z, None, 3, 16, mesh=mesh)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_canvas_image_sharded_matches_single(gen_and_vars):
    """Image-batch-sharded raster generation equals per-image generation."""
    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    z = build_z_full(jax.random.key(2), 8, 8, 4, 5, 5)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), 5 * 32, 5 * 32, num_images=8, z_full=z
    )
    z_sharded = shard_images(z, mesh)
    variables_repl = replicate(variables, mesh)
    out = generate_canvas(
        gen, variables_repl, jax.random.key(0), 5 * 32, 5 * 32,
        num_images=8, z_full=z_sharded,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_wavefront_canvas_matches_sequential(gen_and_vars):
    """Wavefront generation (rows pipelined across devices, halo buffers
    exchanged with ppermute) must reproduce the sequential raster engine."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution  # 32
    out_h, out_w = 7 * P_res, 9 * P_res  # 3 x 4 wavefront steps
    z = build_z_full(jax.random.key(7), 1, 8, 4, 7, 9)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_wavefront(
        gen, variables, jax.random.key(0), out_h, out_w, mesh,
        num_images=1, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_wavefront_multiband_61x61(gen_and_vars):
    """Wavefront v2: a 61x61-patch canvas (steps_h = 30 > 8 devices) runs as
    cyclic row bands with the halo buffer handed across bands; must equal
    the sequential engine (VERDICT r1 #2 / BASELINE config 5 geometry)."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution  # 32
    out_h = out_w = 61 * P_res  # 30 x 30 wavefront steps, 4 bands of 8 rows
    z = build_z_full(jax.random.key(8), 1, 8, 4, 61, 61)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_wavefront(
        gen, variables, jax.random.key(0), out_h, out_w, mesh,
        num_images=1, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_wavefront_ssm_matches_sequential():
    """Wavefront v2 with an SSM generator (map strips sliced per column
    inside the scan, sharded per device row)."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )
    from infinite_texture_gans_tpu.sampling.latents import build_maps_full

    gen = tiny_gen(type_norm="SSM", map_dim=2)
    z0 = jnp.zeros((1, 14, 14, 8))
    m0 = build_maps_full(jax.random.key(1), 1, 2, 4, 4, 3, 3)
    variables = jax.jit(lambda z, m: gen.init(jax.random.key(0), z, m, train=True))(
        z0, m0
    )
    variables = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution
    out_h, out_w = 21 * P_res, 7 * P_res  # 10 x 3 steps -> 2 bands
    z = build_z_full(jax.random.key(9), 1, 8, 4, 21, 7)
    maps = build_maps_full(jax.random.key(10), 1, 2, 4, 4, 21, 7)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w,
        num_images=1, z_full=z, maps_full=maps,
    )
    out = generate_canvas_wavefront(
        gen, variables, jax.random.key(0), out_h, out_w, mesh,
        num_images=1, z_full=z, maps_full=maps,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_shard_batch_layout():
    mesh = make_mesh("data:8")
    x = np.zeros((16, 4, 4, 3), np.float32)
    y = shard_batch(x, mesh)
    assert y.sharding.spec == P("data")
    assert len(y.sharding.device_set) == 8


def test_wavefront_rejects_narrow_grid(gen_and_vars):
    """num_patches_w < 3 would race the lag-2 row buffer; must raise."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    g2 = gen.clone(num_patches_w=2)
    with pytest.raises(ValueError, match="num_patches_w"):
        generate_canvas_wavefront(
            g2, variables, jax.random.key(0), 128, 128, mesh
        )


def test_wavefront_chw_tail_matches_sequential():
    """Wavefront with the channels-major Pallas halo path forced — the
    combination a multi-chip TPU deployment runs with chw_tail auto. The
    halo kernel's injections must behave identically inside the band scan
    under shard_map."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen = tiny_gen(chw_tail="on")
    z0 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {k: dict(variables)[k] for k in ("params", "batch_stats")}

    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution
    out_h, out_w = 5 * P_res, 7 * P_res
    z = build_z_full(jax.random.key(12), 1, 8, 4, 5, 7)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_wavefront(
        gen, variables, jax.random.key(0), out_h, out_w, mesh,
        num_images=1, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_train_step_fused_chw_mesh_matches_single():
    """The Pallas chw tail WITH the subpixel-fused up-conv kernels under the
    8-device data mesh: the sharded step must reproduce the single-device
    step (GLOBAL-batch BN semantics, PARITY.md) to float noise — the
    combination every multi-chip TPU training deployment runs."""
    from infinite_texture_gans_tpu.config import (
        discriminator_kwargs,
        generator_kwargs,
        prepare_parser,
    )
    from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
    from infinite_texture_gans_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    args = prepare_parser().parse_args([])
    args.G_ch = 8
    args.D_ch = 8
    args.z_dim = 16
    args.n_layers_G = 4
    args.n_layers_D = 2
    args.padding_mode = "local"
    args.attention = True
    args.num_images = 8
    args.batch_size = 8
    args.ema = True
    args.chw_tail = "on"  # force the Pallas tail (interpret mode on CPU)

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    assert G.fuse_up == "auto" and G.chw_tail == "on"
    mesh = make_mesh("data:8")
    real = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, 48, 48, 3)).clip(-1, 1),
        jnp.float32,
    )

    metrics_by_mode = {}
    for use_mesh in (False, True):
        state, tx_G, tx_D = create_train_state(G, D, args, jax.random.key(0), 2)
        step = make_train_step(
            G, D, tx_G, tx_D, loss_type="standard", smooth=True,
            disc_iters=1, num_images=8, use_ema=True,
            mesh=mesh if use_mesh else None,
        )
        if use_mesh:
            state = replicate(state, mesh)
            real_in = jax.device_put(real, NamedSharding(mesh, P("data")))
        else:
            real_in = real
        state, metrics = step(state, real_in, jax.random.key(7))
        metrics_by_mode[use_mesh] = jax.device_get(metrics)
        assert all(np.isfinite(v) for v in metrics_by_mode[use_mesh].values())

    for k in metrics_by_mode[False]:
        np.testing.assert_allclose(
            metrics_by_mode[True][k], metrics_by_mode[False][k],
            rtol=5e-3, atol=5e-4, err_msg=k,
        )


def test_train_step_collective_layout():
    """Collective inventory of the sharded fused G+D train step on the
    8-device mesh (VERDICT r2 #9, scaling evidence beyond correctness):

    * NO all-gather / all-to-all / collective-permute anywhere — parameters
      are replicated and the batch stays sharded end-to-end, so nothing is
      ever resharded (an accidental resharding of the crop-sampler output or
      of an activation would show up here);
    * with ``mesh`` passed to make_train_step, the in-jit latents are pinned
      to the data axis, so BOTH the D-grad and G-grad/BN-stat reductions
      appear — and GSPMD fuses them into a bounded set of all-reduces (far
      below one per parameter leaf). Without the mesh the G path silently
      replicates (exactly one fused D all-reduce) — asserted too, as the
      regression guard that motivated the mesh plumbing;
    * the on-device crop sampler's program itself contains no collectives:
      every device slices its shard's crops directly from the replicated
      source image.
    """
    import re

    from infinite_texture_gans_tpu.config import prepare_parser, discriminator_kwargs, generator_kwargs
    from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator
    from infinite_texture_gans_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    args = prepare_parser().parse_args([])
    args.G_ch = 8
    args.D_ch = 8
    args.z_dim = 16
    args.n_layers_G = 4
    args.n_layers_D = 2
    args.padding_mode = "local"
    args.attention = True
    args.num_images = 8
    args.ema = True

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    state, tx_G, tx_D = create_train_state(G, D, args, jax.random.key(0), 2)
    mesh = make_mesh("data:8")

    def compile_hlo(with_mesh):
        step = make_train_step(
            G, D, tx_G, tx_D, loss_type="standard", disc_iters=1,
            num_images=8, use_ema=True, mesh=mesh if with_mesh else None,
        )
        st = jax.device_put(state, NamedSharding(mesh, P()))
        real = jax.device_put(
            jnp.zeros((16, 48, 48, 3)), NamedSharding(mesh, P("data"))
        )
        key = jax.device_put(jax.random.key(3), NamedSharding(mesh, P()))
        return step.lower(st, real, key).compile().as_text()

    def count(hlo, op):
        # matches scalar and tuple-shaped results: "%x = f32[..] op(..)" and
        # "%x = (f32[..], ..) op(..)"
        return sum(
            1
            for line in hlo.splitlines()
            if re.search(rf"=\s*\(?[^=]*?{op}\(", line)
        )

    hlo = compile_hlo(with_mesh=True)
    for op in ("all-gather", "all-to-all"):
        assert count(hlo, op) == 0, f"resharding leaked into the step: {op}"
    # GSPMD emits one tiny rotation collective-permute per edge-pad
    # TRANSPOSE in the G backward (an artifact of its pad-grad handling,
    # ~100 KB each at real scale); anything outside those ops would be a
    # genuine resharding
    cp_lines = [
        l for l in hlo.splitlines()
        if re.search(r"=\s*\S*\s*collective-permute\(", l)
    ]
    assert all("jit(_pad)/pad" in l for l in cp_lines), cp_lines
    assert len(cp_lines) <= 8
    n_ar = count(hlo, "all-reduce")
    # G-grad + D-grad + BN-stat reductions; fused by GSPMD far below the
    # ~80 parameter/stat leaves (measured: 20 = 9 fwd BN stats + fused
    # G/D grad groups)
    assert 2 <= n_ar < 40, f"unexpected all-reduce count: {n_ar}"
    # the G backward is genuinely sharded: its grads all-reduce too
    assert any(
        "all-reduce" in line and "Generator" in line for line in hlo.splitlines()
    ), "G gradients never all-reduce -> G path is replicated, not sharded"

    # regression guard: WITHOUT the mesh arg the G path replicates (the only
    # fused all-reduce belongs to the D backward)
    hlo_nomesh = compile_hlo(with_mesh=False)
    assert not any(
        "all-reduce" in line and "Generator" in line
        for line in hlo_nomesh.splitlines()
    )

    # the on-device crop sampler compiles collective-free
    from infinite_texture_gans_tpu.data.datasets import _make_device_samplers

    sample_crops, _, _, _ = _make_device_samplers(NamedSharding(mesh, P("data")))
    img = jax.device_put(
        jnp.zeros((96, 96, 3), jnp.uint8), NamedSharding(mesh, P())
    )
    chlo = sample_crops.lower(img, jax.random.key(0), 48, 16).compile().as_text()
    for op in ("all-gather", "all-to-all", "collective-permute", "all-reduce"):
        assert op not in chlo, f"crop sampler emitted {op}"


def test_wavefront_schedule_constants():
    """The v3 cyclic schedule (PERF.md utilization model): short canvases run
    at the IDEAL wavefront depth 2*(steps_h-1)+steps_w (no full-mesh-depth
    penalty — the round-2 advisor finding), and wide canvases are compute-
    bound with the 2(n_dev-1) ramp paid ONCE, not once per band."""
    from infinite_texture_gans_tpu.parallel.wavefront import schedule_constants

    # narrow canvas (steps_w <= 2*n_dev): ideal wavefront
    _, T, _ = schedule_constants(4, 3, 8)
    assert T == 2 * (3 - 1) + 4
    _, T, _ = schedule_constants(4, 10, 8)  # multiband narrow
    # row stride = 2*n_dev: last row (9) starts at 2*1 + 1*16 = 18
    assert T == 18 + 4
    # wide canvas (steps_w > 2*n_dev): one ramp + ceil(h/n)*w steps
    _, T, n_rows = schedule_constants(30, 30, 8)
    assert T == (30 // 8) * 30 + 2 * ((30 - 1) % 8) + 30 == 130
    assert n_rows == 4
    # v2 for the same 61x61 demo paid 4 dispatches x (30 + 14) = 176 steps
    assert T < 176
    # single device degenerates to the sequential raster scan length
    _, T, _ = schedule_constants(5, 4, 1)
    assert T == 5 * 4


def test_wavefront_rejects_oversized_canvas():
    """A canvas whose per-device sub-image buffer would exceed the HBM bound
    must be rejected up front (before the canvas-sized latent build), not
    left to OOM inside the compiled scan."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen = tiny_gen()
    mesh = make_mesh("data:2")
    P = gen.patch_resolution
    with pytest.raises(ValueError, match="GiB"):
        generate_canvas_wavefront(
            gen, {}, jax.random.key(0),
            output_resolution_height=4000 * P,
            output_resolution_width=4000 * P,
            mesh=mesh,
        )


def test_wavefront_fused_eval_matches_sequential():
    """Wavefront with fuse_up='all': the fused up-conv halo steps (half-res
    conv1 sites) must behave identically inside the band scan under
    shard_map — both engines fused, same oracle relation as the unfused
    chw wavefront test above."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront,
    )

    gen = tiny_gen(chw_tail="on", fuse_up="all")
    assert gen.eval_fuse_blocks() == frozenset({4})
    z0 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {k: dict(variables)[k] for k in ("params", "batch_stats")}

    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution
    out_h, out_w = 5 * P_res, 7 * P_res
    z = build_z_full(jax.random.key(12), 1, 8, 4, 5, 7)

    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_wavefront(
        gen, variables, jax.random.key(0), out_h, out_w, mesh,
        num_images=1, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_diag_fused_eval_matches_sequential():
    """Batched-diagonal engine x fuse_up='all' (the half-res pending/halo
    buffers ride the lane axis)."""
    from infinite_texture_gans_tpu.sampling.diag import generate_canvas_diag

    gen = tiny_gen(chw_tail="on", fuse_up="all")
    z0 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {k: dict(variables)[k] for k in ("params", "batch_stats")}

    P_res = gen.patch_resolution
    out_h, out_w = 5 * P_res, 7 * P_res
    z = build_z_full(jax.random.key(12), 1, 8, 4, 5, 7)
    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    out = generate_canvas_diag(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1,
        lanes=2, z_full=z,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_wavefront_slab_streamed_matches_sequential_stream(gen_and_vars, tmp_path):
    """Slab-streamed wavefront PNG (VERDICT r3 #9): 2-row slabs with the
    halo boundary carried across dispatches must write byte-identical PNG
    bytes to the sequential streamed engine — lifting the whole-canvas
    device-memory bound of the one-dispatch wavefront."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront_streamed,
    )
    from infinite_texture_gans_tpu.sampling.stream import generate_canvas_streamed

    gen, variables = gen_and_vars
    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution  # 32
    out_h, out_w = 13 * P_res, 9 * P_res  # 6 x 4 steps -> slabs of 2+2+2
    z = build_z_full(jax.random.key(17), 1, 8, 4, 13, 9)

    seq = str(tmp_path / "seq.png")
    generate_canvas_streamed(
        gen, variables, jax.random.key(0), out_h, out_w, seq, z_full=z
    )
    slab = str(tmp_path / "slab.png")
    generate_canvas_wavefront_streamed(
        gen, variables, jax.random.key(0), out_h, out_w, slab, mesh,
        slab_rows=2, z_full=z,
    )
    from PIL import Image

    a = np.asarray(Image.open(seq))
    b = np.asarray(Image.open(slab))
    np.testing.assert_array_equal(b, a)


def test_wavefront_slab_streamed_ssm(tmp_path):
    """Slab-streamed wavefront with SSM maps (slab strips + boundary carry
    for every halo site of the SSM tower), ragged final slab (5 rows as
    3 + 2)."""
    from infinite_texture_gans_tpu.parallel.wavefront import (
        generate_canvas_wavefront_streamed,
    )
    from infinite_texture_gans_tpu.sampling.latents import build_maps_full
    from infinite_texture_gans_tpu.sampling.stream import generate_canvas_streamed

    gen = tiny_gen(type_norm="SSM", map_dim=2)
    z0 = jnp.zeros((1, 14, 14, 8))
    m0 = build_maps_full(jax.random.key(1), 1, 2, 4, 4, 3, 3)
    variables = jax.jit(lambda z, m: gen.init(jax.random.key(0), z, m, train=True))(
        z0, m0
    )
    variables = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    mesh = make_mesh("data:8")
    P_res = gen.patch_resolution
    out_h, out_w = 11 * P_res, 7 * P_res  # 5 x 3 steps
    z = build_z_full(jax.random.key(19), 1, 8, 4, 11, 7)
    maps = build_maps_full(jax.random.key(20), 1, 2, 4, 4, 11, 7)

    seq = str(tmp_path / "seq.png")
    generate_canvas_streamed(
        gen, variables, jax.random.key(0), out_h, out_w, seq,
        z_full=z, maps_full=maps,
    )
    slab = str(tmp_path / "slab.png")
    generate_canvas_wavefront_streamed(
        gen, variables, jax.random.key(0), out_h, out_w, slab, mesh,
        slab_rows=3, z_full=z, maps_full=maps,
    )
    from PIL import Image

    a = np.asarray(Image.open(seq))
    b = np.asarray(Image.open(slab))
    np.testing.assert_array_equal(b, a)


def test_sample_cli_mesh_wavefront(tmp_path, monkeypatch):
    """The inference CLI's --mesh path: `--mesh data:8 --stream` writes the
    slab-streamed wavefront PNG byte-identical to the single-device
    `--stream` run; `--mesh` without --stream smoke-saves a full canvas."""
    import sys

    from infinite_texture_gans_tpu import sample as sample_cli
    from infinite_texture_gans_tpu.config import args_to_dict, prepare_parser
    from infinite_texture_gans_tpu.train.checkpoint import save_checkpoint

    gen = tiny_gen()
    z0 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    args = prepare_parser().parse_args([])
    args.z_dim = 8
    args.G_ch = 8
    args.n_layers_G = 4
    args.attention = False
    args.padding_mode = "local"
    ckpt = str(tmp_path / "tiny__ema.ckpt")
    save_checkpoint(ckpt, {"meta": {"args": args_to_dict(args)},
                           "netG_variables": variables})

    P_res = gen.patch_resolution
    size = ["--output_resolution_height", str(9 * P_res),
            "--output_resolution_width", str(7 * P_res)]

    monkeypatch.setattr(sys, "argv", [
        "sample", "--model_path", ckpt, "--output_name", "seq.png",
        "--stream", "--seed", "3", *size,
    ])
    sample_cli.main()
    monkeypatch.setattr(sys, "argv", [
        "sample", "--model_path", ckpt, "--output_name", "slab.png",
        "--stream", "--mesh", "data:8", "--slab_rows", "2", "--seed", "3",
        *size,
    ])
    sample_cli.main()
    from PIL import Image

    a = np.asarray(Image.open(tmp_path / "seq.png"))
    b = np.asarray(Image.open(tmp_path / "slab.png"))
    np.testing.assert_array_equal(b, a)

    monkeypatch.setattr(sys, "argv", [
        "sample", "--model_path", ckpt, "--output_name", "wf.png",
        "--mesh", "data:8", "--seed", "3", *size,
    ])
    sample_cli.main()
    c = np.asarray(Image.open(tmp_path / "wf.png"))
    assert c.shape == a.shape and c.std() > 1


def test_sample_cli_batch_saves_all(tmp_path, monkeypatch):
    """--batch N (throughput mode: N canvases through ONE raster dispatch)
    saves every canvas — the first at the requested name, the rest as
    <stem>_k<ext> — and different batch lanes get different latents."""
    import sys

    from infinite_texture_gans_tpu import sample as sample_cli
    from infinite_texture_gans_tpu.config import args_to_dict, prepare_parser
    from infinite_texture_gans_tpu.train.checkpoint import save_checkpoint

    gen = tiny_gen()
    z0 = jnp.zeros((1, 14, 14, 8))
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    args = prepare_parser().parse_args([])
    args.z_dim = 8
    args.G_ch = 8
    args.n_layers_G = 4
    args.attention = False
    args.padding_mode = "local"
    ckpt = str(tmp_path / "tiny__ema.ckpt")
    save_checkpoint(ckpt, {"meta": {"args": args_to_dict(args)},
                           "netG_variables": variables})

    P_res = gen.patch_resolution
    monkeypatch.setattr(sys, "argv", [
        "sample", "--model_path", ckpt, "--output_name", "b.png",
        "--batch", "3", "--seed", "5",
        "--output_resolution_height", str(3 * P_res),
        "--output_resolution_width", str(3 * P_res),
    ])
    sample_cli.main()
    from PIL import Image

    imgs = [np.asarray(Image.open(tmp_path / n))
            for n in ("b.png", "b_1.png", "b_2.png")]
    for im in imgs:
        assert im.shape == imgs[0].shape and im.std() > 1
    assert not np.array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[1], imgs[2])
