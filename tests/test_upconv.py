"""Fused upsample+conv ("up-conv", subpixel) kernel tests.

Oracle: the unfused pair upsample2_chw_p -> conv3x3_chw_p, itself
equality-tested against XLA/torch elsewhere (tests/test_pallas_conv.py,
tests/test_parity.py). The fused kernel regroups tap additions into
combined 2x2 kernels, so comparisons carry a small float tolerance rather
than bit-exactness (that is also why the generator fuses in TRAINING only —
the halo engine's bit-exact oracle stays on the unfused kernels).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.ops.pallas_conv import (
    _round_up_128,
    conv1x1_chw_p,
    conv3x3_chw_p,
    upconv3x3_chw_p,
    upsample2_chw_add_p,
    upsample2_chw_p,
)


def _mk(n, c, h, w_true, co, seed=0):
    k = jax.random.split(jax.random.key(seed), 6)
    wp = _round_up_128(w_true)
    x = jax.random.normal(k[0], (n, c, h, w_true), jnp.float32)
    # padded-carry input: edge fill
    x = jnp.concatenate(
        [x, jnp.broadcast_to(x[..., -1:], (n, c, h, wp - w_true))], axis=-1
    ) if wp != w_true else x
    w = jax.random.normal(k[1], (3, 3, c, co), jnp.float32) * 0.3
    b = jax.random.normal(k[2], (co,), jnp.float32) * 0.1
    scale = jax.random.normal(k[3], (c,), jnp.float32) * 0.5 + 1.0
    shift = jax.random.normal(k[4], (c,), jnp.float32) * 0.2
    return x, w, b, scale, shift


def _pair_ref(x, w, b, scale, shift, relu, outer_padding, w_true_h, want_stats):
    fill = "zeros" if outer_padding == "constant" else "edge"
    up = upsample2_chw_p(x, w_true_h, fill)
    return conv3x3_chw_p(
        up, w, b, scale, shift, relu, outer_padding, 2 * w_true_h, want_stats
    )


@pytest.mark.parametrize("outer_padding", ["replicate", "constant"])
@pytest.mark.parametrize("w_true", [24, 128])
def test_upconv_forward_matches_pair(outer_padding, w_true):
    x, w, b, scale, shift = _mk(2, 5, 8, w_true, 4)
    got, gs1, gs2 = upconv3x3_chw_p(
        x, w, b, scale, shift, True, outer_padding, w_true, True
    )
    want, ws1, ws2 = _pair_ref(
        x, w, b, scale, shift, True, outer_padding, w_true, True
    )
    wt = 2 * w_true
    np.testing.assert_allclose(
        np.asarray(got[..., :wt]), np.asarray(want[..., :wt]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(ws1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs2), np.asarray(ws2), rtol=1e-4, atol=1e-3)
    if outer_padding == "replicate":
        # padded-carry contract: pad columns replicate the true edge
        if got.shape[-1] != wt:
            np.testing.assert_allclose(
                np.asarray(got[..., wt:]),
                np.asarray(jnp.broadcast_to(got[..., wt - 1 : wt],
                                            got[..., wt:].shape)),
                rtol=1e-5, atol=1e-5,
            )


@pytest.mark.parametrize("outer_padding", ["replicate", "constant"])
def test_upconv_grads_match_pair(outer_padding):
    w_true = 24
    x, w, b, scale, shift = _mk(1, 4, 8, w_true, 3, seed=3)

    def loss_fused(x, w, b, scale, shift):
        y, s1, s2 = upconv3x3_chw_p(
            x, w, b, scale, shift, True, outer_padding, w_true, True
        )
        yv = y[..., : 2 * w_true]
        return (jnp.sum(yv * jnp.cos(yv)) + jnp.sum(s1 * 0.3)
                + jnp.sum(jnp.sqrt(1 + s2)))

    def loss_pair(x, w, b, scale, shift):
        y, s1, s2 = _pair_ref(
            x, w, b, scale, shift, True, outer_padding, w_true, True
        )
        yv = y[..., : 2 * w_true]
        return (jnp.sum(yv * jnp.cos(yv)) + jnp.sum(s1 * 0.3)
                + jnp.sum(jnp.sqrt(1 + s2)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, shift)
    gp = jax.grad(loss_pair, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, shift)
    names = ["dx", "dw", "db", "dscale", "dshift"]
    for name, a, bb in zip(names, gf, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-4,
            err_msg=f"{name} mismatch ({outer_padding})",
        )


def test_upconv_no_stats_path():
    w_true = 24
    x, w, b, scale, shift = _mk(1, 4, 8, w_true, 3, seed=5)
    got = upconv3x3_chw_p(x, w, b, scale, shift, True, "replicate", w_true, False)
    want = _pair_ref(x, w, b, scale, shift, True, "replicate", w_true, False)
    wt = 2 * w_true
    np.testing.assert_allclose(
        np.asarray(got[..., :wt]), np.asarray(want[..., :wt]),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("fill", ["edge", "zeros"])
def test_up2_add_matches_composition(fill):
    w_true = 24
    key = jax.random.key(9)
    kx, kr = jax.random.split(key)
    x = jax.random.normal(kx, (2, 3, 8, _round_up_128(w_true)), jnp.float32)
    res = jax.random.normal(
        kr, (2, 3, 16, _round_up_128(2 * w_true)), jnp.float32
    )

    def fused(x, res):
        y, s1, s2 = upsample2_chw_add_p(x, res, w_true, fill, True)
        return y, s1, s2

    y, s1, s2 = fused(x, res)
    want = upsample2_chw_p(x, w_true, fill) + res
    wt = 2 * w_true
    np.testing.assert_allclose(
        np.asarray(y[..., :wt]), np.asarray(want[..., :wt]), rtol=1e-6, atol=1e-6
    )
    yv = np.asarray(y[..., :wt], np.float64)
    np.testing.assert_allclose(np.asarray(s1), yv.sum((0, 2, 3)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2), (yv * yv).sum((0, 2, 3)), rtol=1e-4, atol=1e-4
    )

    # grads vs the unfused composition
    def loss_f(x, res):
        y, s1, s2 = fused(x, res)
        return jnp.sum(jnp.sin(y[..., :wt])) + jnp.sum(s1) + jnp.sum(s2 * 0.1)

    def loss_p(x, res):
        y = upsample2_chw_p(x, w_true, fill) + res
        yv = y[..., :wt]
        s1 = jnp.sum(yv.astype(jnp.float32), axis=(0, 2, 3))
        s2 = jnp.sum(jnp.square(yv.astype(jnp.float32)), axis=(0, 2, 3))
        return jnp.sum(jnp.sin(yv)) + jnp.sum(s1) + jnp.sum(s2 * 0.1)

    gf = jax.grad(loss_f, argnums=(0, 1))(x, res)
    gp = jax.grad(loss_p, argnums=(0, 1))(x, res)
    for name, a, b in zip(["dx", "dres"], gf, gp):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dres":  # pads: fused masks to zero, oracle may not
            a, b = a[..., :wt], b[..., :wt]
        else:
            a, b = a[..., :w_true], b[..., :w_true]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("outer_padding", ["replicate", "constant"])
def test_generator_fuse_up_matches_unfused(outer_padding):
    """Full flagship-topology generator, chw tail forced on: the fused
    train-mode forward/backward must match the unfused chw path (same
    variable tree; float-tolerance equality — the fusion regroups tap
    additions)."""
    from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator

    kw = dict(
        z_dim=8, G_ch=8, base_res=4, n_layers_G=6, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding=outer_padding,
        chw_tail="on",
    )
    g_off = ResidualPatchGenerator(fuse_up="off", **kw)
    g_on = ResidualPatchGenerator(fuse_up="auto", **kw)
    z = jax.random.normal(jax.random.key(0), (2, 14, 14, 8))
    variables = g_off.init(jax.random.key(1), z, train=True)

    def run(g, v):
        (y, _), aux = g.apply(v, z, train=True, mutable=["batch_stats"])
        return y, aux

    y0, aux0 = run(g_off, variables)
    y1, aux1 = run(g_on, variables)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        aux0["batch_stats"], aux1["batch_stats"],
    )

    def loss(g):
        def f(params):
            (y, _), _ = g.apply(
                {**variables, "params": params}, z, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y * jnp.sin(y))

        return jax.grad(f)(variables["params"])

    g0 = loss(g_off)
    g1 = loss(g_on)
    # Calibration: conv BIAS grads under a following BatchNorm are ~zero by
    # construction (the affine shift cancels them up to batch-stat
    # coupling), so their norm-relative deviation is pure float-noise —
    # measure the legitimate noise floor as the chw-vs-XLA deviation of the
    # SAME loss and require the fused path to add nothing beyond it.
    g_xla = ResidualPatchGenerator(fuse_up="off", **{**kw, "chw_tail": "off"})
    g2 = loss(g_xla)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for (path, a), b, c in zip(flat0, flat1, flat2):
        a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
        n = np.linalg.norm(a) + 1e-12
        fuse_err = np.linalg.norm(a - b) / n
        floor = np.linalg.norm(a - c) / n
        assert fuse_err <= max(2e-3, 1.5 * floor), (
            f"{jax.tree_util.keystr(path)}: fused-path grad deviates "
            f"{fuse_err:.2e} vs noise floor {floor:.2e}"
        )


def test_conv1x1_p_matches_plain():
    from infinite_texture_gans_tpu.ops.pallas_conv import conv1x1_chw

    w_true = 24
    key = jax.random.key(11)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 5, 8, w_true), jnp.float32)
    xpad = jnp.concatenate(
        [x, jnp.broadcast_to(x[..., -1:], (2, 5, 8, _round_up_128(w_true) - w_true))],
        axis=-1,
    )
    w = jax.random.normal(kw, (1, 1, 5, 3), jnp.float32)
    b = jax.random.normal(kb, (3,), jnp.float32)
    got = conv1x1_chw_p(xpad, w, b, w_true)
    want = conv1x1_chw(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got[..., :w_true]), np.asarray(want), rtol=1e-6, atol=1e-6
    )

    def loss_f(xp, w, b):
        return jnp.sum(jnp.tanh(conv1x1_chw_p(xp, w, b, w_true)[..., :w_true]))

    def loss_p(x, w, b):
        return jnp.sum(jnp.tanh(conv1x1_chw(x, w, b)))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(xpad, w, b)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(
        np.asarray(gf[0][..., :w_true]), np.asarray(gp[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gp[1]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gp[2]), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fuse_up='all': the fused up-conv at EVAL, including the stateful raster
# engine (half-res conv1 halo sites; ops/pallas_conv.py:
# chw_upconv_halo_step).


def _fuse_all_gen(outer_padding="replicate", fuse_up="all"):
    from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator

    return ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding=outer_padding,
        chw_tail="on", fuse_up=fuse_up,
    )


def _init_eval_vars(gen):
    from infinite_texture_gans_tpu.sampling import latents

    z0 = latents.build_train_z(jax.random.key(1), 1, gen.z_dim, gen.base_res, 3, 3)
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    return {k: dict(variables)[k] for k in ("params", "batch_stats")}


def test_fuse_all_halves_conv1_site_specs():
    gen = _fuse_all_gen()
    assert gen.eval_fuse_blocks() == frozenset({4, 5})
    specs = {s.name: s for s in gen.site_specs()}
    # blocks 4, 5 fuse: conv1 halo cached at HALF the conv-input resolution
    assert specs["block4.conv1"].patch_res == specs["block4.conv2"].patch_res // 2
    assert specs["block5.conv1"].patch_res == specs["block5.conv2"].patch_res // 2
    # non-chw blocks keep full-res sites; SSM never fuses
    assert specs["block3.conv1"].patch_res == specs["block3.conv2"].patch_res
    assert _fuse_all_gen().clone(type_norm="SSM").eval_fuse_blocks() == frozenset()


@pytest.mark.parametrize("outer", ["replicate", "constant"])
def test_fuse_all_halo_scan_matches_one_pass(outer):
    """The fused raster engine's correctness anchor: patch-by-patch with
    half-res conv1 halo caches must equal the fused one-pass over the whole
    canvas (the same oracle relation the unfused engine is held to,
    tests/test_chw_tail.py::test_halo_scan_chw_matches_one_pass)."""
    from infinite_texture_gans_tpu.sampling import latents
    from infinite_texture_gans_tpu.sampling.infinite import (
        generate_canvas,
        generate_one_pass,
    )

    gen = _fuse_all_gen(outer)
    variables = _init_eval_vars(gen)
    P = gen.patch_resolution
    z5 = latents.build_z_full(jax.random.key(2), 1, gen.z_dim, gen.base_res, 5, 7)
    pbp = generate_canvas(
        gen, variables, jax.random.key(2), 5 * P, 7 * P, num_images=1, z_full=z5
    )
    onep = np.asarray(generate_one_pass(gen, variables, z5, None, 5, 7))
    np.testing.assert_allclose(pbp, onep, atol=2e-5, rtol=1e-4)


def test_fuse_all_eval_matches_unfused_engine():
    """fuse_up='all' must reproduce the default engine's canvas up to the
    float regrouping of the combined 2x2 kernels (same variables)."""
    from infinite_texture_gans_tpu.sampling import latents
    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas

    gen_f = _fuse_all_gen()
    gen_u = _fuse_all_gen(fuse_up="auto")
    variables = _init_eval_vars(gen_u)
    P = gen_u.patch_resolution
    z5 = latents.build_z_full(jax.random.key(3), 1, 16, 4, 5, 5)
    a = generate_canvas(
        gen_u, variables, jax.random.key(3), 5 * P, 5 * P, num_images=1, z_full=z5
    )
    b = generate_canvas(
        gen_f, variables, jax.random.key(3), 5 * P, 5 * P, num_images=1, z_full=z5
    )
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_fuse_all_streamed_matches_in_memory(tmp_path):
    """The streamed PNG engine under fuse_up='all' (fused kernels + half-res
    conv1 halo sites through the band scan) writes byte-identical pixels to
    the fused in-memory engine."""
    from PIL import Image

    from infinite_texture_gans_tpu.sampling import latents
    from infinite_texture_gans_tpu.sampling.infinite import generate_canvas
    from infinite_texture_gans_tpu.sampling.stream import (
        _to_uint8,
        generate_canvas_streamed,
    )

    gen = _fuse_all_gen()
    variables = _init_eval_vars(gen)
    P = gen.patch_resolution
    out_h, out_w = 4 * P - 13, 4 * P - 7  # multi-band, ragged crop
    z = latents.build_z_full(jax.random.key(5), 1, gen.z_dim, gen.base_res, 7, 7)
    ref = generate_canvas(
        gen, variables, jax.random.key(0), out_h, out_w, num_images=1, z_full=z
    )
    path = generate_canvas_streamed(
        gen, variables, jax.random.key(0), out_h, out_w,
        str(tmp_path / "c.png"), z_full=z,
    )
    img = np.asarray(Image.open(path))
    assert img.shape == (out_h, out_w, 3)
    np.testing.assert_array_equal(img, _to_uint8(ref[0]))
