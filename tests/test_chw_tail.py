"""The channels-major Pallas tail (chw_tail='on') must match the NHWC/XLA
path on the SAME variables: identical variable tree, matching forward
outputs, matching gradients and BN running-stat updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.sampling import latents


def build(chw_tail):
    return ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=True, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding="replicate",
        chw_tail=chw_tail,
    )


@pytest.fixture(scope="module")
def setup():
    gen_ref = build("off")
    z = latents.build_train_z(jax.random.key(1), 2, 16, 4, 3, 3)
    variables = jax.jit(lambda z: gen_ref.init(jax.random.key(0), z, train=True))(z)
    return gen_ref, build("on"), dict(variables), z


def test_same_variable_tree(setup):
    gen_ref, gen_chw, variables, z = setup
    v2 = jax.jit(lambda z: gen_chw.init(jax.random.key(0), z, train=True))(z)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(dict(v2))
    assert t1 == t2
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(dict(v2)),
    ):
        assert a.shape == b.shape, (p1, a.shape, b.shape)


def test_forward_eval_matches(setup):
    gen_ref, gen_chw, variables, z = setup
    y_ref, _ = jax.jit(lambda v, z: gen_ref.apply(v, z, train=False))(variables, z)
    y_chw, _ = jax.jit(lambda v, z: gen_chw.apply(v, z, train=False))(variables, z)
    np.testing.assert_allclose(
        np.asarray(y_chw), np.asarray(y_ref), atol=5e-5, rtol=1e-4
    )


def test_forward_train_matches_incl_stats(setup):
    gen_ref, gen_chw, variables, z = setup

    def fwd(gen, v, z):
        (y, _), upd = gen.apply(v, z, train=True, mutable=["batch_stats"])
        return y, upd["batch_stats"]

    y_ref, bs_ref = jax.jit(lambda v, z: fwd(gen_ref, v, z))(variables, z)
    y_chw, bs_chw = jax.jit(lambda v, z: fwd(gen_chw, v, z))(variables, z)
    np.testing.assert_allclose(np.asarray(y_chw), np.asarray(y_ref), atol=5e-5, rtol=1e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_ref),
        jax.tree_util.tree_leaves_with_path(bs_chw),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5, err_msg=str(path)
        )


def test_ssm_chw_matches_nhwc():
    """SSM norm in the channels-major branch (per-pixel modulation applied
    as dense CHW elementwise, conv with identity prenorm) must match the
    NHWC path on shared variables, in eval and train-with-stats."""
    cfg = dict(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=True, img_ch=3,
        type_norm="SSM", map_dim=2, padding_mode="local",
        outer_padding="replicate",
    )
    gen_ref = ResidualPatchGenerator(**cfg, chw_tail="off")
    gen_chw = ResidualPatchGenerator(**cfg, chw_tail="on")
    z = latents.build_train_z(jax.random.key(1), 2, 16, 4, 3, 3)
    maps = latents.build_train_maps(jax.random.key(2), 2, 2, 5, 4, 3, 3)
    variables = dict(
        jax.jit(lambda z, m: gen_ref.init(jax.random.key(0), z, m, train=True))(z, maps)
    )
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        dict(jax.jit(lambda z, m: gen_chw.init(jax.random.key(0), z, m, train=True))(z, maps))
    )

    y_ref, _ = jax.jit(lambda v, z, m: gen_ref.apply(v, z, m, train=False))(variables, z, maps)
    y_chw, _ = jax.jit(lambda v, z, m: gen_chw.apply(v, z, m, train=False))(variables, z, maps)
    np.testing.assert_allclose(np.asarray(y_chw), np.asarray(y_ref), atol=5e-5, rtol=1e-4)

    def fwd(gen, v, z, m):
        (y, _), upd = gen.apply(v, z, m, train=True, mutable=["batch_stats"])
        return y, upd["batch_stats"]

    yt_ref, bs_ref = jax.jit(lambda v, z, m: fwd(gen_ref, v, z, m))(variables, z, maps)
    yt_chw, bs_chw = jax.jit(lambda v, z, m: fwd(gen_chw, v, z, m))(variables, z, maps)
    np.testing.assert_allclose(np.asarray(yt_chw), np.asarray(yt_ref), atol=5e-5, rtol=1e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_ref),
        jax.tree_util.tree_leaves_with_path(bs_chw),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5, err_msg=str(path)
        )


def test_grads_match(setup):
    gen_ref, gen_chw, variables, z = setup
    params = variables["params"]
    aux = {"batch_stats": variables["batch_stats"]}

    def loss(gen, p, z):
        (y, _), _ = gen.apply(
            {"params": p, **aux}, z, train=True, mutable=["batch_stats"]
        )
        return jnp.mean(y * jnp.sin(y))

    g_ref = jax.jit(jax.grad(lambda p, z: loss(gen_ref, p, z)))(params, z)
    g_chw = jax.jit(jax.grad(lambda p, z: loss(gen_chw, p, z)))(params, z)
    # Conv biases immediately followed by BatchNorm have mathematically ~zero
    # gradient (the batch-mean subtraction cancels them); those leaves are
    # pure float noise in both paths. Normalize by the GLOBAL gradient scale.
    gscale = max(
        float(np.abs(np.asarray(x)).max()) for x in jax.tree_util.tree_leaves(g_ref)
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_chw),
    ):
        np.testing.assert_allclose(
            np.asarray(b) / gscale, np.asarray(a) / gscale,
            atol=5e-5, rtol=1e-3, err_msg=str(path),
        )


@pytest.mark.parametrize("outer", ["replicate", "constant"])
def test_halo_scan_chw_matches_one_pass(outer):
    """The channels-major Pallas tail under the stateful halo scan must
    reproduce the one-pass oracle (same chw mode), the correctness
    definition of the engine. Attention off => bit-exact regime."""
    from infinite_texture_gans_tpu.sampling.infinite import (
        generate_canvas,
        generate_one_pass,
    )

    gen = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=False, img_ch=3,
        type_norm="BN", padding_mode="local", outer_padding=outer,
        chw_tail="on",
    )
    z0 = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
    variables = jax.jit(lambda z: gen.init(jax.random.key(0), z, train=True))(z0)
    variables = {k: dict(variables)[k] for k in ("params", "batch_stats")}

    P = gen.patch_resolution
    z5 = latents.build_z_full(jax.random.key(2), 1, 16, 4, 5, 7)
    pbp = generate_canvas(
        gen, variables, jax.random.key(2), 5 * P, 7 * P, num_images=1, z_full=z5
    )
    onep = np.asarray(generate_one_pass(gen, variables, z5, None, 5, 7))
    np.testing.assert_allclose(pbp, onep, atol=2e-5, rtol=1e-4)


def test_halo_scan_chw_ssm_matches_one_pass():
    """Same, SSM norm (identity prenorm in the kernel, per-pixel modulation
    outside)."""
    from infinite_texture_gans_tpu.sampling.infinite import (
        generate_canvas,
        generate_one_pass,
    )

    gen = ResidualPatchGenerator(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=False, img_ch=3,
        type_norm="SSM", map_dim=2, padding_mode="local",
        outer_padding="replicate", chw_tail="on",
    )
    z0 = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
    m0 = latents.build_train_maps(jax.random.key(2), 1, 2, 5, 4, 3, 3)
    variables = jax.jit(
        lambda z, m: gen.init(jax.random.key(0), z, m, train=True)
    )(z0, m0)
    variables = {k: v for k, v in dict(variables).items() if k in ("params", "batch_stats")}

    P = gen.patch_resolution
    z5 = latents.build_z_full(jax.random.key(3), 1, 16, 4, 5, 5)
    m5 = latents.build_maps_full(jax.random.key(4), 1, 2, 5, 4, 5, 5)
    pbp = generate_canvas(
        gen, variables, jax.random.key(3), 5 * P, 5 * P,
        num_images=1, z_full=z5, maps_full=m5,
    )
    onep = np.asarray(generate_one_pass(gen, variables, z5, m5, 5, 5))
    np.testing.assert_allclose(pbp, onep, atol=2e-5, rtol=1e-4)


def test_bnfold_w_true_excludes_pad_columns():
    """BNFold's stats=None fallback must compute moments over only the
    w_true valid columns when the input is lane-padded (padded-carry path);
    the running-stat update must match the unpadded input's exactly."""
    from infinite_texture_gans_tpu.models.layers import BNFold

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 6, 96)), jnp.float32)
    # replicate-edge lane padding to width 128 (what _pad_w_lanes produces)
    xp = jnp.concatenate([x, jnp.repeat(x[..., -1:], 32, axis=3)], axis=3)

    bn = BNFold()
    v = bn.init(jax.random.key(0), x, train=True)
    ref, st_ref = bn.apply(v, x, train=True, mutable=["batch_stats"])
    pad, st_pad = bn.apply(v, xp, train=True, w_true=96, mutable=["batch_stats"])
    for a, b in zip(ref, pad):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        st_ref, st_pad,
    )
    # sanity: WITHOUT w_true the padded input yields different (wrong) stats
    bad, _ = bn.apply(v, xp, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(bad[1]), np.asarray(ref[1]))


def test_upsample2_chw_p_rejects_unpadded_width():
    """The padded-carry upsample's backward reconstructs x's physical width
    as round_up_128(w_true) — the forward must reject inputs that violate
    that contract instead of silently mis-folding gradients."""
    from infinite_texture_gans_tpu.ops.pallas_conv import upsample2_chw_p

    x = jnp.zeros((1, 4, 8, 96), jnp.float32)  # physical width != 128
    with pytest.raises(ValueError, match="round_up_128"):
        upsample2_chw_p(x, 96, "edge")


def test_ssm_grads_match():
    """SSM chw-tail gradients (modulation backward + producer-stats
    cotangents across the padded-carry contract) must match the NHWC path
    on shared variables — the SSM analog of test_grads_match."""
    cfg = dict(
        z_dim=16, G_ch=8, base_res=4, n_layers_G=5, attention=True, img_ch=3,
        type_norm="SSM", map_dim=2, padding_mode="local",
        outer_padding="replicate",
    )
    gen_ref = ResidualPatchGenerator(**cfg, chw_tail="off")
    gen_chw = ResidualPatchGenerator(**cfg, chw_tail="on")
    z = latents.build_train_z(jax.random.key(1), 2, 16, 4, 3, 3)
    maps = latents.build_train_maps(jax.random.key(2), 2, 2, 5, 4, 3, 3)
    variables = dict(
        jax.jit(lambda z, m: gen_ref.init(jax.random.key(0), z, m, train=True))(z, maps)
    )
    params = variables["params"]
    aux = {"batch_stats": variables["batch_stats"]}

    def loss(gen, p, z, m):
        (y, _), _ = gen.apply(
            {"params": p, **aux}, z, m, train=True, mutable=["batch_stats"]
        )
        return jnp.mean(y * jnp.sin(y))

    g_ref = jax.jit(jax.grad(lambda p: loss(gen_ref, p, z, maps)))(params)
    g_chw = jax.jit(jax.grad(lambda p: loss(gen_chw, p, z, maps)))(params)
    gscale = max(
        float(np.abs(np.asarray(x)).max()) for x in jax.tree_util.tree_leaves(g_ref)
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_chw),
    ):
        np.testing.assert_allclose(
            np.asarray(b) / gscale, np.asarray(a) / gscale,
            atol=5e-5, rtol=1e-3, err_msg=str(path),
        )


class TestWideEvalGate:
    """Round 5: at EVAL the chw tail extends to cin <= 128 (the flagship's
    block4 conv(104->52) was the single largest op of the 4096² canvas
    dispatch — batch-1 NHWC XLA). G_ch=34/n5 puts block4 at cin=68, i.e.
    inside the wide band: the eval one-pass must match the pure-XLA path
    on shared variables, the halo engine must stay bit-exact vs the
    one-pass oracle, and TRAINING must keep the narrow (cin<=64) gate."""

    def _cfg(self, type_norm="BN"):
        return dict(
            z_dim=16, G_ch=34, base_res=4, n_layers_G=5, attention=True,
            img_ch=3, type_norm=type_norm, map_dim=1,
            padding_mode="local", outer_padding="replicate",
        )

    def test_gate_bands(self):
        gen = ResidualPatchGenerator(**self._cfg(), chw_tail="on")
        # block4 cin=68: wide (eval) yes, narrow (train) no
        assert gen._chw_gate(4, 68, wide=True)
        assert not gen._chw_gate(4, 68, wide=False)
        assert not gen._chw_gate(4, 130, wide=True)  # above the wide band
        assert not gen._chw_gate(3, 68, wide=True)  # attention needs NHWC

    def test_eval_one_pass_matches_xla(self):
        cfg = self._cfg()
        gen_ref = ResidualPatchGenerator(**cfg, chw_tail="off")
        gen_chw = ResidualPatchGenerator(**cfg, chw_tail="on")
        z = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
        variables = dict(jax.jit(
            lambda z: gen_ref.init(jax.random.key(0), z, train=True)
        )(z))
        y_ref, _ = jax.jit(lambda v, z: gen_ref.apply(v, z, train=False))(
            variables, z
        )
        y_chw, _ = jax.jit(lambda v, z: gen_chw.apply(v, z, train=False))(
            variables, z
        )
        np.testing.assert_allclose(
            np.asarray(y_chw), np.asarray(y_ref), atol=5e-5, rtol=1e-4
        )

    def test_train_forward_keeps_narrow_gate(self):
        """Same variables, train=True: 'on' vs 'off' still agree (the wide
        band applies only at eval, so block4 stays NHWC in training)."""
        cfg = self._cfg()
        gen_ref = ResidualPatchGenerator(**cfg, chw_tail="off")
        gen_chw = ResidualPatchGenerator(**cfg, chw_tail="on")
        z = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
        variables = dict(jax.jit(
            lambda z: gen_ref.init(jax.random.key(0), z, train=True)
        )(z))

        def fwd(gen, v, z):
            (y, _), upd = gen.apply(v, z, train=True, mutable=["batch_stats"])
            return y, upd["batch_stats"]

        y_ref, bs_ref = jax.jit(lambda v, z: fwd(gen_ref, v, z))(variables, z)
        y_chw, bs_chw = jax.jit(lambda v, z: fwd(gen_chw, v, z))(variables, z)
        np.testing.assert_allclose(
            np.asarray(y_chw), np.asarray(y_ref), atol=5e-5, rtol=1e-4
        )
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_ref),
            jax.tree_util.tree_leaves_with_path(bs_chw),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
                err_msg=str(path),
            )

    @pytest.mark.parametrize("type_norm", ["BN", "SSM"])
    def test_halo_engine_matches_one_pass(self, type_norm):
        """The decisive oracle with a wide-band block in the tail: the
        stateful patch-by-patch engine == the one-pass forward on CPU f32.

        Tolerance note: at these widths the two engines differ at ~1e-6
        max — measured IDENTICALLY on the pre-wide-gate code at G_ch=32
        (whose block4 cin=64 was already inside the narrow band), so it is
        a pre-existing property: XLA's CPU convolutions in the NHWC head
        (blocks 1-3 + attention) tile their reductions width-dependently
        (5-patch one-pass rows vs 3-patch raster grids). The EXACT-zero
        bit-exactness claims live at the widths where they hold
        (tests/test_halo.py tiny nets: diff == 0.0)."""
        from infinite_texture_gans_tpu.sampling.infinite import (
            generate_canvas,
            generate_one_pass,
        )
        from infinite_texture_gans_tpu.sampling.latents import (
            build_maps_full,
            build_z_full,
        )

        cfg = self._cfg(type_norm)
        gen = ResidualPatchGenerator(**cfg, chw_tail="on")
        z = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
        maps = (
            latents.build_train_maps(jax.random.key(2), 1, 1, 5, 4, 3, 3)
            if type_norm == "SSM" else None
        )
        variables = dict(jax.jit(
            lambda: gen.init(jax.random.key(0), z, maps, train=True)
        )())
        P = gen.patch_resolution
        tot_h = tot_w = 5  # 2x2 raster steps
        z_full = build_z_full(jax.random.key(3), 1, 16, 4, tot_h, tot_w)
        maps_full = (
            build_maps_full(jax.random.key(4), 1, 1, 5, 4, tot_h, tot_w)
            if type_norm == "SSM" else None
        )
        pbp = generate_canvas(
            gen, variables, jax.random.key(5), 5 * P, 5 * P, num_images=1,
            z_full=z_full, maps_full=maps_full,
        )
        onep = np.asarray(
            generate_one_pass(gen, variables, z_full, maps_full, 2, 2)
        )
        np.testing.assert_allclose(np.asarray(pbp), onep, atol=1e-5, rtol=0)

    def test_fused_wide_halo_matches_one_pass(self):
        """fuse_up='all' with a wide-band block: block4's conv1 fuses at
        eval too (eval_fuse_blocks uses the wide gate, so site_specs and
        the forward agree on the half-res conv1 cache). Fused pbp == fused
        one-pass — the fused engine's own oracle, at the wide width."""
        from infinite_texture_gans_tpu.sampling.infinite import (
            generate_canvas,
            generate_one_pass,
        )
        from infinite_texture_gans_tpu.sampling.latents import build_z_full

        cfg = self._cfg()
        gen = ResidualPatchGenerator(**cfg, chw_tail="on", fuse_up="all")
        assert 4 in gen.eval_fuse_blocks()
        z = latents.build_train_z(jax.random.key(1), 1, 16, 4, 3, 3)
        variables = dict(jax.jit(
            lambda: gen.init(jax.random.key(0), z, train=True)
        )())
        P = gen.patch_resolution
        z_full = build_z_full(jax.random.key(3), 1, 16, 4, 5, 5)
        pbp = generate_canvas(
            gen, variables, jax.random.key(5), 5 * P, 5 * P, num_images=1,
            z_full=z_full,
        )
        onep = np.asarray(generate_one_pass(gen, variables, z_full, None, 2, 2))
        np.testing.assert_allclose(np.asarray(pbp), onep, atol=1e-5, rtol=0)
