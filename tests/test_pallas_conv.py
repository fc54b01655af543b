"""Pallas fused prenorm+pad+conv3x3 kernel vs the pure-XLA oracle.

Runs in interpreter mode on the CPU test mesh; the same code path compiles
via Mosaic on TPU. Covers both outer padding modes, relu on/off, grid
row-block cases (single block, first/last, interior), and the full custom
VJP (dx incl. the replicate edge folds, dW, db, dscale, dshift).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.ops.pallas_conv import (
    conv3x3_chw,
    conv3x3_chw_reference,
)


def make_inputs(key, n, c, co, h, w):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (n, c, h, w), jnp.float32)
    wk = jax.random.normal(k2, (3, 3, c, co), jnp.float32) * 0.3
    b = jax.random.normal(k3, (co,), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(k4, (c,), jnp.float32)
    shift = 0.2 * jax.random.normal(k5, (c,), jnp.float32)
    return x, wk, b, scale, shift


@pytest.mark.parametrize("outer", ["replicate", "constant"])
@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("h", [16, 32, 48])
def test_forward_matches_oracle(outer, relu, h):
    x, wk, b, scale, shift = make_inputs(jax.random.key(0), 2, 5, 3, h, 128)
    y = conv3x3_chw(x, wk, b, scale, shift, relu, outer)
    ref = conv3x3_chw_reference(x, wk, b, scale, shift, relu, outer)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("outer", ["replicate", "constant"])
def test_forward_and_vjp_non_lane_aligned_width(outer):
    """W not a multiple of 128 goes through the wrapper's lane padding;
    results and gradients must still match the oracle exactly."""
    x, wk, b, scale, shift = make_inputs(jax.random.key(3), 2, 4, 3, 16, 96)
    y = conv3x3_chw(x, wk, b, scale, shift, True, outer)
    ref = conv3x3_chw_reference(x, wk, b, scale, shift, True, outer)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def lp(x, wk, b):
        return jnp.sum(jnp.sin(conv3x3_chw(x, wk, b, scale, shift, True, outer)))

    def lr(x, wk, b):
        return jnp.sum(jnp.sin(conv3x3_chw_reference(x, wk, b, scale, shift, True, outer)))

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, wk, b)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, wk, b)
    for name, a, r in zip(["dx", "dw", "db"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-4, rtol=5e-4, err_msg=name
        )


@pytest.mark.parametrize("outer", ["replicate", "constant"])
def test_vjp_matches_oracle(outer):
    x, wk, b, scale, shift = make_inputs(jax.random.key(1), 2, 4, 3, 32, 128)

    def loss_pallas(x, wk, b, scale, shift):
        y = conv3x3_chw(x, wk, b, scale, shift, True, outer)
        return jnp.sum(y * jnp.cos(y * 0.1))

    def loss_ref(x, wk, b, scale, shift):
        y = conv3x3_chw_reference(x, wk, b, scale, shift, True, outer)
        return jnp.sum(y * jnp.cos(y * 0.1))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, wk, b, scale, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wk, b, scale, shift)
    names = ["dx", "dw", "db", "dscale", "dshift"]
    for name, a, r in zip(names, gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_bf16_forward_close():
    x, wk, b, scale, shift = make_inputs(jax.random.key(2), 1, 5, 3, 16, 128)
    y = conv3x3_chw(
        x.astype(jnp.bfloat16), wk, b, scale, shift, True, "replicate"
    )
    ref = conv3x3_chw_reference(x, wk, b, scale, shift, True, "replicate")
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_d_stem_conv_matches_xla():
    """The Pallas discriminator stem (conv0: 4x4/s2/p1 on the 3-channel
    image, ops/pallas_conv.py conv4x4s2_stem) must match XLA's conv on the
    same variables — outputs and all gradients, with and without SN."""
    from infinite_texture_gans_tpu.models.discriminator import PatchDiscriminator

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 48, 48, 3)), jnp.float32
    )
    for sn in (False, True):
        d_off = PatchDiscriminator(base_ch=8, n_layers_D=2, SN=sn, stem_pallas="off")
        d_on = PatchDiscriminator(base_ch=8, n_layers_D=2, SN=sn, stem_pallas="on")
        variables = d_off.init(jax.random.key(0), x, train=True)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
            d_on.init(jax.random.key(0), x, train=True)
        )
        y_off = d_off.apply(variables, x, train=False)
        y_on = d_on.apply(variables, x, train=False)
        scale = float(jnp.abs(y_off).max()) + 1e-9
        assert float(jnp.abs(y_on - y_off).max()) / scale < 1e-5

        def loss(d, v):
            return jnp.mean(jnp.tanh(d.apply(v, x, train=False) / scale))

        g_on = jax.grad(lambda v: loss(d_on, v))(variables)
        g_off = jax.grad(lambda v: loss(d_off, v))(variables)
        gs = max(
            float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g_off)
        ) + 1e-12
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_on),
            jax.tree_util.tree_leaves_with_path(g_off),
        ):
            np.testing.assert_allclose(
                np.asarray(a) / gs, np.asarray(b) / gs, atol=1e-5, err_msg=str(p)
            )


def test_d_stem_chw_wire_matches_nhwc():
    """conv4x4s2_stem_chw (the channels-major G->D image wire) must equal the
    NHWC stem in outputs, and its input gradient must be the transpose of
    the NHWC stem's — for even and odd-ish widths (lane-pad path)."""
    from infinite_texture_gans_tpu.ops.pallas_conv import (
        conv4x4s2_stem,
        conv4x4s2_stem_chw,
    )

    rng = np.random.default_rng(3)
    for h, wimg in ((48, 48), (32, 96)):
        x = jnp.asarray(rng.standard_normal((2, h, wimg, 3)), jnp.float32)
        xc = jnp.transpose(x, (0, 3, 1, 2))
        w4 = jnp.asarray(rng.standard_normal((4, 4, 3, 8)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)

        y_ref, vjp_ref = jax.vjp(conv4x4s2_stem, x, w4, b)
        y_chw, vjp_chw = jax.vjp(conv4x4s2_stem_chw, xc, w4, b)
        np.testing.assert_allclose(np.asarray(y_chw), np.asarray(y_ref), atol=1e-5)

        g = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
        dx_r, dw_r, db_r = vjp_ref(g)
        dx_c, dw_c, db_c = vjp_chw(g)
        np.testing.assert_allclose(
            np.asarray(dx_c), np.asarray(jnp.transpose(dx_r, (0, 3, 1, 2))),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(dw_c), np.asarray(dw_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(db_c), np.asarray(db_r), atol=1e-5)
