"""Correctness of the channels-major SSM embed-chain kernels
(ops/pallas_ssm.py) against a pure-XLA valid-conv oracle, in interpreter
mode on the CPU test mesh; the same code path compiles on TPU
(benchmarks/trace_step.py BENCH_RECIPE=ssm).

Reference semantics under test: models/layers.py:203-234 of
/root/reference — SPADE-style gamma/beta from two valid 3x3 convs with a
ReLU between, on a 4px-oversized map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_texture_gans_tpu.ops.pallas_ssm import (
    ssm_embed_chw_p,
    ssm_embed_chw_reference,
)


def _inputs(seed, n, md, H, W, hid, co):
    rng = np.random.default_rng(seed)
    maps = jnp.asarray(
        rng.standard_normal((n, md, H + 4, W + 4), dtype=np.float32)
    )
    k1 = jnp.asarray(rng.standard_normal((3, 3, md, hid), dtype=np.float32)) * 0.2
    b1 = jnp.asarray(rng.standard_normal((hid,), dtype=np.float32)) * 0.1
    k2 = jnp.asarray(rng.standard_normal((3, 3, hid, co), dtype=np.float32)) * 0.2
    b2 = jnp.asarray(rng.standard_normal((co,), dtype=np.float32)) * 0.1
    return maps, k1, b1, k2, b2


@pytest.mark.parametrize(
    "n,md,H,W,hid,co",
    [
        (2, 1, 24, 44, 16, 10),  # generic small
        (1, 3, 16, 128, 8, 6),   # md > 1; W a lane multiple (out wider than maps pad)
        (2, 1, 32, 60, 128, 104),  # production-like channel counts
    ],
)
def test_ssm_embed_forward_matches_oracle(n, md, H, W, hid, co):
    maps, k1, b1, k2, b2 = _inputs(0, n, md, H, W, hid, co)
    ref = ssm_embed_chw_reference(maps, k1, b1, k2, b2)
    out_w = max(W + (-W) % 128, 128)
    y = ssm_embed_chw_p(maps, k1, b1, k2, b2, W, out_w)
    assert y.shape == (n, co, H, out_w)
    np.testing.assert_allclose(
        np.asarray(y[..., :W]), np.asarray(ref), rtol=0, atol=2e-4
    )
    # padded-carry contract: lane-pad columns replicate the true edge
    np.testing.assert_array_equal(
        np.asarray(y[..., W:]), np.asarray(jnp.broadcast_to(
            y[..., W - 1 : W], y[..., W:].shape))
    )


@pytest.mark.parametrize("bwd_impl", ["xla", "pallas"])
def test_ssm_embed_grads_match_oracle_autodiff(bwd_impl):
    n, md, H, W, hid, co = 2, 1, 24, 44, 16, 10
    maps, k1, b1, k2, b2 = _inputs(1, n, md, H, W, hid, co)
    rng = np.random.default_rng(2)
    gcot = jnp.asarray(rng.standard_normal((n, co, H, W), dtype=np.float32))
    out_w = 128

    def loss_k(k1, b1, k2, b2):
        y = ssm_embed_chw_p(maps, k1, b1, k2, b2, W, out_w, bwd_impl)
        return jnp.sum(y[..., :W] * gcot)

    def loss_ref(k1, b1, k2, b2):
        return jnp.sum(ssm_embed_chw_reference(maps, k1, b1, k2, b2) * gcot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(k1, b1, k2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(k1, b1, k2, b2)
    for name, a, b in zip(("dk1", "db1", "dk2", "db2"), gk, gr):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(b).max()) + 1e-9)
        assert rel < 2e-5, (name, rel)


@pytest.mark.parametrize("bwd_impl", ["xla", "pallas"])
def test_ssm_embed_padfix_adjoint(bwd_impl):
    """Cotangents landing in the replicate-filled pad columns must fold
    into the true edge column (the exact adjoint of the forward fill)."""
    n, md, H, W, hid, co = 1, 1, 16, 60, 8, 6
    out_w = 128
    maps, k1, b1, k2, b2 = _inputs(3, n, md, H, W, hid, co)
    rng = np.random.default_rng(4)
    gfull = jnp.asarray(rng.standard_normal((n, co, H, out_w), dtype=np.float32))

    def loss_k(k1, b1, k2, b2):
        return jnp.sum(
            ssm_embed_chw_p(maps, k1, b1, k2, b2, W, out_w, bwd_impl) * gfull
        )

    def loss_ref(k1, b1, k2, b2):
        y = ssm_embed_chw_reference(maps, k1, b1, k2, b2)
        fold = jnp.sum(gfull[..., W:], axis=-1)
        return jnp.sum(y * gfull[..., :W]) + jnp.sum(y[..., W - 1] * fold)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(k1, b1, k2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(k1, b1, k2, b2)
    for name, a, b in zip(("dk1", "db1", "dk2", "db2"), gk, gr):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(b).max()) + 1e-9)
        assert rel < 2e-5, (name, rel)


def test_ssm_embed_maps_cotangent_is_zero_by_contract():
    """dmaps is DEFINED zero (RNG latents, no trainable producer) — assert
    the contract so a future caller can't silently rely on it."""
    n, md, H, W, hid, co = 1, 1, 16, 28, 4, 2
    maps, k1, b1, k2, b2 = _inputs(5, n, md, H, W, hid, co)
    g = jax.grad(
        lambda m: jnp.sum(ssm_embed_chw_p(m, k1, b1, k2, b2, W, 128))
    )(maps)
    assert float(jnp.abs(g).max()) == 0.0
