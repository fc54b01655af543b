#!/usr/bin/env python
"""Decompose the Exp-1 train step cost: G fwd, D fwd (real/fake), D step,
G step, EMA — to find where the 85ms goes before optimizing anything."""

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
from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.train import losses as L
from infinite_texture_gans_tpu.train.train_step import host_key, create_train_state, make_train_step

import optax


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = prepare_parser().parse_args([])
    args.padding_mode = "local"; args.attention = True
    args.n_layers_G = 6; args.n_layers_D = 4
    args.spec_norm_D = True; args.smooth = True; args.ema = True
    args.random_crop = 192; args.batch_size = 64; args.num_images = 8

    G = ResidualPatchGenerator(**generator_kwargs(args))
    D = PatchDiscriminator(**discriminator_kwargs(args))
    state, tx_G, tx_D = create_train_state(G, D, args, host_key(0), 125)
    step = make_train_step(
        G, D, tx_G, tx_D, loss_type=args.loss, smooth=True, disc_iters=1,
        num_images=8, ema_decay=0.999, use_ema=True,
    )
    real = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 192, 192, 3), dtype=np.float32).clip(-1, 1))

    out = {}

    @jax.jit
    def g_fwd(params_G, aux_G, z):
        variables = {"params": params_G, **aux_G}
        (fake, _), _ = G.apply(variables, z, None, train=True, update_sn=True,
                               mutable=list(aux_G.keys()))
        return fake

    z = latents.build_train_z(jax.random.key(1), 8, args.z_dim, args.base_res, 3, 3)
    out["g_fwd_train_ms"] = round(timeit(g_fwd, state.params_G, state.aux_G, z), 3)

    @jax.jit
    def d_fwd(params_D, aux_D, x):
        variables = {"params": params_D, **aux_D}
        logit, _ = D.apply(variables, x, train=True, update_sn=True,
                           mutable=list(aux_D.keys()))
        return logit

    fake = g_fwd(state.params_G, state.aux_G, z)
    out["d_fwd_real64_ms"] = round(timeit(d_fwd, state.params_D, state.aux_D, real), 3)
    out["d_fwd_fake8_ms"] = round(timeit(d_fwd, state.params_D, state.aux_D, fake), 3)

    @jax.jit
    def d_grad_step(params_D, aux_D, opt_D, real, fake):
        def loss_fn(p, aux):
            variables = {"params": p, **aux}
            rl, aux1 = D.apply(variables, real, train=True, update_sn=True,
                               mutable=list(aux.keys()))
            fl, _ = D.apply({"params": p, **dict(aux1)}, fake, train=True,
                            update_sn=True, mutable=list(aux.keys()))
            return L.d_loss_real("standard", rl, 0.9) + L.d_loss_fake("standard", fl), None
        grads, _ = jax.grad(loss_fn, has_aux=True)(params_D, aux_D)
        updates, opt_D = tx_D.update(grads, opt_D, params_D)
        return optax.apply_updates(params_D, updates)

    out["d_grad_step_ms"] = round(
        timeit(d_grad_step, state.params_D, state.aux_D, state.opt_D, real, fake), 3)

    @jax.jit
    def g_grad_step(params_G, aux_G, params_D, aux_D, opt_G, z):
        def loss_fn(p):
            variables = {"params": p, **aux_G}
            (fake, _), _ = G.apply(variables, z, None, train=True,
                                   mutable=list(aux_G.keys()))
            logit, _ = D.apply({"params": params_D, **aux_D}, fake, train=True,
                               update_sn=True, mutable=list(aux_D.keys()))
            return L.g_loss("standard", logit, 0.9)
        grads = jax.grad(loss_fn)(params_G)
        updates, opt_G = tx_G.update(grads, opt_G, params_G)
        return optax.apply_updates(params_G, updates)

    out["g_grad_step_ms"] = round(
        timeit(g_grad_step, state.params_G, state.aux_G, state.params_D,
               state.aux_D, state.opt_G, z), 3)

    # the train step donates its input state -> chain states when timing
    st = step(state, real, jax.random.key(2))[0]
    jax.block_until_ready(st.params_G)
    t0 = time.perf_counter()
    for i in range(20):
        st, _ = step(st, real, jax.random.key(3 + i))
    jax.block_until_ready(st.params_G)
    out["full_step_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
