"""Single fused G+D training step (jit), TrainState, optimizers.

Replicates the reference loop semantics (reference train.py:106-181) in one
compiled function:

* per D iteration: fresh z -> G forward (train mode: BN batch stats update,
  SN power iteration), D on real + detached fake, BCE/hinge/wgan loss,
  separate-backward-accumulate == grad of the sum, Adam step
  (train.py:124-153);
* G update re-uses the LAST D-iteration's forward: the fake image is
  computed ONCE via ``jax.vjp`` and both consumed (stop-gradient) by the D
  update and back-propagated for the G update — the exact stored autograd
  graph torch reuses (train.py:161-169, ``netD(fake_x)`` after
  ``optD.step()``). This halves the number of G forwards per step (measured
  ~5 ms/step on v5e for the Exp-1 recipe) and is *more* faithful than a
  recompute: like torch, the G backward sees the activations produced with
  the updated spectral-norm u vectors;
* EMA blend of G params + BN stats after the G step (train.py:176-180).

Everything is explicit functional state: no hooks, no module mutation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from infinite_texture_gans_tpu.sampling import latents
from infinite_texture_gans_tpu.train import losses as L


@flax.struct.dataclass
class TrainState:
    params_G: Any
    aux_G: Dict[str, Any]  # batch_stats / spectral collections
    params_D: Any
    aux_D: Dict[str, Any]
    opt_G: optax.OptState
    opt_D: optax.OptState
    ema: Optional[Dict[str, Any]]  # {'params', 'batch_stats'} or None
    step: jnp.ndarray


def lr_schedule(base_lr: float, decay_lr: Optional[str], steps_per_epoch: int):
    """Per-epoch LR schedules of reference train.py:61-70: 'exp' gamma=0.99,
    'step' milestones [40, 80, 120] gamma=0.5."""
    if decay_lr == "exp":
        return lambda step: base_lr * 0.99 ** (step // steps_per_epoch)
    if decay_lr == "step":
        milestones = jnp.array([40, 80, 120])

        def sched(step):
            epoch = step // steps_per_epoch
            return base_lr * 0.5 ** jnp.sum(epoch >= milestones)

        return sched
    return base_lr


def make_optimizers(args, steps_per_epoch: int):
    tx_G = optax.adam(
        lr_schedule(args.lr_G, args.decay_lr, steps_per_epoch),
        b1=args.beta1,
        b2=args.beta2,
        eps=1e-8,
    )
    tx_D = optax.adam(
        lr_schedule(args.lr_D, args.decay_lr, steps_per_epoch),
        b1=args.beta1,
        b2=args.beta2,
        eps=1e-8,
    )
    return tx_G, tx_D


def split_variables(variables) -> Tuple[Any, Dict[str, Any]]:
    v = dict(flax.core.unfreeze(variables))
    params = v.pop("params")
    return params, v


def host_key(seed: int) -> jax.Array:
    """Root PRNG key created on the host CPU backend (UNCOMMITTED).

    The training loop's key chain (per-epoch fold_in/split, the init key)
    runs as tiny eager ops; with an accelerator-resident root key each one
    dispatches across the backend boundary, and on a tunneled accelerator
    that cross-backend shuffle is a latency lottery — measured stalls of
    45-130 s inside create_train_state's first split (docs/PERF.md round
    4). The key is created UNDER the CPU default-device context but NOT
    device_put-committed: uncommitted arrays remain valid arguments for
    any jitted computation's device set (incl. meshes), while eager key
    ops under a ``jax.default_device(cpu)`` context stay entirely local."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.random.key(seed)
    with jax.default_device(cpu):
        return jax.random.key(seed)


def create_train_state(G, D, args, key, steps_per_epoch: int) -> Tuple[TrainState, Any, Any]:
    """Initialise models + optimizers. Returns (state, tx_G, tx_D).

    The init graphs (G.init/D.init + optimizer/EMA zeros) run on the HOST
    CPU backend and the finished state ships to the accelerator in one
    device_put: on a remote-compile backend (the axon tunnel) compiling the
    init graphs for the device cost ~170 s per training run, vs seconds of
    CPU compile + ~2 s of one-time H2D for the ~30 MB state."""
    tx_G, tx_D = make_optimizers(args, steps_per_epoch)

    def build():
        kg, kd = jax.random.split(key)
        # Init on a 1x1 patch grid with the Pallas tail off: parameter/stat
        # SHAPES and init VALUES depend on neither the grid's spatial
        # extent nor the kernel implementation (initializers consume only
        # shapes; batch stats are not updated while initializing) —
        # verified identical params + batch_stats vs the full-grid init at
        # flagship width, and across chw_tail/fuse_up settings
        # (tests/test_train.py). The flagship 3x3-grid init graph costs
        # ~100 s of XLA:CPU compile on every fresh host; the 1x1 XLA-only
        # graph ~3 s, and it sidesteps any Pallas min-width constraint at
        # the narrow single-patch maps.
        G_init = G.clone(
            num_patches_h=1, num_patches_w=1, chw_tail="off", fuse_up="off"
        )
        gh = gw = 1
        if G.padding_mode == "local":
            z = jnp.zeros((1, gh * G.base_res + 2, gw * G.base_res + 2, G.z_dim))
        else:
            z = jnp.zeros((1, G.base_res, G.base_res, G.z_dim))
        maps = None
        if G.type_norm == "SSM":
            maps = latents.build_train_maps(
                jax.random.key(0), 1, G.map_dim, G.n_layers_G, G.base_res, gh, gw
            ) if G.padding_mode == "local" else [
                jnp.zeros((1, (2**i) * G.base_res, (2**i) * G.base_res, G.map_dim))
                for i in range(G.n_layers_G)
            ]
        g_vars = jax.jit(lambda z, m: G_init.init(kg, z, m, train=True))(z, maps)
        d_vars = jax.jit(lambda x: D.init(kd, x, train=True))(
            jnp.zeros((1, 64, 64, args.img_ch))
        )

        params_G, aux_G = split_variables(g_vars)
        params_D, aux_D = split_variables(d_vars)
        ema = None
        if args.ema:
            ema = {
                "params": jax.tree_util.tree_map(jnp.copy, params_G),
                "batch_stats": jax.tree_util.tree_map(
                    jnp.copy, aux_G.get("batch_stats", {})
                ),
            }
        return TrainState(
            params_G=params_G,
            aux_G=aux_G,
            params_D=params_D,
            aux_D=aux_D,
            opt_G=tx_G.init(params_G),
            opt_D=tx_D.init(params_D),
            ema=ema,
            step=jnp.zeros((), jnp.int32),
        )

    default = jax.devices()[0]
    cpu = None
    if default.platform != "cpu":
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
    if cpu is None:
        return build(), tx_G, tx_D
    from infinite_texture_gans_tpu import cpu_cache_scope

    # route the init graphs' XLA:CPU executables to the per-host cache dir
    # (they embed host machine features; the shared dir must stay portable)
    with cpu_cache_scope(), jax.default_device(cpu):
        state = build()
    return jax.device_put(state, default), tx_G, tx_D


def _make_step_impl(
    G,
    D,
    tx_G,
    tx_D,
    *,
    loss_type: str = "standard",
    smooth: bool = False,
    disc_iters: int = 1,
    num_images: int = 8,
    ema_decay: float = 0.999,
    use_ema: bool = False,
    gp_weight: float = 10.0,
    mesh=None,
) -> Callable:
    """The UN-jitted step body: (state, real_x, key) -> (state, metrics).

    ``make_train_step`` jits it directly (one step per dispatch);
    ``make_train_superstep`` scans it (K steps per dispatch, crops sampled
    in-jit) so high-latency dispatch links amortize.

    ``loss_type='wgan'`` trains WGAN-GP: the critic loss gains
    ``gp_weight * gradient_penalty`` on real/fake interpolates
    (train/losses.py: gradient_penalty) — without it a WGAN critic is
    unconstrained and diverges. The reference parsed but ignored the flag
    (reference utils.py:85-86)."""
    label_t = 0.9 if smooth else 1.0
    gh, gw = G.num_patches_h, G.num_patches_w
    local = G.padding_mode == "local"

    # Channels-major G->D image wire: when the G's Pallas tail is active and
    # the D stem can consume CHW, the fake image (and its gradient) stays
    # (N, C, H, W) end to end — no C=3 NHWC array materializes at the G<->D
    # boundary. Traced A/B on v5e: step-time-neutral (the Pallas stem pair
    # costs what the removed XLA conv0 fusions + boundary copies cost); kept
    # because it removes the worst-layout (C=3 NHWC) intermediates and keeps
    # the boundary Pallas-owned for future kernel fusion (docs/PERF.md
    # round 3 A/B). WGAN-GP interpolates fake with the NHWC real batch, so
    # it keeps the NHWC wire.
    chw_wire = (
        G.emits_chw()
        and getattr(D, "kw", None) == 4
        and G.img_ch == 3
        and loss_type != "wgan"
    )

    # Data-parallel G: z/maps are drawn inside the jit from a replicated key,
    # so without a constraint GSPMD replicates the entire G forward/backward
    # on every device (the D grads all-reduce, the G grads never need to —
    # verified in tests/test_parallel.py::test_train_step_collective_layout).
    # Pinning the freshly drawn latents to the data axis makes the G path
    # genuinely sharded; BN stats then all-reduce to the same GLOBAL batch
    # statistics (PARITY.md semantics unchanged).
    shard_fakes = (
        mesh is not None and num_images % mesh.size == 0 and num_images >= mesh.size
    )
    if shard_fakes:
        from jax.sharding import NamedSharding, PartitionSpec

        _batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

    def _constrain(x):
        if shard_fakes and x is not None:
            return jax.lax.with_sharding_constraint(x, _batch_sharding)
        return x

    def sample_z_maps(key):
        zk, mk = jax.random.split(key)
        if local:
            z = latents.build_train_z(zk, num_images, G.z_dim, G.base_res, gh, gw)
        else:
            z = jax.random.normal(zk, (num_images, G.base_res, G.base_res, G.z_dim))
        maps = None
        if G.type_norm == "SSM":
            if local:
                maps = latents.build_train_maps(
                    mk, num_images, G.map_dim, G.n_layers_G, G.base_res, gh, gw
                )
            else:
                keys = jax.random.split(mk, G.n_layers_G)
                maps = [
                    jax.random.normal(
                        keys[i],
                        (num_images, (2**i) * G.base_res, (2**i) * G.base_res, G.map_dim),
                    )
                    for i in range(G.n_layers_G)
                ]
        z = _constrain(z)
        if maps is not None:
            maps = [_constrain(m) for m in maps]
        return z, maps

    def g_forward(params_G, aux_G, z, maps):
        variables = {"params": params_G, **aux_G}
        (fake, _), new_aux = G.apply(
            variables, z, maps, train=True, update_sn=True,
            out_chw=chw_wire, mutable=list(aux_G.keys())
        )
        return fake, dict(new_aux)

    def d_apply(params_D, aux_D, x, chw_in=False):
        variables = {"params": params_D, **aux_D}
        out = D.apply(
            variables, x, train=True, update_sn=True, chw_in=chw_in,
            mutable=list(aux_D.keys())
        )
        if isinstance(out, tuple):
            logit, new_aux = out
            return logit, dict(new_aux)
        return out, aux_D

    def train_step(state: TrainState, real_x: jnp.ndarray, key: jax.Array):
        params_D, aux_D, opt_D = state.params_D, state.aux_D, state.opt_D
        aux_G = state.aux_G
        d_loss_real_acc = 0.0
        d_loss_fake_acc = 0.0
        fake_last = g_vjp = None

        keys = jax.random.split(key, disc_iters)
        for it in range(disc_iters):
            z, maps = sample_z_maps(keys[it])
            if it == disc_iters - 1:
                # The G forward whose graph the G update will re-use:
                # differentiate wrt params only (aux enters as a constant,
                # matching the reference's stored graph).
                aux_G_pre = aux_G

                def g_fwd(p):
                    return g_forward(p, aux_G_pre, z, maps)

                fake, g_vjp, aux_G = jax.vjp(g_fwd, state.params_G, has_aux=True)
                fake_last = fake
                fake = jax.lax.stop_gradient(fake)
            else:
                fake, aux_G = g_forward(state.params_G, aux_G, z, maps)
                fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(p, aux):
                rl, aux1 = d_apply(p, aux, real_x)
                fl, aux2 = d_apply(p, aux1, fake, chw_in=chw_wire)
                lr_ = L.d_loss_real(loss_type, rl, label_t)
                lf_ = L.d_loss_fake(loss_type, fl, 0.0)
                total = lr_ + lf_
                if loss_type == "wgan" and gp_weight > 0:
                    # frozen-aux critic for the penalty: no SN/BN mutation
                    # inside the double-backward
                    def critic(x):
                        out = D.apply({"params": p, **aux2}, x, train=False)
                        return out[0] if isinstance(out, tuple) else out

                    gp = L.gradient_penalty(
                        critic, real_x, fake, jax.random.fold_in(keys[it], 7)
                    )
                    total = total + gp_weight * gp
                return total, (aux2, lr_, lf_)

            grads, (aux_D, lr_, lf_) = jax.grad(d_loss_fn, has_aux=True)(
                params_D, aux_D
            )
            updates, opt_D = tx_D.update(grads, opt_D, params_D)
            params_D = optax.apply_updates(params_D, updates)
            d_loss_real_acc += lr_
            d_loss_fake_acc += lf_

        # --- G update: differentiate the UPDATED D wrt the stored fake, then
        # pull the cotangent through the saved G forward (one G backward, no
        # second G forward) --------------------------------------------------
        def g_loss_from_fake(fk):
            logit, new_aux_D = d_apply(params_D, aux_D, fk, chw_in=chw_wire)
            return L.g_loss(loss_type, logit, label_t), new_aux_D

        (gl_, aux_D_after), dfake = jax.value_and_grad(
            g_loss_from_fake, has_aux=True
        )(fake_last)
        (g_grads,) = g_vjp(dfake)
        updates_G, opt_G = tx_G.update(g_grads, state.opt_G, state.params_G)
        params_G = optax.apply_updates(state.params_G, updates_G)

        # --- EMA (reference train.py:176-180): blend params + BN stats -----
        ema = state.ema
        if use_ema:
            new_snapshot = {
                "params": params_G,
                "batch_stats": aux_G.get("batch_stats", {}),
            }
            ema = jax.tree_util.tree_map(
                lambda e, n: e * ema_decay + n * (1.0 - ema_decay), ema, new_snapshot
            )

        metrics = {
            "d_loss_real": d_loss_real_acc,
            "d_loss_fake": d_loss_fake_acc,
            "g_loss": gl_,
        }
        new_state = TrainState(
            params_G=params_G,
            aux_G=aux_G,
            params_D=params_D,
            aux_D=aux_D_after,
            opt_G=opt_G,
            opt_D=opt_D,
            ema=ema,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_train_step(G, D, tx_G, tx_D, **kw) -> Callable:
    """Build the jitted per-call train step: (state, real_x, key) ->
    (state, metrics). See :func:`_make_step_impl` for the semantics and
    keyword arguments."""
    impl = _make_step_impl(G, D, tx_G, tx_D, **kw)
    return jax.jit(impl, donate_argnums=(0,))


def make_train_superstep(
    G,
    D,
    tx_G,
    tx_D,
    *,
    crop: Optional[int],
    batch_size: int,
    mesh=None,
    sampler: str = "single",
    **kw,
) -> Callable:
    """K train steps in ONE device dispatch.

    Returns ``superstep(state, img_u8, crop_keys, step_keys) -> (state,
    metrics)`` where ``img_u8`` is the (H, W, C) uint8 source texture already
    on device (``data.datasets.DeviceCropSampler.img``), ``crop_keys`` /
    ``step_keys`` are length-K key arrays, and ``metrics`` holds (K,)-stacked
    per-step scalars. The body is ``lax.scan`` over the exact fused step of
    :func:`_make_step_impl`, with the real batch sampled IN-JIT per step —
    identical key usage to ``DeviceCropSampler.sample`` (same
    split/randint/dynamic_slice/normalize sequence), so a superstep epoch
    samples the same crops/latents and runs the same algorithm as the
    per-step epoch; results agree to reduction-order float noise
    (tests/test_train.py::test_superstep_matches_per_step).

    Why: each jitted call costs one host->device dispatch round trip. On a
    directly-attached host that is ~10s of us; through a tunneled backend it
    measured ~5 ms/step — ~20% of the whole Exp-1 step (docs/PERF.md). One
    dispatch per K steps makes the wall rate converge to the traced device
    rate. The reference pays a DataLoader fetch + H2D per step
    (reference train.py:113); this path ships the source image once.

    ``crop=None`` (center-crop datasets) broadcasts the pre-cropped image
    (reference datasets_classes.py:31-38). Under a ``mesh`` the sampled
    batch is pinned to the data axis, matching ``DeviceCropSampler``'s
    sharded output.

    ``sampler='multi'`` (multiple_images runs): ``img`` is
    ``DeviceMultiImageSampler.img`` — the padded ``(imgs, h_valid, w_valid)``
    stack for random-crop datasets (per-step (image, crop) draws via
    ``sample_multi_crops_body``), or the equalized image stack alone for
    center-crop/resize datasets (``pick_images_body``).
    """
    impl = _make_step_impl(G, D, tx_G, tx_D, mesh=mesh, **kw)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def superstep(state: TrainState, img: jnp.ndarray, crop_keys, step_keys):
        def sample_real(ck):
            # the SHARED sample bodies (data.datasets): the
            # superstep-equals-per-step guarantee depends on both paths
            # tracing the same key derivation and arithmetic
            from infinite_texture_gans_tpu.data.datasets import (
                broadcast_norm_body,
                pick_images_body,
                sample_crops_body,
                sample_multi_crops_body,
            )

            if sampler == "multi":
                if crop:
                    real = sample_multi_crops_body(*img, ck, crop, batch_size)
                else:
                    real = pick_images_body(img, ck, batch_size)
            elif crop:
                real = sample_crops_body(img, ck, crop, batch_size)
            else:
                real = broadcast_norm_body(img, batch_size)
            if mesh is not None:
                real = jax.lax.with_sharding_constraint(real, batch_sharding)
            return real

        def body(st, ks):
            ck, sk = ks
            st, metrics = impl(st, sample_real(ck), sk)
            return st, metrics

        return jax.lax.scan(body, state, (crop_keys, step_keys))

    return superstep


def dispatch_chunk(steps_per_epoch: int, cap: int = 128) -> int:
    """Largest divisor of ``steps_per_epoch`` that is <= ``cap``: the
    superstep scan length K. A divisor keeps the epoch to ONE compiled
    shape (a remainder chunk would compile a second program — minutes on a
    remote-compile backend). cap<=1 disables the superstep path."""
    if cap <= 1 or steps_per_epoch <= 1:
        return 1
    best = 1
    for k in range(1, min(steps_per_epoch, cap) + 1):
        if steps_per_epoch % k == 0:
            best = k
    return best


def dispatch_plan(steps_per_epoch: int, cap: int = 128) -> Tuple[int, int]:
    """Superstep dispatch plan: ``(K, remainder)``.

    Prefers the largest divisor of ``steps_per_epoch`` <= ``cap`` (ONE
    compiled scan shape, :func:`dispatch_chunk`). When that divisor is
    degenerate (< cap//4 — e.g. a PRIME steps_per_epoch above the cap, where
    the old behaviour silently fell back to per-step dispatch and the ~20%
    superstep win vanished), the plan is ``steps // cap`` full chunks of
    ``K = cap`` plus one remainder chunk of ``steps % cap``: a SECOND
    compiled scan shape, compiled once and reused by every epoch."""
    k = dispatch_chunk(steps_per_epoch, cap)
    if cap <= 1 or steps_per_epoch <= 1 or k >= max(2, cap // 4):
        return k, 0
    k = min(cap, steps_per_epoch)
    return k, steps_per_epoch % k
