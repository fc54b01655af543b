"""Model building blocks (flax.linen, NHWC).

Equivalents of reference models/layers.py:8-400, re-designed for the merged
grid layout: ConvLP (conv with local padding), StochasticSpatialModulation,
Attention, generator/discriminator residual blocks.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinite_texture_gans_tpu.ops.conv import Conv, conv1x1, conv3x3, orthogonal
from infinite_texture_gans_tpu.ops.grid import grid_to_patches, patches_to_grid
from infinite_texture_gans_tpu.ops.padding import (
    GridPos,
    SiteState,
    halo_pad_step,
    local_pad,
)
from infinite_texture_gans_tpu.ops.pallas_conv import (
    chw_halo_step,
    chw_upconv_halo_step,
    conv1x1_chw,
    conv1x1_chw_add,
    conv1x1_chw_add_p,
    conv1x1_chw_add_stats,
    conv1x1_chw_p,
    conv3x3_chw,
    conv3x3_chw_p,
    conv3x3_chw_stats,
    upconv3x3_chw_p,
    upsample2_chw,
    upsample2_chw_add_p,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _leaky_relu_saved_y(x, slope: float):
    return jnp.where(x >= 0, x, slope * x)


def _leaky_fwd(x, slope):
    y = _leaky_relu_saved_y(x, slope)
    return y, y


def _leaky_bwd(slope, y, g):
    # sign(y) == sign(x) for any positive slope, so the mask derives from
    # the OUTPUT — which is live anyway as the next layer's saved input —
    # instead of the default vjp's u32-bit-packed x>=0 predicate tensor.
    # Measured step-time-neutral on v5e (XLA hides the pack/unpack inside
    # its conv fusions); kept for the smaller backward residual set
    # (docs/PERF.md round 3 A/B).
    return (jnp.where(y >= 0, g, slope * g),)


_leaky_relu_saved_y.defvjp(_leaky_fwd, _leaky_bwd)


@jax.custom_vjp
def _relu_saved_y(x):
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = _relu_saved_y(x)
    return y, y


def _relu_bwd(y, g):
    # y > 0 <=> x > 0, and jax.nn.relu's gradient at x == 0 is 0, so
    # where(y > 0, g, 0) is exact — same saved-output trick as the leaky
    # variant above.
    return (jnp.where(y > 0, g, 0.0).astype(g.dtype),)


_relu_saved_y.defvjp(_relu_fwd, _relu_bwd)


def activation_fn(leak: float):
    """LeakyReLU(leak) if leak > 0 else ReLU (reference models/layers.py:289-292).

    Both variants carry a custom vjp that derives the backward mask from the
    saved OUTPUT (already live as the next layer's input) instead of letting
    XLA materialize and u32-bit-pack an x>=0 pred tensor. Traced A/B on v5e:
    step-time-neutral (XLA folds the pack into its fusions either way); kept
    because it drops the packed-mask residuals from the saved set
    (docs/PERF.md round 3 A/B)."""
    if leak > 0:
        return lambda x: _leaky_relu_saved_y(x, leak)
    return _relu_saved_y


class RawConvParams(nn.Module):
    """Declares the same parameters as :class:`ops.conv.Conv` (HWIO kernel +
    bias, orthogonal init) WITHOUT computing — the channels-major Pallas path
    consumes the raw arrays, and using this under the same submodule name
    keeps the variable tree identical to the XLA path (same checkpoints, same
    torch importer)."""

    features: int
    kernel_size: int = 3
    kernel_init: Any = None

    @nn.compact
    def __call__(self, in_ch: int):
        ks = self.kernel_size
        init = self.kernel_init or orthogonal(column_axis=-1)
        kernel = self.param(
            "kernel", init, (ks, ks, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BNFold(nn.Module):
    """BatchNorm on channels-major (N, C, H, W) that returns the folded
    per-channel ``(scale, shift)`` for fusion into the Pallas conv instead of
    a normalized array. Parameter/stat names, shapes, inits and the running-
    stat update match ``nn.BatchNorm(momentum=0.9, epsilon=1e-5)`` exactly,
    so both code paths share variables."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x_chw: jnp.ndarray, *, train: bool, stats=None,
        w_true: Optional[int] = None,
    ):
        """``w_true``: on the padded-carry path (physical width lane-padded
        past the valid columns) moments must only see the first ``w_true``
        columns; required whenever ``stats`` is None and x may be padded."""
        c = x_chw.shape[1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            if stats is not None:
                # producer-kernel statistics (Pallas accumulators) — same
                # moments, no XLA reduce over the big array. ``stats`` may
                # come from BEFORE a nearest-2x upsample: mean/var are
                # invariant (each value repeats 4x), count is the
                # pre-upsample element count matching s1/s2.
                s1, s2, cnt = stats
                m = s1 / cnt
                v = s2 / cnt - jnp.square(m)
            else:
                xf = x_chw.astype(jnp.float32)
                if w_true is not None and w_true != xf.shape[3]:
                    xf = xf[:, :, :, :w_true]  # exclude lane-pad columns
                m = jnp.mean(xf, axis=(0, 2, 3))
                v = jnp.mean(jnp.square(xf), axis=(0, 2, 3)) - jnp.square(m)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * m
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * v
        else:
            m, v = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(v + self.epsilon) * scale
        return inv, bias - m * inv


class ConvLP(nn.Module):
    """3x3 conv with local or zero padding (reference conv2d_lp,
    models/layers.py:8-36).

    'local' mode operates on the merged grid: outer edge padding in training
    (identical to the reference merge->pad->overlap-crop per patch), halo
    cache assembly at stateful inference. 'zeros' mode is an ordinary pad-1
    conv.

    The start conv of the generator uses ``pre_padded=True``: its input (the
    spatial latent z) already carries a 1px halo of real values
    (reference models/layers.py:163-166 skips padding for z).
    """

    features: int
    sn: bool = False
    padding_mode: str = "local"
    outer_padding: str = "replicate"
    pre_padded: bool = False
    gh: int = 3
    gw: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        halo: Optional[SiteState] = None,
        pos: Optional[GridPos] = None,
        *,
        update_sn: bool = False,
        chw_fold=None,
        want_stats: bool = False,
        pad_w_true: Optional[int] = None,
        fuse_up_w_true: Optional[int] = None,
    ):
        if chw_fold is not None:
            # Channels-major fused path: x is (N, C, H, W); the preceding
            # BN-apply + ReLU are folded into the Pallas conv (see
            # ops/pallas_conv.py). Same 'conv' submodule name -> same tree.
            scale, shift, relu = chw_fold
            kernel, bias = RawConvParams(self.features, 3, name="conv")(x.shape[1])
            if fuse_up_w_true is not None:
                if halo is not None:
                    # fused stateful raster step (fuse_up='all' eval): the
                    # site caches conv1's halo at HALF resolution (see
                    # ops/pallas_conv.py: chw_upconv_halo_step)
                    return chw_upconv_halo_step(
                        x, kernel, bias, scale, shift, relu,
                        self.outer_padding, halo, pos, self.gh, self.gw,
                    )
                # subpixel-fused upsample+conv (one-pass path; x at HALF
                # resolution, fuse_up_w_true = its true width)
                out = upconv3x3_chw_p(
                    x, kernel, bias, scale, shift, relu, self.outer_padding,
                    fuse_up_w_true, want_stats,
                )
                if want_stats:
                    y, s1, s2 = out
                    cnt = y.shape[0] * y.shape[2] * (2 * fuse_up_w_true)
                    return y, halo, (s1, s2, cnt)
                return out, halo
            if halo is not None:
                # stateful raster step: halo cache supplies top/left, the
                # Pallas halo kernel does the padded conv (inference only)
                return chw_halo_step(
                    x, kernel, bias, scale, shift, relu, self.outer_padding,
                    halo, pos, self.gh, self.gw,
                )
            if pad_w_true is not None:
                # padded-carry convention (ops/pallas_conv.py): x arrives at
                # physical lane width, output keeps the contract
                out = conv3x3_chw_p(
                    x, kernel, bias, scale, shift, relu, self.outer_padding,
                    pad_w_true, want_stats,
                )
                if want_stats:
                    y, s1, s2 = out
                    cnt = y.shape[0] * y.shape[2] * pad_w_true
                    return y, halo, (s1, s2, cnt)
                return out, halo
            if want_stats:
                # train-mode tail: the kernel also accumulates the next
                # BN's batch moments (ops/pallas_conv.py: conv3x3_chw_stats)
                y, s1, s2 = conv3x3_chw_stats(
                    x, kernel, bias, scale, shift, relu, self.outer_padding
                )
                cnt = y.shape[0] * y.shape[2] * y.shape[3]
                return y, halo, (s1, s2, cnt)
            y = conv3x3_chw(x, kernel, bias, scale, shift, relu, self.outer_padding)
            return y, halo
        if self.padding_mode == "local":
            if self.pre_padded:
                padded = x
            elif halo is None:
                padded = local_pad(x, 1, self.outer_padding)
            else:
                padded, halo = halo_pad_step(
                    x, halo, pos, self.gh, self.gw, self.outer_padding
                )
            y = conv3x3(self.features, self.sn, padding=0, dtype=self.dtype, name="conv")(
                padded, update_sn=update_sn
            )
        else:
            y = conv3x3(self.features, self.sn, padding=1, dtype=self.dtype, name="conv")(
                x, update_sn=update_sn
            )
        return y, halo


def _ssm_embed_init(hidden: int, in_channel: int):
    """Reference SSM embed init (models/layers.py:225-226), code-truth:

    after a full orthogonal init, torch re-orthogonalizes the *input-channel*
    slice ``weight[:, :in_channel]`` and zeroes ``weight[:, in_channel:]``
    (a quirk — the comment intent was the gamma/beta output split, the code
    slices input channels). Reproduced faithfully on the HWIO kernel.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape  # cin == hidden(128), cout == 2*in_channel
        cut = min(in_channel, cin)
        sub = nn.initializers.orthogonal(column_axis=-1)(key, (kh, kw, cut, cout), dtype)
        kernel = jnp.zeros(shape, dtype)
        return kernel.at[:, :, :cut, :].set(sub)

    return init


class StochasticSpatialModulation(nn.Module):
    """SPADE-style normalization with a random spatial map (reference
    models/layers.py:203-234): parameter-free BN, then gamma/beta predicted
    from the map by two 3x3 convs.

    In 'local' padding mode the convs are valid (p=0) and the map must arrive
    4px oversized; overlapping per-patch map crops in the reference are
    equivalent to one valid conv chain on the merged oversized map.
    """

    sn: bool = False
    padding_mode: str = "local"
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        maps: jnp.ndarray,
        *,
        train: bool,
        update_sn: bool = False,
        chw: bool = False,
        stats=None,
        w_true: Optional[int] = None,
    ) -> jnp.ndarray:
        c = x.shape[1] if chw else x.shape[-1]
        if chw:
            # channels-major branch: stats over (N, H, W) of (N, C, H, W),
            # identical variable tree to nn.BatchNorm (batch_stats only —
            # use_scale/use_bias are False in the NHWC branch). ``w_true``:
            # padded-carry convention — x arrives at physical lane width;
            # moments exclude the pad columns and gamma/beta (computed at
            # true width from the maps) are zero-padded out to match (pad
            # columns then carry (1+0)*BN(x)+0 — don't-care values under the
            # kernels' pad-masked gradient contract, ops/pallas_conv.py).
            out = _StatsBN(name="bn")(x, train=train, stats=stats, w_true=w_true)
        else:
            out = nn.BatchNorm(
                use_running_average=not train,
                use_scale=False,
                use_bias=False,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        p = 1 if self.padding_mode == "zeros" else 0
        # Channels-major training path: the whole maps -> gamma/beta chain
        # runs as one Pallas pass (ops/pallas_ssm.py) — the NHWC convs on
        # md- and 2C-channel arrays are ~10-100x lane-padded in HBM and the
        # embed output paid a NHWC->NCHW relayout per norm site. The halo
        # raster engine (w_true None) keeps the XLA path and its bit-exact
        # oracle relationships.
        if (
            chw
            and p == 0
            and not self.sn
            and w_true is not None
            and x.shape[2] % 8 == 0
            and maps.shape[1] == x.shape[2] + 4
        ):
            from infinite_texture_gans_tpu.ops.pallas_ssm import ssm_embed_chw_p

            k1, b1 = RawConvParams(self.hidden, name="mlp_shared")(
                maps.shape[-1]
            )
            k2, b2 = RawConvParams(
                2 * c, kernel_init=_ssm_embed_init(self.hidden, c),
                name="embed",
            )(self.hidden)
            m = jnp.transpose(
                jax.lax.stop_gradient(maps), (0, 3, 1, 2)
            ).astype(self.dtype)
            embed = ssm_embed_chw_p(m, k1, b1, k2, b2, w_true, out.shape[3])
            gamma, beta = jnp.split(embed, 2, axis=1)
            return (1 + gamma) * out + beta
        actv = conv3x3(self.hidden, self.sn, padding=p, dtype=self.dtype, name="mlp_shared")(
            maps.astype(jnp.float32), update_sn=update_sn
        )
        actv = _relu_saved_y(actv)
        embed = Conv(
            2 * c,
            3,
            1,
            p,
            True,
            self.sn,
            self.dtype,
            kernel_init=_ssm_embed_init(self.hidden, c),
            name="embed",
        )(actv, update_sn=update_sn)
        if chw:
            embed = jnp.transpose(embed, (0, 3, 1, 2))  # -> (N, 2C, H, W)
            if w_true is not None and embed.shape[3] != out.shape[3]:
                # EDGE-pad (not zeros): under the padded-carry contract the
                # pad columns of a replicate-mode activation must hold the
                # edge value (the conv kernels read column w_true as the
                # right halo) — so modulated pads must equal the modulated
                # edge, i.e. gamma/beta pads replicate their edge column.
                embed = jnp.pad(
                    embed,
                    ((0, 0), (0, 0), (0, 0), (0, out.shape[3] - embed.shape[3])),
                    mode="edge",
                )
            gamma, beta = jnp.split(embed, 2, axis=1)
        else:
            gamma, beta = jnp.split(embed, 2, axis=-1)
        return (1 + gamma) * out + beta


class _StatsBN(nn.Module):
    """Parameter-free BatchNorm on channels-major arrays with the exact
    variable names/updates of ``nn.BatchNorm(use_scale=False,
    use_bias=False)`` so both layout branches share one tree."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x_chw: jnp.ndarray, *, train: bool, stats=None,
        w_true: Optional[int] = None,
    ) -> jnp.ndarray:
        c = x_chw.shape[1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            if stats is not None:  # producer-kernel moments (see BNFold)
                s1, s2, cnt = stats
                m = s1 / cnt
                v = s2 / cnt - jnp.square(m)
            else:
                xf = x_chw.astype(jnp.float32)
                if w_true is not None and w_true != xf.shape[3]:
                    xf = xf[:, :, :, :w_true]  # exclude lane-pad columns
                m = jnp.mean(xf, axis=(0, 2, 3))
                v = jnp.mean(jnp.square(xf), axis=(0, 2, 3)) - jnp.square(m)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * m
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * v
        else:
            m, v = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(v + self.epsilon)
        return ((x_chw - m[None, :, None, None]) * inv[None, :, None, None]).astype(
            x_chw.dtype
        )


class Attention(nn.Module):
    """SAGAN self-attention (reference models/layers.py:236-258), applied
    per patch — patches are batch entries, so there is no cross-patch
    attention. 2x2 max-pool on phi/g keys/values, learnable scalar gamma
    initialized to 0."""

    sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        theta = conv1x1(c // 8, self.sn, dtype=self.dtype, name="theta")(x, update_sn=update_sn)
        phi = conv1x1(c // 8, self.sn, dtype=self.dtype, name="phi")(x, update_sn=update_sn)
        g = conv1x1(c // 2, self.sn, dtype=self.dtype, name="g")(x, update_sn=update_sn)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta = theta.reshape(b, h * w, c // 8)
        phi = phi.reshape(b, (h * w) // 4, c // 8)
        g = g.reshape(b, (h * w) // 4, c // 2)

        beta = jax.nn.softmax(theta @ phi.transpose(0, 2, 1), axis=-1)
        o = (beta @ g).reshape(b, h, w, c // 2)
        o = conv1x1(c, self.sn, dtype=self.dtype, name="o")(o, update_sn=update_sn)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * o + x


class PatchAttention(nn.Module):
    """Attention on a merged grid: split into patches, attend per patch,
    merge back. Pure reshapes around :class:`Attention`."""

    gh: int = 3
    gw: int = 3
    sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        p = grid_to_patches(x, self.gh, self.gw)
        p = Attention(self.sn, self.dtype, name="attn")(p, update_sn=update_sn)
        return patches_to_grid(p, self.gh, self.gw)


class ResBlockGenerator(nn.Module):
    """Pre-activation generator residual block (reference
    models/layers.py:260-322): norm-act-convLP-norm-act-convLP with a 1x1
    shortcut when channels change. Norm is BN or SSM; with SSM the shortcut
    gets its own bn3."""

    in_features: int
    features: int
    type_norm: str = "BN"
    leak: float = 0.0
    sn: bool = False
    padding_mode: str = "local"
    outer_padding: str = "replicate"
    gh: int = 3
    gw: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        maps: Optional[jnp.ndarray] = None,
        halo1: Optional[SiteState] = None,
        halo2: Optional[SiteState] = None,
        pos: Optional[GridPos] = None,
        *,
        train: bool,
        update_sn: bool = False,
        chw: bool = False,
        in_stats=None,
        pad_w_true: Optional[int] = None,
        fuse_up: bool = False,
    ):
        act = activation_fn(self.leak)
        learnable_sc = self.in_features != self.features
        convlp_kw = dict(
            sn=self.sn,
            padding_mode=self.padding_mode,
            outer_padding=self.outer_padding,
            gh=self.gh,
            gw=self.gw,
            dtype=self.dtype,
        )

        if chw:
            # Channels-major Pallas path, gated by the generator to leak=0 /
            # no-SN blocks. BN folds into the conv kernel (per-channel
            # scale/shift); SSM's per-pixel modulation is applied as dense
            # channels-major XLA elementwise work and the conv runs with an
            # identity prenorm on the pre-activated values.
            #
            # Training-mode statistics thread through the Pallas kernels:
            # bn1/bn3 consume ``in_stats`` (the previous block's fused
            # residual-add accumulators — upsample-invariant), bn2 consumes
            # conv1's accumulators, and the block returns its own output
            # stats from the fused shortcut+add kernel. No XLA reduce ever
            # touches the big activations (VERDICT r2 next-#2).
            want = train and halo1 is None
            c_in = x.shape[1]
            ones1 = jnp.ones((c_in,), jnp.float32)
            zeros1 = jnp.zeros((c_in,), jnp.float32)
            if self.type_norm == "SSM":
                a = _relu_saved_y(
                    StochasticSpatialModulation(
                        self.sn, self.padding_mode, dtype=self.dtype, name="bn1"
                    )(x, maps, train=train, update_sn=update_sn, chw=True,
                      stats=in_stats, w_true=pad_w_true)
                )
                r1 = ConvLP(self.features, name="conv1", **convlp_kw)(
                    a, halo1, pos, chw_fold=(ones1, zeros1, False),
                    want_stats=want, pad_w_true=pad_w_true,
                )
                (out, halo1), st1 = (r1[:2], r1[2] if want else None)
                onesf = jnp.ones((self.features,), jnp.float32)
                zerosf = jnp.zeros((self.features,), jnp.float32)
                a2 = _relu_saved_y(
                    StochasticSpatialModulation(
                        self.sn, self.padding_mode, dtype=self.dtype, name="bn2"
                    )(out, maps, train=train, update_sn=update_sn, chw=True,
                      stats=st1, w_true=pad_w_true)
                )
                out, halo2 = ConvLP(self.features, name="conv2", **convlp_kw)(
                    a2, halo2, pos, chw_fold=(onesf, zerosf, False),
                    pad_w_true=pad_w_true,
                )
            elif fuse_up:
                # Subpixel-fused path (BN): x arrives at HALF resolution
                # (pad_w_true = half true width on the padded-carry path,
                # None on the raster halo path). up2 -> bn1 -> relu -> conv1
                # run as ONE half-res kernel (nearest-2x commutes with the
                # per-channel affine and ReLU; ops/pallas_conv.py:
                # upconv3x3_chw_p / chw_upconv_halo_step); the shortcut's
                # conv1x1 also commutes with up2 and runs at half res, its
                # upsample fusing with the residual add (+ output stats when
                # training: upsample2_chw_add_p). Same variable tree as the
                # unfused branch. Training gets `want`; eval (fuse_up='all')
                # runs the same kernels with folded running stats.
                assert pad_w_true is not None or halo1 is not None
                half_w = pad_w_true if pad_w_true is not None else x.shape[3]
                sc1, sh1 = BNFold(name="bn1")(
                    x, train=train, stats=in_stats, w_true=pad_w_true
                )
                r1 = ConvLP(
                    self.features, name="conv1", **convlp_kw
                )(
                    x, halo1, pos, chw_fold=(sc1, sh1, True), want_stats=want,
                    pad_w_true=pad_w_true, fuse_up_w_true=half_w,
                )
                (out, halo1), st1 = (r1[:2], r1[2] if want else None)
                full_w = 2 * pad_w_true if pad_w_true is not None else None
                sc2, sh2 = BNFold(name="bn2")(
                    out, train=train, stats=st1, w_true=full_w
                )
                out, halo2 = ConvLP(self.features, name="conv2", **convlp_kw)(
                    out, halo2, pos, chw_fold=(sc2, sh2, True),
                    pad_w_true=full_w,
                )
                if learnable_sc:
                    k3, b3 = RawConvParams(self.features, 1, name="conv3")(c_in)
                    s_half = (conv1x1_chw_p(x, k3, b3, half_w)
                              if pad_w_true is not None
                              else conv1x1_chw(x, k3, b3))
                else:
                    s_half = x
                fill = "zeros" if self.outer_padding == "constant" else "edge"
                if pad_w_true is None:
                    # raster halo path: unpadded widths; nearest-2x Pallas
                    # upsample + XLA residual add
                    y = out + upsample2_chw(s_half)
                    return y, halo1, halo2, None
                out_up = upsample2_chw_add_p(s_half, out, pad_w_true, fill, want)
                if want:
                    y, s1, s2 = out_up
                    cnt = y.shape[0] * y.shape[2] * full_w
                    return y, halo1, halo2, (s1, s2, cnt)
                return out_up, halo1, halo2, None
            else:
                sc1, sh1 = BNFold(name="bn1")(
                    x, train=train, stats=in_stats, w_true=pad_w_true
                )
                r1 = ConvLP(self.features, name="conv1", **convlp_kw)(
                    x, halo1, pos, chw_fold=(sc1, sh1, True), want_stats=want,
                    pad_w_true=pad_w_true,
                )
                (out, halo1), st1 = (r1[:2], r1[2] if want else None)
                sc2, sh2 = BNFold(name="bn2")(
                    out, train=train, stats=st1, w_true=pad_w_true
                )
                out, halo2 = ConvLP(self.features, name="conv2", **convlp_kw)(
                    out, halo2, pos, chw_fold=(sc2, sh2, True),
                    pad_w_true=pad_w_true,
                )
            sc = x
            if learnable_sc:
                if self.type_norm == "SSM":
                    sc = StochasticSpatialModulation(
                        self.sn, self.padding_mode, dtype=self.dtype, name="bn3"
                    )(sc, maps, train=train, update_sn=update_sn, chw=True,
                      stats=in_stats, w_true=pad_w_true)
                k3, b3 = RawConvParams(self.features, 1, name="conv3")(x.shape[1])
                # shortcut conv + residual add in ONE kernel pass
                if pad_w_true is not None:
                    out_p = conv1x1_chw_add_p(sc, k3, b3, out, pad_w_true, want)
                    if want:
                        y, s1, s2 = out_p
                        cnt = y.shape[0] * y.shape[2] * pad_w_true
                        return y, halo1, halo2, (s1, s2, cnt)
                    return out_p, halo1, halo2, None
                if want:
                    y, s1, s2 = conv1x1_chw_add_stats(sc, k3, b3, out)
                    cnt = y.shape[0] * y.shape[2] * y.shape[3]
                    return y, halo1, halo2, (s1, s2, cnt)
                return conv1x1_chw_add(sc, k3, b3, out), halo1, halo2, None
            return out + sc, halo1, halo2, None

        if self.type_norm == "SSM":
            out = act(
                StochasticSpatialModulation(
                    self.sn, self.padding_mode, dtype=self.dtype, name="bn1"
                )(x, maps, train=train, update_sn=update_sn)
            )
        else:
            out = act(
                nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="bn1"
                )(x)
            )
        out, halo1 = ConvLP(self.features, name="conv1", **convlp_kw)(
            out, halo1, pos, update_sn=update_sn
        )

        if self.type_norm == "SSM":
            out = act(
                StochasticSpatialModulation(
                    self.sn, self.padding_mode, dtype=self.dtype, name="bn2"
                )(out, maps, train=train, update_sn=update_sn)
            )
        else:
            out = act(
                nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="bn2"
                )(out)
            )
        out, halo2 = ConvLP(self.features, name="conv2", **convlp_kw)(
            out, halo2, pos, update_sn=update_sn
        )

        sc = x
        if learnable_sc:
            if self.type_norm == "SSM":
                sc = StochasticSpatialModulation(
                    self.sn, self.padding_mode, dtype=self.dtype, name="bn3"
                )(sc, maps, train=train, update_sn=update_sn)
            sc = conv1x1(self.features, self.sn, dtype=self.dtype, name="conv3")(
                sc, update_sn=update_sn
            )
        return out + sc, halo1, halo2, None


class ResBlockDiscriminator(nn.Module):
    """SNGAN discriminator residual block (reference models/layers.py:325-374)."""

    features: int
    downsample: bool = False
    leak: float = 0.0
    sn: bool = True
    bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True, update_sn: bool = False):
        act = activation_fn(self.leak)
        in_features = x.shape[-1]
        learnable_sc = (in_features != self.features) or self.downsample

        h = x
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = act(h)
        h = conv3x3(self.features, self.sn, dtype=self.dtype, name="conv1")(h, update_sn=update_sn)
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        h = act(h)
        h = conv3x3(self.features, self.sn, dtype=self.dtype, name="conv2")(h, update_sn=update_sn)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        sc = x
        if learnable_sc:
            sc = conv1x1(self.features, self.sn, dtype=self.dtype, name="conv3")(
                sc, update_sn=update_sn
            )
            if self.downsample:
                sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        return h + sc


class OptimizedBlock(nn.Module):
    """Discriminator stem block (reference models/layers.py:376-400)."""

    features: int
    leak: float = 0.0
    sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False):
        act = activation_fn(self.leak)
        h = conv3x3(self.features, self.sn, dtype=self.dtype, name="conv1")(x, update_sn=update_sn)
        h = act(h)
        h = conv3x3(self.features, self.sn, dtype=self.dtype, name="conv2")(h, update_sn=update_sn)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        sc = nn.avg_pool(x, (2, 2), strides=(2, 2))
        sc = conv1x1(self.features, self.sn, dtype=self.dtype, name="conv3")(sc, update_sn=update_sn)
        return h + sc


class InstanceNorm(nn.Module):
    """InstanceNorm2d, affine=False (reference models/discriminators.py:183-185)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)
