"""Discriminators.

PatchDiscriminator is the one actually used by the training pipeline
(reference utils.py:205-207; models/discriminators.py:156-210). The
Res/DC/SN discriminators are part of the reference model zoo
(models/discriminators.py:8-152) and are provided for component parity.
All NHWC.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from infinite_texture_gans_tpu.models.layers import (
    Attention,
    InstanceNorm,
    OptimizedBlock,
    ResBlockDiscriminator,
    activation_fn,
)
from infinite_texture_gans_tpu.ops.conv import Conv, Dense, conv1x1, conv3x3, conv4x4


class StemConv4x4(nn.Module):
    """conv0 of the PatchGAN as a Pallas stem kernel. Declares the exact
    parameter/spectral tree of :class:`ops.conv.Conv` (same checkpoints and
    torch importer); SN math runs on the small weight in XLA, the conv runs
    channels-major on the MXU (ops/pallas_conv.py: conv4x4s2_stem)."""

    features: int
    sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, update_sn: bool = False, chw_in: bool = False
    ) -> jnp.ndarray:
        from infinite_texture_gans_tpu.ops.conv import orthogonal, sn_kernel
        from infinite_texture_gans_tpu.ops.pallas_conv import (
            conv4x4s2_stem,
            conv4x4s2_stem_chw,
        )

        in_ch = x.shape[1] if chw_in else x.shape[-1]
        kernel = self.param(
            "kernel", orthogonal(column_axis=-1), (4, 4, in_ch, self.features)
        )
        if self.sn:
            kernel = sn_kernel(self, kernel, self.features, update_sn)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        stem = conv4x4s2_stem_chw if chw_in else conv4x4s2_stem
        return stem(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )


class PatchDiscriminator(nn.Module):
    """pix2pix-style ~70x70 PatchGAN (reference models/discriminators.py:156-210).

    Fully convolutional: conv k4 s2 (img_ch->base_ch) + LeakyReLU(0.2), then
    n_layers_D-1 convs doubling channels (cap 512), stride 2 except the last
    (stride 1), optional batch/instance norm, final conv k4 s1 -> 1 logit
    map. Works on any input size (the training loop feeds different real /
    fake resolutions, reference train.py:129-148).
    """

    base_ch: int = 64
    n_layers_D: int = 4
    kw: int = 4
    SN: bool = False
    norm_layer: Optional[str] = None  # None | 'batch' | 'instance'
    dtype: Any = jnp.float32
    # 'off' (default) | 'on': channels-major Pallas kernel for the 3-channel
    # k4/s2 conv0 (ops/pallas_conv.py stem section). Measured on v5e at the
    # Exp-1 recipe: the stem kernels run 1.7 ms/step + ~1.1 ms of NCHW
    # boundary relayouts vs ~1.5 ms for XLA's conv0 — a net LOSS, because
    # XLA keeps conv0 inside its fusions while the stem forces kernel
    # boundaries (docs/PERF.md round-3 note). Kept as an option because the
    # kernel is parity-tested and the tradeoff may flip at other shapes.
    stem_pallas: str = "off"

    def _use_stem(self, x: jnp.ndarray) -> bool:
        if self.stem_pallas != "on" or self.kw != 4:
            return False
        return x.shape[-1] == 3 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0

    def _stem_ok_chw(self, x: jnp.ndarray) -> bool:
        return (
            self.kw == 4
            and x.shape[1] == 3
            and x.shape[2] % 2 == 0
            and x.shape[3] % 2 == 0
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = True,
        update_sn: bool = False,
        chw_in: bool = False,
    ) -> jnp.ndarray:
        """``chw_in``: x arrives channels-major (N, C, H, W) — the layout the
        generator's Pallas tail emits for fakes. conv0 then runs the Pallas
        CHW stem so no C=3 NHWC image/grad ever materializes at the G<->D
        boundary (docs/PERF.md round 3); the parameter tree is identical to
        the NHWC path (StemConv4x4 declares the same names)."""
        conv = conv4x4 if self.kw == 4 else conv3x3
        lrelu = activation_fn(0.2)

        if chw_in and not self._stem_ok_chw(x):
            # incompatible geometry (img_ch != 3 / odd size / kw != 4):
            # fall back to the ordinary NHWC path via one transpose
            x = jnp.transpose(x, (0, 2, 3, 1))
            chw_in = False

        if chw_in:
            h = StemConv4x4(
                self.base_ch, sn=self.SN, dtype=self.dtype, name="conv0"
            )(x, update_sn=update_sn, chw_in=True)
        elif self._use_stem(x):
            h = StemConv4x4(
                self.base_ch, sn=self.SN, dtype=self.dtype, name="conv0"
            )(x, update_sn=update_sn)
        else:
            h = conv(self.base_ch, self.SN, strides=2, dtype=self.dtype, name="conv0")(
                x, update_sn=update_sn
            )
        h = lrelu(h)
        nf = self.base_ch
        for n in range(1, self.n_layers_D):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers_D - 1 else 2
            h = conv(nf, self.SN, strides=stride, dtype=self.dtype, name=f"conv{n}")(
                h, update_sn=update_sn
            )
            if self.norm_layer == "batch":
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"norm{n}",
                )(h)
            elif self.norm_layer == "instance":
                h = InstanceNorm(name=f"norm{n}")(h)
            h = lrelu(h)
        h = conv(1, self.SN, strides=1, dtype=self.dtype, name="conv_out")(
            h, update_sn=update_sn
        )
        return h


class ResDiscriminator(nn.Module):
    """SNGAN residual discriminator with class-conditioning options
    (reference models/discriminators.py:8-90). Not constructed by the
    default pipeline (only patch_GAN is); provided for model-zoo parity."""

    base_ch: int = 32
    n_classes: int = 0
    leak: float = 0.0
    att: bool = False
    cond_method: str = "concat"
    SN: bool = True
    SN_y: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        update_sn: bool = False,
    ) -> jnp.ndarray:
        act = activation_fn(self.leak)
        ch = self.base_ch
        h = OptimizedBlock(ch, self.leak, self.SN, self.dtype, name="block1")(
            x, update_sn=update_sn
        )
        if self.att:
            h = Attention(self.SN, self.dtype, name="attention")(h, update_sn=update_sn)
        h = ResBlockDiscriminator(
            ch * 2, downsample=True, leak=self.leak, sn=self.SN, dtype=self.dtype, name="block2"
        )(h, train=train, update_sn=update_sn)

        ch3 = ch * 2 if (self.n_classes > 0 and self.cond_method == "concat") else ch * 4
        h = ResBlockDiscriminator(
            ch3, downsample=True, leak=self.leak, sn=self.SN, dtype=self.dtype, name="block3"
        )(h, train=train, update_sn=update_sn)
        if y is not None and self.cond_method == "concat":
            h_y = Dense(ch * 2 * 8 * 8, sn=self.SN_y, dtype=self.dtype, name="embed_y")(
                y, update_sn=update_sn
            )
            h_y = h_y.reshape(-1, 8, 8, ch * 2)
            h = jnp.concatenate([h, h_y], axis=-1)

        ch4 = ch * 4 if (self.n_classes > 0 and self.cond_method != "proj") else ch * 8
        h = ResBlockDiscriminator(
            ch4, downsample=True, leak=self.leak, sn=self.SN, dtype=self.dtype, name="block4"
        )(h, train=train, update_sn=update_sn)
        if y is not None and "conv" in self.cond_method:
            w = h.shape[1]
            y_map = y.reshape(-1, w, w, 1)
            conv_embed = conv1x1 if self.cond_method == "conv1x1" else conv3x3
            h_y = conv_embed(ch * 4, self.SN_y, dtype=self.dtype, name="embed_y")(
                y_map, update_sn=update_sn
            )
            h = jnp.concatenate([h, h_y], axis=-1)
        h = ResBlockDiscriminator(
            ch * 16, downsample=False, leak=self.leak, sn=self.SN, dtype=self.dtype, name="block5"
        )(h, train=train, update_sn=update_sn)
        h = act(h)
        h = h.sum(axis=(1, 2))
        out = Dense(1, sn=self.SN, dtype=self.dtype, name="fc")(h, update_sn=update_sn)
        if y is not None and self.cond_method == "proj":
            e = Dense(ch * 16, sn=self.SN_y, dtype=self.dtype, name="embed_y")(
                y, update_sn=update_sn
            )
            out = out + (e * h).sum(axis=1, keepdims=True)
        return out


class DCDiscriminator(nn.Module):
    """DCGAN discriminator (reference models/discriminators.py:93-115)."""

    base_ch: int = 64
    n_layers: int = 3
    img_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True, update_sn: bool = False):
        lrelu = activation_fn(0.2)
        h = conv4x4(self.base_ch, use_bias=False, dtype=self.dtype, name="conv0")(x)
        h = lrelu(h)
        ch = self.base_ch
        for n in range(self.n_layers):
            ch = ch * 2
            h = conv4x4(ch, use_bias=False, dtype=self.dtype, name=f"conv{n + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name=f"bn{n + 1}")(h)
            h = lrelu(h)
        h = Conv(self.img_ch, 4, 1, 0, False, dtype=self.dtype, name="final")(h)
        return h.reshape(-1)


class SNDiscriminator(nn.Module):
    """Plain SNGAN discriminator (reference models/discriminators.py:120-152).
    Expects 64x64 inputs (fc over an 8x8 map)."""

    base_ch: int = 64
    leak: float = 0.1
    SN: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False):
        lrelu = activation_fn(self.leak)
        ch = self.base_ch
        m = x
        for i, (conv, f) in enumerate(
            [
                (conv3x3, ch),
                (conv4x4, ch),
                (conv3x3, ch * 2),
                (conv4x4, ch * 2),
                (conv3x3, ch * 4),
                (conv4x4, ch * 4),
                (conv3x3, ch * 8),
            ]
        ):
            m = conv(f, self.SN, dtype=self.dtype, name=f"conv{i + 1}")(m, update_sn=update_sn)
            m = lrelu(m)
        m = m.reshape(m.shape[0], -1)
        return Dense(1, sn=self.SN, dtype=self.dtype, name="fc")(m, update_sn=update_sn)
