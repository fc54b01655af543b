"""ResidualPatchGenerator — the flagship model.

Equivalent of reference models/generators.py:4-124, re-designed for TPU:
activations stay in merged grid layout (N, gh*H, gw*W, C) end to end, so the
stack is a chain of large NHWC convolutions (MXU) with nearest upsampling and
(optionally) one per-patch self-attention. 'local' padding in training mode
is a single edge-pad per conv; at stateful inference each ConvLP site threads
an explicit halo cache (see ops/padding.py).

Stack (reference models/generators.py:59-122): start conv (z_dim -> 8*G_ch)
-> block1 (8G->8G) -> up -> block2 (8G->4G) -> up -> block3 (4G->2G)
-> [attention] -> up -> block4 (2G->G) -> [n>=5: up -> block5 (G->G/2)]
-> [n==6: up -> block6 (G/2->G/4)] -> BN -> act -> final conv (->img_ch)
-> tanh. Output patch resolution = 2^(n_layers_G-1) * base_res.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_chw(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample on channels-major (N, C, H, W) arrays.

    Pallas kernel (ops/pallas_conv.py: upsample2_chw): XLA's repeat fusion
    prefers non-default layouts, forcing a pair of relayout copies around
    every adjacent Pallas conv; the kernel pins default layouts on both
    sides and its backward is the exact 2x2 pair-sum transpose."""
    if factor != 2:
        return jnp.repeat(jnp.repeat(x, factor, axis=2), factor, axis=3)
    from infinite_texture_gans_tpu.ops.pallas_conv import upsample2_chw

    return upsample2_chw(x)

from infinite_texture_gans_tpu.models.layers import (
    ConvLP,
    PatchAttention,
    ResBlockGenerator,
    activation_fn,
)
from infinite_texture_gans_tpu.ops.padding import GridPos, SiteSpec, SiteState


def generator_channel_plan(G_ch: int, n_layers_G: int) -> List[tuple[int, int]]:
    """(in_ch, out_ch) per residual block, reference models/generators.py:61-75."""
    plan = [
        (G_ch * 8, G_ch * 8),
        (G_ch * 8, G_ch * 4),
        (G_ch * 4, G_ch * 2),
        (G_ch * 2, G_ch),
    ]
    if n_layers_G >= 5:
        plan.append((G_ch, G_ch // 2))
    if n_layers_G == 6:
        plan.append((G_ch // 2, G_ch // 4))
    return plan


def generator_site_specs(
    G_ch: int = 52, base_res: int = 4, n_layers_G: int = 6, img_ch: int = 3,
    fused_blocks: frozenset = frozenset(),
) -> List[SiteSpec]:
    """Halo site inventory for stateful inference, in forward-call order.

    One site per local-padded conv: two per residual block plus the final
    conv. The start conv has no site (z arrives pre-padded with real values,
    reference models/layers.py:163-166). Blocks in ``fused_blocks`` run the
    subpixel-fused up-conv at eval (fuse_up='all'): their conv1 halo is
    cached at HALF resolution (ops/pallas_conv.py: chw_upconv_halo_step).
    """
    del img_ch
    specs: List[SiteSpec] = []
    plan = generator_channel_plan(G_ch, n_layers_G)
    for i, (cin, cout) in enumerate(plan, start=1):
        res = base_res * (2 ** (i - 1))
        res1 = res // 2 if i in fused_blocks else res
        specs.append(SiteSpec(f"block{i}.conv1", res1, cin))
        specs.append(SiteSpec(f"block{i}.conv2", res, cout))
    final_res = base_res * (2 ** (n_layers_G - 1))
    final_chin = plan[-1][1]
    specs.append(SiteSpec("final", final_res, final_chin))
    return specs


class ResidualPatchGenerator(nn.Module):
    """See module docstring. Defaults match reference utils.py:41-70.

    Inputs (local mode): z merged (N, gh*base_res+2, gw*base_res+2, z_dim);
    maps (SSM only) a list of n_layers_G merged maps, maps[i] of shape
    (N, gh*r+4, gw*r+4, map_dim) with r = 2^i * base_res.
    Inputs (zeros mode): z (N, base_res, base_res, z_dim); maps[i] at
    (N, r, r, map_dim).

    Returns (merged image (N, gh*P, gw*P, img_ch) in [-1, 1], halo dict or
    None). ``halo``/``pos`` are only passed during stateful patch-by-patch
    inference.
    """

    z_dim: int = 128
    G_ch: int = 52
    base_res: int = 4
    n_layers_G: int = 6
    attention: bool = True
    img_ch: int = 3
    leak: float = 0.0
    SN: bool = False
    type_norm: str = "BN"
    map_dim: int = 1
    padding_mode: str = "local"
    outer_padding: str = "replicate"
    num_patches_h: int = 3
    num_patches_w: int = 3
    padding_size: int = 1
    conv_reduction: int = 2
    dtype: Any = jnp.float32
    # 'auto' (channels-major Pallas tail on TPU where it applies) | 'on' |
    # 'off'. See ops/pallas_conv.py for why small-channel layers are run
    # channels-major.
    chw_tail: str = "auto"
    # 'auto' | 'all' | 'off': subpixel-fused upsample+conv1 inside the
    # chw-tail ResBlocks (ops/pallas_conv.py: upconv3x3_chw_p). 'auto' fuses
    # the TRAINING path only (BN mode, halo-free) — the fused 2x2 combined
    # kernels regroup float additions, so eval/one-pass/halo engines keep
    # the unfused kernels and their bit-exact oracle relationships
    # (tests/test_halo.py). 'all' additionally fuses EVAL, including the
    # stateful raster engine (half-res halo sites, chw_upconv_halo_step) —
    # output differs from the unfused engine at float-regrouping scale.
    fuse_up: str = "auto"

    def _chw_gate(self, i: int, cin: int, wide: bool = False) -> bool:
        """THE layout-decision predicate: block ``i`` (input channels
        ``cin``) runs on the channels-major Pallas tail iff this is True.
        Shared by ``__call__`` and :meth:`emits_chw` so the train step's
        wire choice can never disagree with what the forward actually does.
        ``i > 3``: per-patch attention (after block3) needs NHWC.

        ``wide`` (eval engines, i.e. ``not train``): the tail extends to
        cin <= 128. The round-5 canvas trace audit found the batch-1 XLA
        NHWC convolution of the first over-64-channel tail block (flagship
        block4: bf16[1,96,96,52] = conv(104->52)) to be the single largest
        op of the 4096² dispatch (31.6 of 195 ms fused) — at batch-1 the
        MXU idles either way and W-lane density wins. TRAINING keeps the
        measured cin <= 64 boundary: on the large merged training batches
        XLA NHWC runs that same conv near peak (104 pads to 128 lanes,
        only 1.23× waste), and the round-2/3 A/Bs chose 64 there."""
        capable = (
            self.padding_mode == "local"
            and not self.SN
            and self.leak == 0
            and self.chw_tail != "off"
        )
        if not capable or i <= 3 or cin > (128 if wide else 64):
            return False
        return self.chw_tail == "on" or jax.default_backend() == "tpu"

    def eval_fuse_blocks(self) -> frozenset:
        """Blocks whose upsample->BN->ReLU->conv1 runs subpixel-FUSED at
        eval (``fuse_up='all'``) — determines which conv1 halo sites are
        cached at half resolution. Mirrors the ``fuse`` gate in
        ``__call__`` so ``site_specs`` can never disagree with the forward.
        """
        if self.fuse_up != "all" or self.type_norm != "BN":
            return frozenset()
        plan = generator_channel_plan(self.G_ch, self.n_layers_G)
        fused, is_chw = set(), False
        for i, (cin, _) in enumerate(plan, start=1):
            # eval-only by definition -> the WIDE gate, matching what the
            # eval forward actually runs (round 5: the flagship's block4
            # joins the tail at eval, so its conv1 fuses too)
            is_chw = is_chw or self._chw_gate(i, cin, wide=True)
            if is_chw and i > 1:
                fused.add(i)
        return frozenset(fused)

    def emits_chw(self) -> bool:
        """True when the channels-major Pallas tail will run, i.e. when
        ``__call__(out_chw=True)`` returns the fake image channels-major
        with NO transpose anywhere (the train step uses this to decide the
        G->D image wire; see ops/pallas_conv.py: conv4x4s2_stem_chw)."""
        plan = generator_channel_plan(self.G_ch, self.n_layers_G)
        return any(
            self._chw_gate(i, cin) for i, (cin, _) in enumerate(plan, start=1)
        )

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        maps: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        *,
        train: bool = False,
        halo: Optional[Dict[str, SiteState]] = None,
        pos: Optional[GridPos] = None,
        update_sn: bool = False,
        out_chw: bool = False,
    ):
        if maps is None:
            maps = [None] * self.n_layers_G
        act = activation_fn(self.leak)
        gh, gw = self.num_patches_h, self.num_patches_w
        halo_out: Dict[str, SiteState] = {}

        def site(name):
            return halo.get(name) if halo is not None else None

        local = self.padding_mode == "local"
        # start conv: in local mode z is pre-padded by build_z; valid conv.
        h, _ = ConvLP(
            self.G_ch * 8,
            sn=self.SN,
            padding_mode=self.padding_mode,
            outer_padding=self.outer_padding,
            pre_padded=local,
            gh=gh,
            gw=gw,
            dtype=self.dtype,
            name="start",
        )(z, update_sn=update_sn)

        plan = generator_channel_plan(self.G_ch, self.n_layers_G)
        from infinite_texture_gans_tpu.ops.grid import upsample_nearest

        # Channels-major (Pallas) tail: once a local-padded BN/ReLU block's
        # channel count is small and its merged width is lane-aligned, run
        # the rest of the stack on (N, C, H, W) arrays — NHWC would store
        # them ~10x padded in HBM (ops/pallas_conv.py). Monotone: channels
        # only shrink and widths only grow down the stack. The gate itself
        # lives on the module (``_chw_gate``) so ``emits_chw`` stays in
        # sync; eval engines take the WIDE gate (cin <= 128, see there).
        chw_gate = lambda i, cin: self._chw_gate(i, cin, wide=not train)

        is_chw = False
        cur_stats = None  # producer-kernel BN moments threaded block to block
        want_stats = train and halo is None
        # Padded-carry (ops/pallas_conv.py): in the chw tail, activations
        # flow between kernels at physical lane-padded width so no XLA
        # pad/slice fusion (or its relayout copies) sits between Pallas
        # calls. SSM's XLA elementwise modulation rides along: its
        # gamma/beta are EDGE-padded out to the physical width (the pad
        # columns of a replicate-mode activation are load-bearing — the
        # kernels read column w_true as the right halo, so the modulated
        # pads must equal the modulated edge; see layers.py) and its
        # moments exclude the pad columns (StochasticSpatialModulation
        # w_true). The raster halo engine stays on the unpadded path.
        pad_carry = halo is None
        w_true = None
        eval_fuse = self.eval_fuse_blocks()
        for i, (cin, cout) in enumerate(plan, start=1):
            if not is_chw and chw_gate(i, cin):
                if want_stats:
                    # entry stats for the first chw block's bn1, computed in
                    # the NHWC layout where the reduce is lane-natural (the
                    # following nearest-2x upsample preserves mean / E[x^2])
                    hf = h.astype(jnp.float32)
                    s1 = jnp.sum(hf, axis=(0, 1, 2))
                    s2 = jnp.sum(jnp.square(hf), axis=(0, 1, 2))
                    cur_stats = (s1, s2, h.shape[0] * h.shape[1] * h.shape[2])
                h = jnp.transpose(h, (0, 3, 1, 2))
                is_chw = True
                if pad_carry:
                    from infinite_texture_gans_tpu.ops.pallas_conv import _pad_w_lanes

                    w_true = h.shape[3]
                    h = _pad_w_lanes(
                        h, "zeros" if self.outer_padding == "constant" else "edge"
                    )
            # Subpixel fusion: the block's upsample -> BN -> ReLU -> conv1
            # collapses into ONE half-resolution Pallas kernel (see fuse_up
            # attr); the shortcut's conv1x1 commutes with nearest-2x and its
            # upsample fuses with the residual add. Training under
            # 'auto'/'all'; eval (one-pass AND raster halo) under 'all'.
            fuse = (
                is_chw
                and i > 1
                and self.type_norm == "BN"
                and self.fuse_up != "off"
                and (
                    (want_stats and w_true is not None)
                    or (
                        not train
                        and i in eval_fuse
                        and (halo is not None or w_true is not None)
                    )
                )
            )
            if i > 1 and not fuse:
                if is_chw and w_true is not None:
                    from infinite_texture_gans_tpu.ops.pallas_conv import upsample2_chw_p

                    fill = "zeros" if self.outer_padding == "constant" else "edge"
                    h = upsample2_chw_p(h, w_true, fill)
                    w_true *= 2
                else:
                    h = _upsample_nearest_chw(h, 2) if is_chw else upsample_nearest(h, 2)
            bname = f"block{i}"
            h1 = site(f"{bname}.conv1")
            h2 = site(f"{bname}.conv2")
            h, h1, h2, out_stats = ResBlockGenerator(
                in_features=cin,
                features=cout,
                type_norm=self.type_norm,
                leak=self.leak,
                sn=self.SN,
                padding_mode=self.padding_mode,
                outer_padding=self.outer_padding,
                gh=gh,
                gw=gw,
                dtype=self.dtype,
                name=bname,
            )(
                h, maps[i - 1], h1, h2, pos,
                train=train, update_sn=update_sn, chw=is_chw,
                in_stats=cur_stats if is_chw else None,
                pad_w_true=w_true,
                fuse_up=fuse,
            )
            if fuse and w_true is not None:
                w_true *= 2  # the block upsampled internally
            cur_stats = out_stats if is_chw else None
            if halo is not None:
                halo_out[f"{bname}.conv1"] = h1
                halo_out[f"{bname}.conv2"] = h2
            if i == 3 and self.attention:
                # Per-patch self-attention after block3
                # (reference models/generators.py:101-102).
                if local:
                    h = PatchAttention(gh, gw, self.SN, self.dtype, name="attention")(
                        h, update_sn=update_sn
                    )
                else:
                    h = PatchAttention(1, 1, self.SN, self.dtype, name="attention")(
                        h, update_sn=update_sn
                    )

        if is_chw:
            from infinite_texture_gans_tpu.models.layers import BNFold

            if self.type_norm == "BN":
                scf, shf = BNFold(name="bn")(
                    h, train=train, stats=cur_stats, w_true=w_true
                )
                fold = (scf, shf, True)
            else:
                # SSM mode has no final norm: plain activation before the conv
                h = act(h)
                cf = h.shape[1]
                fold = (jnp.ones((cf,), jnp.float32), jnp.zeros((cf,), jnp.float32), False)
            h, hf = ConvLP(
                self.img_ch,
                sn=self.SN,
                padding_mode=self.padding_mode,
                outer_padding=self.outer_padding,
                gh=gh,
                gw=gw,
                dtype=self.dtype,
                name="final",
            )(h, site("final"), pos, chw_fold=fold, pad_w_true=w_true)
            if halo is not None:
                halo_out["final"] = hf
            if w_true is not None and h.shape[3] != w_true:
                h = h[..., :w_true]  # drop the padded-carry lanes once
            if out_chw:
                # channels-major image wire: the consumer (the D's Pallas
                # stem, train_step) takes (N, C, H, W) directly — no C=3
                # NHWC relayout at the G<->D boundary
                return jnp.tanh(h), (halo_out if halo is not None else None)
            # tanh AFTER the transpose: XLA fuses it into the relayout copy
            # instead of materializing a CHW tanh + two layout round-trips
            out = jnp.tanh(jnp.transpose(h, (0, 2, 3, 1)))
            return out, (halo_out if halo is not None else None)

        if self.type_norm == "BN":
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn"
            )(h)
        h = act(h)
        h, hf = ConvLP(
            self.img_ch,
            sn=self.SN,
            padding_mode=self.padding_mode,
            outer_padding=self.outer_padding,
            gh=gh,
            gw=gw,
            dtype=self.dtype,
            name="final",
        )(h, site("final"), pos, update_sn=update_sn)
        if halo is not None:
            halo_out["final"] = hf
        out = jnp.tanh(h)
        if out_chw:  # honor the layout contract even off the Pallas tail
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out, (halo_out if halo is not None else None)

    @property
    def patch_resolution(self) -> int:
        return (2 ** (self.n_layers_G - 1)) * self.base_res

    def site_specs(self) -> List[SiteSpec]:
        return generator_site_specs(
            self.G_ch, self.base_res, self.n_layers_G, self.img_ch,
            fused_blocks=self.eval_fuse_blocks(),
        )
