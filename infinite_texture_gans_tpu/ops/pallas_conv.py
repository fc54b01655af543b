"""Pallas TPU kernels: fused (scale·x+shift) -> ReLU -> local-pad -> 3x3 conv
for SMALL-CHANNEL layers, on channels-major (N, C, H, W) activations.

Why this exists (measured, see benchmarks/): the generator's largest
activations have tiny channel counts (C=13/26 at 384^2 for the Exp-1 recipe).
XLA stores NHWC arrays with C in the 128-lane dimension, so those arrays are
physically ~10x padded in HBM and every op touching them runs at ~34 GB/s
effective (device-trace numbers). XLA's layout assignment cannot be steered
from JAX — logical NCHW gets relaid out the same way. Pallas is the one
place we control physical layout: these kernels keep W (lane-dense, e.g.
384 = 3x128) as the minor dimension end to end and fold the whole BN-apply +
activation + local-padding + conv chain into one VMEM pass.

Layout contract: x (N, C, H, W) with W a multiple of 128 preferred; H % BH
== 0 (wrapper picks BH). The 3x3 conv is computed as ONE MXU matmul per
block: the nine shifted taps are stacked on the sublane axis -> (9C, BH*W),
then (Co, 9C) @ (9C, BH*W). Column halos are lane shifts built in-kernel.
Row halos arrive as two extra blocked inputs (top/bottom neighbor rows,
extracted by cheap strided slices on the dense array in XLA) — Mosaic cannot
DMA sublane-unaligned slices of tiled HBM memrefs, so no manual DMA is used.

Backward (custom_vjp):
  dx  = same kernel structure with spatially-flipped, C<->Co-transposed
        weights in zero-halo mode (transposed conv interior), plus cheap XLA
        edge-strip corrections that fold halo gradients back into border
        pixels for 'replicate' outer padding;
  dW  = second Pallas kernel accumulating (Co, 9C) += g·stacked(x)^T across
        all grid blocks;
  db, d(scale), d(shift) = XLA reductions on lane-dense arrays.

Reference semantics being fused (SURVEY.md §2.1): models/layers.py:8-36
conv2d_lp + the norm/act that precede it in every ResBlockGenerator branch
(models/layers.py:301-311).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h: int, w: int, c: int, dtype_bytes: int) -> int:
    """Rows per block: target a few MB of VMEM for the stacked tap matrix
    (9C x BH*W). Must divide H and be a multiple of 8 (Mosaic requires the
    second-minor block dim divisible by 8 or equal to the array dim)."""
    budget = 4 * 1024 * 1024
    want = max(8, budget // max(1, 9 * c * w * dtype_bytes))
    cands = [d for d in range(8, h + 1, 8) if h % d == 0]
    if not cands:
        return h  # whole-H block (equal-dim rule)
    fit = [d for d in cands if d <= want]
    return fit[-1] if fit else cands[0]



def _pad_w_lanes(x: jnp.ndarray, fill: str) -> jnp.ndarray:
    """Lane-pad the minor W dim to a multiple of 128 (Mosaic's in-kernel
    (C,BH,W)->(C,BH*W) collapse requires it). 'edge' fill keeps replicate
    column-halo semantics at the true right border; 'zeros' keeps zero-halo
    semantics; padded output columns are sliced off by the caller."""
    w = x.shape[-1]
    pad = (-w) % 128
    if pad == 0:
        return x
    if fill == "edge":
        tail = jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))
        return jnp.concatenate([x, tail], axis=-1)
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _halo_rows(x: jnp.ndarray, bh: int):
    """Top/bottom neighbor rows per H-block, replicate semantics at the
    canvas border. x (N, C, H, W) -> tops/bots (N, nt, C, W) — the block
    (1, 1, C, W) then matches full array dims as Mosaic block rules require."""
    n, c, h, w = x.shape
    tops = jnp.concatenate([x[:, :, :1, :], x[:, :, bh - 1 : h - 1 : bh, :]], axis=2)
    bots = jnp.concatenate([x[:, :, bh::bh, :], x[:, :, h - 1 :, :]], axis=2)
    return jnp.swapaxes(tops, 1, 2), jnp.swapaxes(bots, 1, 2)


def _prenorm_and_shifts(xb, top, bot, sc_ref, sh_ref, relu, zeros_mode, t, nt, bh,
                        w_true):
    """Assemble the (C, BH+2, W) slab from the block + halo rows, apply the
    fused scale/shift (+ReLU), fix halo values for zero outer padding, and
    return the three column-shifted variants. top/bot arrive as (C, W)."""
    x = jnp.concatenate([top[:, None, :], xb, bot[:, None, :]], axis=1)  # (C, BH+2, W)
    x = x * sc_ref[:, :, :] + sh_ref[:, :, :]  # scale/shift arrive (C, 1, W)
    if relu:
        x = jnp.maximum(x, 0.0)
    if zeros_mode:
        # canvas-border halo rows must be zero POST-norm
        row = lax.broadcasted_iota(jnp.int32, (1, bh + 2, 1), 1)
        top_m = jnp.logical_and(row == 0, t == 0)
        bot_m = jnp.logical_and(row == bh + 1, t == nt - 1)
        x = jnp.where(jnp.logical_or(top_m, bot_m), 0.0, x).astype(x.dtype)
        if w_true != x.shape[2]:
            # lane-padded columns beyond the true width must also be zero
            # POST-norm (they are the true right edge's halo source)
            col = lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[2]), 2)
            x = jnp.where(col >= w_true, 0.0, x).astype(x.dtype)

    first_col = x[:, :, :1]
    last_col = x[:, :, -1:]
    if zeros_mode:
        first_col = jnp.zeros_like(first_col)
        last_col = jnp.zeros_like(last_col)
    left = jnp.concatenate([first_col, x[:, :, :-1]], axis=2)   # tap dx=0 (w-1)
    right = jnp.concatenate([x[:, :, 1:], last_col], axis=2)    # tap dx=2 (w+1)
    return left, x, right


def _prenorm_and_stack(xb, top, bot, sc_ref, sh_ref, relu, zeros_mode, t, nt, bh,
                       w_true):
    """(9C, BH*W) stacked tap matrix — requires W % 128 == 0 for the
    in-kernel lane-merge reshape (Mosaic restriction)."""
    left, x, right = _prenorm_and_shifts(
        xb, top, bot, sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true
    )
    c = x.shape[0]
    w = x.shape[2]
    parts = []
    for dy in range(3):
        for sh_x in (left, x, right):
            parts.append(sh_x[:, dy : dy + bh, :].reshape(c, bh * w))
    return jnp.concatenate(parts, axis=0)  # (9C, BH*W)


def _conv_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int):
    """Forward kernel factory. Grid (N, H/BH). Requires W % 128 == 0 (the
    wrapper lane-pads other widths; ``w_true`` is the unpadded width)."""

    def kernel(x_ref, top_ref, bot_ref, w9_ref, b_ref, sc_ref, sh_ref, y_ref):
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = x_ref.shape[3]
        stacked = _prenorm_and_stack(
            x_ref[0], top_ref[0, 0], bot_ref[0, 0], sc_ref, sh_ref,
            relu, zeros_mode, t, nt, bh, w_true,
        )
        y = lax.dot_general(
            w9_ref[:, :], stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[:, :]
        y_ref[0, :, :, :] = y.reshape(-1, bh, w).astype(y_ref.dtype)

    return kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("relu", "outer_padding"))
def _conv3x3_chw_fwd(x, w9, b, scale, shift, *, relu: bool, outer_padding: str):
    w_true = x.shape[3]
    x = _pad_w_lanes(x, "zeros" if outer_padding == "constant" else "edge")
    if x.shape[3] != w_true and scale.shape[-1] == w_true:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, c, h, w = x.shape
    co = w9.shape[0]
    bh = _pick_bh(h, w, c, x.dtype.itemsize)
    tops, bots = _halo_rows(x, bh)
    kernel = _conv_kernel(relu, outer_padding == "constant", bh, w_true)
    return pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, w), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, w), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 9 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, co, h, w), x.dtype),
        interpret=_interpret(),
    )(x, tops, bots, w9, b, scale, shift)[..., :w_true]


def _dw_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int):
    """dW kernel: (Co, 9C) += g_block (Co, BH*W) @ stacked(x)^T, accumulated
    across every grid block (TPU grid is sequential; the output block has a
    constant index so it lives in VMEM for the whole grid)."""

    def kernel(x_ref, top_ref, bot_ref, g_ref, sc_ref, sh_ref, dw_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = x_ref.shape[3]
        stacked = _prenorm_and_stack(
            x_ref[0], top_ref[0, 0], bot_ref[0, 0], sc_ref, sh_ref,
            relu, zeros_mode, t, nt, bh, w_true,
        )
        g = g_ref[0, :, :, :].reshape(-1, bh * w)  # (Co, BH*W)
        acc = lax.dot_general(
            g, stacked, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Co, 9C)

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("relu", "outer_padding", "co"))
def _conv3x3_chw_dw(x, g, scale, shift, *, relu: bool, outer_padding: str, co: int):
    w_true = x.shape[3]
    x = _pad_w_lanes(x, "zeros" if outer_padding == "constant" else "edge")
    if x.shape[3] != w_true:
        g = _pad_w_lanes(g, "zeros")  # zero grads in pad columns -> no dW leak
        if scale.shape[-1] == w_true:
            scale = _pad_w_lanes(scale, "edge")
            shift = _pad_w_lanes(shift, "edge")
    n, c, h, w = x.shape
    bh = _pick_bh(h, w, c, x.dtype.itemsize)
    tops, bots = _halo_rows(x, bh)
    kernel = _dw_kernel(relu, outer_padding == "constant", bh, w_true)
    return pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, w), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, w), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co, 9 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, 9 * c), jnp.float32),
        interpret=_interpret(),
    )(x, tops, bots, g, scale, shift)


def _pack_w9(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,Co) kernel -> (Co, 9C) matching the kernel's tap stacking order
    (dy major, dx minor, then channel)."""
    co = w.shape[-1]
    return jnp.transpose(w.reshape(-1, co), (1, 0))  # (Co, 9C)


def _flip_transpose_w(w: jnp.ndarray) -> jnp.ndarray:
    """Weights for the transposed conv: flip both spatial taps, swap C/Co."""
    return jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv3x3_chw(x, w, b, scale, shift, relu: bool = True,
                outer_padding: str = "replicate"):
    """y = conv3x3(localpad(act(scale*x + shift))) on (N, C, H, W) arrays.

    scale/shift are per-channel (C,) (a folded BatchNorm apply); set
    scale=ones, shift=zeros, relu=False for a plain padded conv. NOTE:
    relu/outer_padding are nondiff positional args — pass them positionally
    when differentiating.
    """
    return _fwd_impl(x, w, b, scale, shift, relu, outer_padding)


def _fwd_impl(x, w, b, scale, shift, relu, outer_padding):
    c, co = w.shape[2], w.shape[3]
    w9 = _pack_w9(w).astype(x.dtype)
    w_ = x.shape[3]
    sc = jnp.broadcast_to(scale.reshape(c, 1, 1), (c, 1, w_)).astype(x.dtype)
    sh = jnp.broadcast_to(shift.reshape(c, 1, 1), (c, 1, w_)).astype(x.dtype)
    return _conv3x3_chw_fwd(
        x, w9, b.reshape(co, 1).astype(x.dtype), sc, sh,
        relu=relu, outer_padding=outer_padding,
    )


def _fwd_rule(x, w, b, scale, shift, relu, outer_padding):
    y = _fwd_impl(x, w, b, scale, shift, relu, outer_padding)
    return y, (x, w, b, scale, shift)


def _edge_strip_corrections(g, w, zeros_mode: bool):
    """XLA-side fold of halo gradients into border pixels for 'replicate'
    forward padding. g: (N, Co, H, W); returns additive border updates.

    dxp[c,i,0]   = sum_{dy,o} K[dy,0,c,o] g[o,i-dy,0]   (left halo column)
    and symmetric for right/top/bottom; corners single-tap."""
    if zeros_mode:
        return None
    n, co, h, wdt = g.shape
    k = w  # (3,3,C,Co)

    def col_fold(gcol, ktap):  # gcol (N, Co, H), ktap (3, C, Co)
        gpad = jnp.pad(gcol, ((0, 0), (0, 0), (1, 1)))
        outs = 0
        for dy in range(3):
            seg = lax.dynamic_slice_in_dim(gpad, 2 - dy, h, axis=2)
            outs = outs + jnp.einsum("co,noh->nch", ktap[dy], seg)
        return outs  # (N, C, H)

    left = col_fold(g[:, :, :, 0], k[:, 0])      # add to x[:, :, :, 0]
    right = col_fold(g[:, :, :, -1], k[:, 2])    # add to x[:, :, :, -1]

    def row_fold(grow, ktap):  # grow (N, Co, W), ktap (3 over dx) (C, Co)
        gpad = jnp.pad(grow, ((0, 0), (0, 0), (1, 1)))
        outs = 0
        for dx in range(3):
            seg = lax.dynamic_slice_in_dim(gpad, 2 - dx, wdt, axis=2)
            outs = outs + jnp.einsum("co,now->ncw", ktap[dx], seg)
        return outs  # (N, C, W)

    top = row_fold(g[:, :, 0, :], k[0])          # add to x[:, :, 0, :]
    bottom = row_fold(g[:, :, -1, :], k[2])      # add to x[:, :, -1, :]

    # corners: xp[0,0] = x[0,0] etc. (replicate corner), single tap each
    c00 = jnp.einsum("co,no->nc", k[0, 0], g[:, :, 0, 0])
    c01 = jnp.einsum("co,no->nc", k[0, 2], g[:, :, 0, -1])
    c10 = jnp.einsum("co,no->nc", k[2, 0], g[:, :, -1, 0])
    c11 = jnp.einsum("co,no->nc", k[2, 2], g[:, :, -1, -1])
    return left, right, top, bottom, (c00, c01, c10, c11)


def _bwd_rule(relu, outer_padding, res, g):
    x, w, b, scale, shift = res
    c, co = w.shape[2], w.shape[3]
    zeros_mode = outer_padding == "constant"

    # grad wrt the PRE-pad activation a = act(scale*x + shift):
    # interior = transposed conv (zero-halo corr with flipped weights)
    wT = _flip_transpose_w(w)  # (3,3,Co,C)
    w_ = g.shape[3]
    da = _conv3x3_chw_fwd(
        g, _pack_w9(wT).astype(g.dtype),
        jnp.zeros((c, 1), g.dtype),
        jnp.ones((co, 1, w_), g.dtype), jnp.zeros((co, 1, w_), g.dtype),
        relu=False, outer_padding="constant",
    )
    strips = _edge_strip_corrections(g, w.astype(jnp.float32), zeros_mode)
    if strips is not None:
        left, right, top, bottom, corners = strips
        da = da.at[:, :, :, 0].add(left.astype(da.dtype))
        da = da.at[:, :, :, -1].add(right.astype(da.dtype))
        da = da.at[:, :, 0, :].add(top.astype(da.dtype))
        da = da.at[:, :, -1, :].add(bottom.astype(da.dtype))
        c00, c01, c10, c11 = corners
        da = da.at[:, :, 0, 0].add(c00.astype(da.dtype))
        da = da.at[:, :, 0, -1].add(c01.astype(da.dtype))
        da = da.at[:, :, -1, 0].add(c10.astype(da.dtype))
        da = da.at[:, :, -1, -1].add(c11.astype(da.dtype))

    # chain through act + affine (recomputed, lane-dense = cheap)
    pre = x * scale[None, :, None, None] + shift[None, :, None, None]
    if relu:
        da = da * (pre > 0).astype(da.dtype)
    dx = da * scale[None, :, None, None].astype(da.dtype)
    dscale = jnp.sum(da.astype(jnp.float32) * x.astype(jnp.float32), axis=(0, 2, 3))
    dshift = jnp.sum(da.astype(jnp.float32), axis=(0, 2, 3))

    # dW via the accumulating Pallas kernel, db via lane-dense reduce
    dw9 = _conv3x3_chw_dw(
        x, g,
        jnp.broadcast_to(scale.reshape(c, 1, 1), (c, 1, w_)).astype(x.dtype),
        jnp.broadcast_to(shift.reshape(c, 1, 1), (c, 1, w_)).astype(x.dtype),
        relu=relu, outer_padding=outer_padding, co=co,
    )  # (Co, 9C)
    dw = jnp.transpose(dw9, (1, 0)).reshape(3, 3, c, co).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2, 3))

    return (dx.astype(x.dtype), dw, db.astype(b.dtype),
            dscale.astype(scale.dtype), dshift.astype(shift.dtype))


conv3x3_chw.defvjp(_fwd_rule, _bwd_rule)


# --------------------------------------------------------------------------
# 1x1 conv (the ResBlock shortcut) on channels-major arrays.


def _conv1x1_kernel(bh: int):
    def kernel(x_ref, w_ref, b_ref, y_ref):
        w = x_ref.shape[3]
        xm = x_ref[0].reshape(-1, bh * w)  # (C, BH*W)
        y = lax.dot_general(
            w_ref[:, :], xm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[:, :]
        y_ref[0, :, :, :] = y.reshape(-1, bh, w).astype(y_ref.dtype)

    return kernel


@jax.jit
def _conv1x1_chw_fwd(x, wm, b):
    w_true = x.shape[3]
    x = _pad_w_lanes(x, "zeros")
    n, c, h, w = x.shape
    co = wm.shape[0]
    bh = _pick_bh(h, w, c, x.dtype.itemsize)
    return pl.pallas_call(
        _conv1x1_kernel(bh),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, co, h, w), x.dtype),
        interpret=_interpret(),
    )(x, wm, b)[..., :w_true]


def _dw1x1_kernel(bh: int):
    def kernel(x_ref, g_ref, dw_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        w = x_ref.shape[3]
        xm = x_ref[0].reshape(-1, bh * w)       # (C, BH*W)
        g = g_ref[0].reshape(-1, bh * w)        # (Co, BH*W)
        acc = lax.dot_general(
            g, xm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Co, C)
        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("co",))
def _conv1x1_chw_dw(x, g, *, co: int):
    if x.shape[3] % 128:
        x = _pad_w_lanes(x, "zeros")
        g = _pad_w_lanes(g, "zeros")
    n, c, h, w = x.shape
    bh = _pick_bh(h, w, c, x.dtype.itemsize)
    return pl.pallas_call(
        _dw1x1_kernel(bh),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co, c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, c), jnp.float32),
        interpret=_interpret(),
    )(x, g)


@jax.custom_vjp
def conv1x1_chw(x, w, b):
    """y = 1x1 conv on (N, C, H, W): the ResBlock shortcut
    (reference models/layers.py:296-299), lane-dense."""
    return _conv1x1_impl(x, w, b)


def _conv1x1_impl(x, w, b):
    co = w.shape[-1]
    wm = jnp.transpose(w.reshape(-1, co), (1, 0)).astype(x.dtype)  # (Co, C)
    return _conv1x1_chw_fwd(x, wm, b.reshape(co, 1).astype(x.dtype))


def _conv1x1_fwd_rule(x, w, b):
    return _conv1x1_impl(x, w, b), (x, w, b)


def _conv1x1_bwd_rule(res, g):
    x, w, b = res
    c, co = w.shape[-2], w.shape[-1]
    # dx = W (C, Co) @ g: reuse the forward kernel with transposed weights
    wT = jnp.transpose(w.reshape(c, co), (1, 0)).reshape(1, 1, co, c)
    dx = _conv1x1_impl(g, wT, jnp.zeros((c,), g.dtype))
    dwm = _conv1x1_chw_dw(x, g, co=co)  # (Co, C)
    dw = jnp.transpose(dwm, (1, 0)).reshape(w.shape).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2, 3)).astype(b.dtype)
    return dx.astype(x.dtype), dw, db


conv1x1_chw.defvjp(_conv1x1_fwd_rule, _conv1x1_bwd_rule)


def conv3x3_chw_reference(x, w, b, scale, shift, relu=True,
                          outer_padding="replicate"):
    """Pure-XLA oracle for the fused kernel (used by tests)."""
    a = x * scale[None, :, None, None] + shift[None, :, None, None]
    if relu:
        a = jax.nn.relu(a)
    mode = "edge" if outer_padding == "replicate" else "constant"
    a = jnp.pad(a, ((0, 0), (0, 0), (1, 1), (1, 1)), mode=mode)
    y = lax.conv_general_dilated(
        a, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    return y + b[None, :, None, None]
