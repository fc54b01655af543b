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

Kernel scheme (v2, the "column-partial transform"): round-1 kernels built
the classic 9-tap stacked matrix (9C, BH·W) — 11 slab-sized VPU copies per
block, which device traces showed to be the bottleneck (the M=Co matmul
itself is cheap: MXU cycles ~ ceil(K/128)·ceil(M/128)·N, so small M is
free). v2 stacks only the THREE ROW OFFSETS of the slab once, S (3C, BH·W),
and computes all three column partials in ONE matmul

    P = Wp @ S,   Wp[(dx,co),(dy,c)] = K[dy,dx,c,co]   ->  (3Co, BH·W)

then combines them with two cheap lane shifts on the (small-Co) OUTPUT:

    y[:, :, j] = P0[:, :, j-1] + P1[:, :, j] + P2[:, :, j+1]

Column halos become shift-FILL rules: replicate left halo == P0's own first
column, zero halo == zero fill. This cuts VPU stack traffic ~3x and halves
MXU passes (K = 3C instead of 9C).

Layout contract: x (N, C, H, W) with W a multiple of 128 preferred; H % BH
== 0 (wrapper picks BH). Row halos arrive as two extra blocked inputs
(top/bottom neighbor rows, extracted by cheap strided slices on the dense
array in XLA) — Mosaic cannot DMA sublane-unaligned slices of tiled HBM
memrefs, so no manual DMA is used.

Backward (custom_vjp), both fully fused (nothing left to XLA but the
per-channel Adam-sized chain):
  dx  = ONE kernel: transposed-conv partials of g, replicate edge-gradient
        folds expressed as the same shift-fill rules (plus two tiny
        (3C,Co)@(Co,W) row-fold matmuls for the canvas top/bottom rows),
        then act'-mask, d(scale)/d(shift) per-channel f32 accumulators and
        the dx = dpre·scale chain — in-kernel;
  dW  = ONE kernel: all nine taps as a single (3Co,N)@(N,3C) accumulated
        matmul (column-shifted g against the row-stacked normed slab), plus
        a db accumulator.

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


def _pick_bh(h: int, w: int, c_rows: int, dtype_bytes: int) -> int:
    """Rows per block: target a few MB of VMEM for the per-block working set
    (``c_rows`` ~ total sublane rows live at once: slab + stack + partials).
    Must divide H and be a multiple of 8 (Mosaic requires the second-minor
    block dim divisible by 8 or equal to the array dim)."""
    budget = 6 * 1024 * 1024
    want = max(8, budget // max(1, c_rows * w * dtype_bytes))
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
    canvas border. x (N, C, H, W) -> tops/bots (N, C, nt, W), i.e. the SAME
    dim order as x: the strided row slice is then layout-neutral (any
    transpose here made XLA relayout the big input with full-size copies —
    ~1.3 ms/step). Kernels fetch the whole (C, nt, W) side array per block
    (tiny) and pick their row with a ref-level dynamic index
    (``_halo_row_at``)."""
    n, c, h, w = x.shape
    tops = jnp.concatenate([x[:, :, :1, :], x[:, :, bh - 1 : h - 1 : bh, :]], axis=2)
    bots = jnp.concatenate([x[:, :, bh::bh, :], x[:, :, h - 1 :, :]], axis=2)
    nt = h // bh
    pad = (-nt) % 8  # sublane-align so kernels can ds() an aligned chunk
    if pad:
        tops = jnp.pad(tops, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bots = jnp.pad(bots, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return tops, bots


def _halo_row_at(ref, t):
    """(1, C, nt8, W) halo-rows ref -> the (C, W) row for grid block t.

    Mosaic requires dynamic sublane starts provably 8-aligned: read the
    aligned 8-row chunk containing t and mask-select its row."""
    chunk = ref[0, :, pl.ds((t // 8) * 8, 8), :]  # (C, 8, W)
    sub = lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    return jnp.sum(jnp.where(sub == t % 8, chunk, 0), axis=1).astype(chunk.dtype)


def _halo_spec(c: int, nt: int, w: int):
    nt8 = nt + (-nt) % 8
    return pl.BlockSpec(
        (1, c, nt8, w), lambda n, t: (n, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _chunk_specs(c: int, bh: int, w: int, h: int):
    """Halo rows WITHOUT a separate XLA-built halo array: alias the source
    array itself with two extra (1, C, 8, W) BlockSpecs fetching the
    8-row-ALIGNED chunk that contains block t's top / bottom halo row.

    The old `_halo_rows` strided slice picks rows ≡ bh-1 (mod 8) —
    sublane-misaligned, so XLA preferred to relayout the ENTIRE producer
    tensor to an (N, W)-tiled layout before gathering (the ~0.6 ms/step
    `%copy` items feeding the (nt, N, C, W) halo fusions in the r3 trace).
    Aligned chunk reads keep the producer's native (H, W) tiling: no halo
    array, no gather fusion, no relayout. Requires h % 8 == 0 (then
    `_pick_bh` guarantees bh % 8 == 0); callers fall back to `_halo_rows`
    otherwise. Row selection inside the kernel is STATIC (row 7 of the
    chunk above, row 0 of the chunk below) — see `_top_row`/`_bot_row`."""
    k = bh // 8
    h8 = h // 8
    top = pl.BlockSpec(
        (1, c, 8, w),
        lambda n, t: (n, 0, jnp.maximum(t * k - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot = pl.BlockSpec(
        (1, c, 8, w),
        lambda n, t: (n, 0, jnp.minimum((t + 1) * k, h8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return top, bot


def _top_row(ref, t, chunked: bool):
    """Block t's top halo row (C, W). Chunked: rows [t*bh-8, t*bh) were
    fetched (clamped to [0, 8) at t == 0) -> row 7, except t == 0 where the
    canvas border's replicate source is row 0."""
    if not chunked:
        return _halo_row_at(ref, t)
    ch = ref[0]  # (C, 8, W)
    return jnp.where(t == 0, ch[:, 0, :], ch[:, 7, :]).astype(ch.dtype)


def _bot_row(ref, t, nt, chunked: bool):
    """Block t's bottom halo row (C, W). Chunked: rows [(t+1)*bh, +8) were
    fetched (clamped to the last chunk at t == nt-1) -> row 0, except
    t == nt-1 where the canvas border's replicate source is row 7 (= the
    canvas's own last row h-1)."""
    if not chunked:
        return _halo_row_at(ref, t)
    ch = ref[0]
    return jnp.where(t == nt - 1, ch[:, 7, :], ch[:, 0, :]).astype(ch.dtype)


def _norm_slab(xb, top, bot, sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true,
               halo_top: bool = False):
    """Assemble the (C, BH+2, W) slab from the block + halo rows, apply the
    fused scale/shift (+ReLU) and fix halo values for zero outer padding.
    top/bot arrive as (C, W). ``halo_top``: the t==0 top row is an injected
    halo (handled by the caller) — skip its zeros-mode canvas masking."""
    x = jnp.concatenate([top[:, None, :], xb, bot[:, None, :]], axis=1)  # (C, BH+2, W)
    x = x * sc_ref[:, :, :] + sh_ref[:, :, :]  # scale/shift arrive (C, 1, W)
    if relu:
        x = jnp.maximum(x, 0.0)
    if zeros_mode:
        # canvas-border halo rows must be zero POST-norm
        row = lax.broadcasted_iota(jnp.int32, (1, bh + 2, 1), 1)
        bot_m = jnp.logical_and(row == bh + 1, t == nt - 1)
        if not halo_top:
            top_m = jnp.logical_and(row == 0, t == 0)
            bot_m = jnp.logical_or(top_m, bot_m)
        x = jnp.where(bot_m, 0.0, x).astype(x.dtype)
        if w_true != x.shape[2]:
            # lane-padded columns beyond the true width must also be zero
            # POST-norm (they are the true right edge's halo source)
            col = lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[2]), 2)
            x = jnp.where(col >= w_true, 0.0, x).astype(x.dtype)
    return x


def _rows_stack(slab, bh):
    """(C, BH+2, W) slab -> (3C, BH*W): the three row offsets stacked on the
    sublane axis (dy major, channel minor). Requires W % 128 == 0 for the
    lane-merge reshape (Mosaic restriction; the wrapper lane-pads).

    Reshape FIRST, then slice: ``slab[:, dy:dy+bh, :].reshape`` is the same
    values, but Mosaic lowers the dy=1,2 sublane-misaligned slices as
    full-slab shuffles (~35% of kernel time, measured); after the (free)
    lane-merge reshape the same windows are 128-ALIGNED lane slices
    (dy*W % 128 == 0), which copy at full vector width."""
    c = slab.shape[0]
    w = slab.shape[2]
    flat = slab.reshape(c, slab.shape[1] * w)
    return jnp.concatenate(
        [flat[:, dy * w : dy * w + bh * w] for dy in range(3)], axis=0
    )


def _shift_r(a, fill):
    """a[..., j-1] with ``fill`` (shape a[..., :1]) at j=0."""
    return jnp.concatenate([fill, a[..., :-1]], axis=-1)


def _shift_l(a, fill):
    """a[..., j+1] with ``fill`` (shape a[..., -1:]) at j=W-1."""
    return jnp.concatenate([a[..., 1:], fill], axis=-1)


def _combine_partials(p, co, bh, w, zeros_mode, w_true):
    """(3Co, BH*W) f32 partials -> combined (Co, BH, W) with column-halo
    shift fills. Replicate halo: left fill = P0 col 0, right fill = P2 col
    W-1 (only meaningful when w_true == W; for lane-padded widths the
    wrapper's edge-padding already placed the correct halo in column
    w_true)."""
    p0 = p[0:co].reshape(co, bh, w)
    p1 = p[co : 2 * co].reshape(co, bh, w)
    p2 = p[2 * co :].reshape(co, bh, w)
    if zeros_mode:
        fill_l = jnp.zeros_like(p0[:, :, :1])
        fill_r = jnp.zeros_like(p2[:, :, -1:])
    else:
        fill_l = p0[:, :, :1]
        fill_r = p2[:, :, -1:] if w_true == w else jnp.zeros_like(p2[:, :, -1:])
    return _shift_r(p0, fill_l) + p1 + _shift_l(p2, fill_r)


def _acc_stats(yc, co, bh, w, w_true, s1_ref, s2_ref, first):
    """Accumulate per-channel sum / sum-of-squares of the stored output
    (the NEXT BatchNorm's batch statistics — fusing them here removes the
    XLA reduce island between Pallas calls and the relayout copies it drags
    in; VERDICT r2 next-#2). Lane-pad columns are masked out."""
    yf = yc.astype(jnp.float32)
    if w_true != w:
        col = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        yf = jnp.where(col >= w_true, 0.0, yf)
    flat = yf.reshape(co, bh * w)
    s1 = jnp.sum(flat, axis=1, keepdims=True)
    s2 = jnp.sum(flat * flat, axis=1, keepdims=True)

    @pl.when(first)
    def _():
        s1_ref[:, :] = s1
        s2_ref[:, :] = s2

    @pl.when(jnp.logical_not(first))
    def _():
        s1_ref[:, :] = s1_ref[:, :] + s1
        s2_ref[:, :] = s2_ref[:, :] + s2


def _conv_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int, co: int,
                 want_stats: bool = False, padfix: bool = False,
                 chunked: bool = False):
    """Forward kernel factory. Grid (N, H/BH). Requires W % 128 == 0 (the
    wrapper lane-pads other widths; ``w_true`` is the unpadded width).

    ``padfix``: write replicate-edge fill into the lane-pad columns of the
    output (via the tiny F fill-matmul input) so the NEXT kernel can consume
    the array directly — the padded-carry convention that removes the XLA
    pad/slice islands (and their relayout copies) between Pallas calls."""

    def kernel(x_ref, top_ref, bot_ref, wp_ref, b_ref, sc_ref, sh_ref, *rest):
        rest = list(rest)
        f_ref = rest.pop(0) if padfix else None
        y_ref = rest.pop(0)
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = x_ref.shape[3]
        slab = _norm_slab(
            x_ref[0], _top_row(top_ref, t, chunked),
            _bot_row(bot_ref, t, nt, chunked),
            sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true,
        )
        s = _rows_stack(slab, bh)  # (3C, BH*W)
        p = lax.dot_general(
            wp_ref[:, :], s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3Co, BH*W)
        y = _combine_partials(p, co, bh, w, zeros_mode, w_true)
        y = (y.reshape(co, bh * w) + b_ref[:, :])
        if padfix:
            y = lax.dot_general(
                y.reshape(co * bh, w), f_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(co, bh * w)
        yc = y.reshape(co, bh, w).astype(y_ref.dtype)
        y_ref[0, :, :, :] = yc
        if want_stats:
            _acc_stats(yc, co, bh, w, w_true, rest[0], rest[1],
                       jnp.logical_and(n == 0, t == 0))

    return kernel


def _padfix_matrix(w: int, w_true: int, dtype) -> jnp.ndarray:
    """(w, w) fill matrix: identity on the true columns, and every lane-pad
    column j >= w_true copies column w_true-1 (replicate-edge fill, the
    _pad_w_lanes('edge') contract)."""
    rows = jnp.arange(w)[:, None]
    cols = jnp.arange(w)[None, :]
    ident = (rows == cols) & (cols < w_true)
    fill = (rows == w_true - 1) & (cols >= w_true)
    return (ident | fill).astype(dtype)


def _interpret() -> bool:
    if jax.default_backend() != "tpu":
        return True
    # a `with jax.default_device(cpu)` override (train_step.create_train_state
    # runs the init compiles on the host CPU backend — the tunnel's remote
    # compile of the init graphs cost ~170 s per training run) must also take
    # the interpret path: Mosaic kernels cannot lower for the CPU backend
    dd = jax.config.jax_default_device
    return dd is not None and getattr(dd, "platform", "tpu") != "tpu"


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "want_stats", "w_true", "emit_padded"))
def _conv3x3_chw_fwd(x, wp, b, scale, shift, *, relu: bool, outer_padding: str,
                     want_stats: bool = False, w_true: int = None,
                     emit_padded: bool = False):
    """``w_true`` set => x arrives ALREADY lane-padded under the padded-carry
    contract (replicate: pad cols hold the edge value; zeros: pad content is
    ignored, kernels self-mask). ``emit_padded`` => return the full padded
    width with the same contract instead of slicing."""
    zeros_mode = outer_padding == "constant"
    if w_true is None:
        w_true = x.shape[3]
        x = _pad_w_lanes(x, "zeros" if zeros_mode else "edge")
    if x.shape[3] != w_true and scale.shape[-1] == w_true:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, c, h, w = x.shape
    co = wp.shape[0] // 3
    bh = _pick_bh(h, w, 6 * c + 9 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    if chunked:
        tops = bots = x
        top_spec, bot_spec = _chunk_specs(c, bh, w, h)
    else:
        tops, bots = _halo_rows(x, bh)
        top_spec = bot_spec = _halo_spec(c, h // bh, w)
    padfix = emit_padded and w_true != w and not zeros_mode
    kernel = _conv_kernel(relu, zeros_mode, bh, w_true, co, want_stats, padfix,
                          chunked)
    out_specs = pl.BlockSpec(
        (1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, co, h, w), x.dtype)
    if want_stats:
        acc_spec = pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((co, 1), jnp.float32)
        out_specs = (out_specs, acc_spec, acc_spec)
        out_shape = (out_shape, acc_shape, acc_shape)
    in_specs = [
        pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
        top_spec,
        bot_spec,
        pl.BlockSpec((3 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, tops, bots, wp, b, scale, shift]
    if padfix:
        in_specs.append(
            pl.BlockSpec((w, w), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(_padfix_matrix(w, w_true, x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    sl = slice(None) if emit_padded else slice(0, w_true)
    if want_stats:
        y, s1, s2 = out
        return y[..., sl], s1[:, 0], s2[:, 0]
    return out[..., sl]


# --------------------------------------------------------------------------
# Stateful-inference forward: the halo-cache variant (no VJP — the raster
# engine never trains). The cross-step halo cache supplies the top row and
# left column of the padded input; both arrive POST-norm (the cache stores
# raw activations and the caller norms the tiny injection arrays in XLA —
# valid because the eval-mode fold is a fixed per-channel affine). Column
# halos become small (Co,3C)@(3C,BH) fill matmuls on row-stacked halo
# column strips; the injected top row rides the ordinary `tops` input and
# block 0 skips the in-kernel norm for it.


def _conv_halo_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int,
                      c: int, co: int, use_rstrip: bool,
                      chunked: bool = False):
    def kernel(*refs):
        refs = list(refs)
        x_ref, top_ref, bot_ref = refs[:3]
        refs = refs[3:]
        inj_ref = refs.pop(0) if chunked else None
        l_ref = refs.pop(0)
        r_ref = refs.pop(0) if use_rstrip else None
        wp_ref, b_ref, sc_ref, sh_ref, y_ref = refs
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = x_ref.shape[3]
        # post-norm at t==0 (injected), raw otherwise
        if chunked:
            top_pn = jnp.where(
                t == 0, inj_ref[0, :, 0, :], top_ref[0][:, 7, :]
            ).astype(x_ref.dtype)
        else:
            top_pn = _halo_row_at(top_ref, t)
        slab = _norm_slab(
            x_ref[0], top_pn, _bot_row(bot_ref, t, nt, chunked), sc_ref,
            sh_ref, relu, zeros_mode, t, nt, bh, w_true, halo_top=True,
        )
        # restore the injected (already-normed) top row for the first block
        row = lax.broadcasted_iota(jnp.int32, (1, bh + 2, 1), 1)
        slab = jnp.where(
            jnp.logical_and(row == 0, t == 0),
            top_pn[:, None, :].astype(slab.dtype), slab,
        ).astype(slab.dtype)
        s = _rows_stack(slab, bh)
        p = lax.dot_general(
            wp_ref[:, :], s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p0 = p[0:co].reshape(co, bh, w)
        p1 = p[co : 2 * co].reshape(co, bh, w)
        p2 = p[2 * co :].reshape(co, bh, w)
        # left halo column: fill matmul on the row-stacked strip
        # (strips arrive (BH, 3C): last block dim == array dim, the only
        # Mosaic-legal layout for a non-128 trailing block size)
        fill_l = lax.dot_general(
            wp_ref[0:co, :], l_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(co, bh, 1)
        if use_rstrip:  # w_true == W: right halo via its own strip
            fill_r = lax.dot_general(
                wp_ref[2 * co :, :], r_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(co, bh, 1)
        else:  # lane-padded width: the slab pad columns carry the halo
            fill_r = jnp.zeros_like(p2[:, :, -1:])
        y = _shift_r(p0, fill_l) + p1 + _shift_l(p2, fill_r)
        y = (y.reshape(co, bh * w) + b_ref[:, :]).reshape(co, bh, w)
        y_ref[0, :, :, :] = y.astype(y_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("relu", "outer_padding"))
def _conv3x3_chw_fwd_halo(x, wp, b, scale, shift, top_pn, lstack, rstack,
                          *, relu: bool, outer_padding: str):
    """x (N,C,H,W) raw; top_pn (N,C,Wpad) POST-norm top halo row (canvas
    cols 0..W-1, corner at col w_true when lane-padded); lstack/rstack
    (N, H, 3C) POST-norm row-stacked halo column strips."""
    w_true = x.shape[3]
    zeros_mode = outer_padding == "constant"
    x = _pad_w_lanes(x, "zeros" if zeros_mode else "edge")
    if x.shape[3] != w_true and scale.shape[-1] == w_true:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, c, h, w = x.shape
    co = wp.shape[0] // 3
    bh = _pick_bh(h, w, 6 * c + 9 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    use_rstrip = w_true == w
    kernel = _conv_halo_kernel(relu, zeros_mode, bh, w_true, c, co, use_rstrip,
                               chunked)
    strip_spec = pl.BlockSpec(
        (1, bh, 3 * c), lambda n, t: (n, t, 0), memory_space=pltpu.VMEM
    )
    nt = h // bh
    if chunked:
        top_spec, bot_spec = _chunk_specs(c, bh, w, h)
        inj_spec = pl.BlockSpec(
            (1, c, 1, w), lambda n, t: (n, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0),
                         memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            inj_spec,
            strip_spec,
        ]
        args = [x, x, x, top_pn[:, :, None, :], lstack]
    else:
        tops, bots = _halo_rows(x, bh)
        tops = jnp.concatenate([top_pn[:, :, None, :], tops[:, :, 1:]], axis=2)
        in_specs = [
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0),
                         memory_space=pltpu.VMEM),
            _halo_spec(c, nt, w),
            _halo_spec(c, nt, w),
            strip_spec,
        ]
        args = [x, tops, bots, lstack]
    if use_rstrip:
        in_specs.append(strip_spec)
        args.append(rstack)
    in_specs += [
        pl.BlockSpec((3 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args += [wp, b, scale, shift]
    return pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, co, h, w), x.dtype),
        interpret=_interpret(),
    )(*args)[..., :w_true]


def chw_halo_step(x, w, b, scale, shift, relu, outer_padding, site, pos, gh, gw):
    """One stateful raster step of a channels-major local-padded conv.

    ``x`` (N, C, Hm, Wm) is the RAW conv input (the BN fold + act run inside
    the kernel); ``site`` is the engine's NHWC-format SiteState and holds
    POST-norm values — identical buffer contents to the NHWC halo path
    (ops/padding.py: halo_pad_step caches the conv's post-norm input), so
    zeros-mode border cells and ``finalize_row`` semantics carry over
    unchanged. The tiny injection/caching arrays are normed in XLA; the bulk
    work runs in the Pallas halo kernel. Reference semantics:
    models/layers.py:78-143 (padding() + update_padding_variables).
    """
    from infinite_texture_gans_tpu.ops.padding import SiteState

    n, c, hm, wm = x.shape
    hp, wp_ = hm // gh, wm // gw
    co = w.shape[-1]
    zeros = outer_padding == "constant"

    def pn(a):  # post-norm domain for the tiny injection/cache arrays
        a = a * scale.reshape(1, c, 1, 1) + shift.reshape(1, c, 1, 1)
        return jnp.maximum(a, 0.0).astype(x.dtype) if relu else a.astype(x.dtype)

    # --- assemble post-norm halo pieces ---------------------------------
    v_pn = jnp.transpose(site.v, (0, 3, 1, 2)).astype(x.dtype)  # (N,C,Hm,1)
    left = jnp.where(
        pos.first_col,
        jnp.zeros_like(v_pn) if zeros else pn(x[:, :, :, :1]),
        v_pn,
    )
    right = jnp.zeros_like(left) if zeros else pn(x[:, :, :, -1:])

    offset = (gw - 1) * wp_ * pos.col
    read = lax.dynamic_slice_in_dim(site.row_read, offset, wm + 2, axis=2)
    read_chw = jnp.transpose(read, (0, 3, 1, 2)).astype(x.dtype)  # (N,C,1,Wm+2)
    if zeros:
        own_top = jnp.zeros_like(read_chw)
    else:  # replicate: [left[0], pn(x row 0), right[0]]
        own_top = jnp.concatenate(
            [left[:, :, :1, :], pn(x[:, :, :1, :]), right[:, :, :1, :]], axis=3
        )
    top = jnp.where(pos.first_row, own_top, read_chw)  # (N, C, 1, Wm+2)

    # column strips spanning padded rows -1..Hm (post-norm)
    def strips(corner_t, col, corner_b):
        full = jnp.concatenate([corner_t, col[:, :, :, 0], corner_b], axis=2)
        stk = jnp.concatenate(
            [full[:, :, dy : dy + hm] for dy in range(3)], axis=1
        )  # (N, 3C, Hm)
        return jnp.transpose(stk, (0, 2, 1))  # (N, Hm, 3C): Mosaic block rule

    bl = jnp.zeros_like(left[:, :, -1, :]) if zeros else left[:, :, -1, :]
    br = jnp.zeros_like(right[:, :, -1, :]) if zeros else right[:, :, -1, :]
    lstack = strips(top[:, :, 0, :1], left, bl)
    rstack = strips(top[:, :, 0, -1:], right, br)

    # top row for the kernel: canvas cols 0..Wm-1, lane-padded with the
    # top-right corner placed at column Wm (see _conv3x3_chw_fwd_halo)
    top_k = top[:, :, 0, 1 : wm + 1]
    pad = (-wm) % 128
    if pad:
        top_k = jnp.pad(top_k, ((0, 0), (0, 0), (0, pad)))
        top_k = top_k.at[:, :, wm].set(top[:, :, 0, wm + 1])

    wp = _pack_w_partial(w).astype(x.dtype)
    sc = _bcast_cw(scale, c, wm).astype(x.dtype)
    sh = _bcast_cw(shift, c, wm).astype(x.dtype)
    y = _conv3x3_chw_fwd_halo(
        x, wp, b.reshape(co, 1).astype(x.dtype), sc, sh, top_k, lstack, rstack,
        relu=relu, outer_padding=outer_padding,
    )

    # --- cache updates (post-norm domain, NHWC buffer format) ------------
    v_new = pn(x[:, :, :, (gw - 1) * wp_ - 1 : (gw - 1) * wp_])
    row_slice = pn(x[:, :, (gh - 1) * hp - 1 : (gh - 1) * hp, :])
    row_write = lax.dynamic_update_slice_in_dim(
        site.row_write,
        jnp.transpose(row_slice, (0, 2, 3, 1)).astype(site.row_write.dtype),
        offset + 1,
        axis=2,
    )
    new_site = SiteState(
        v=jnp.transpose(v_new, (0, 2, 3, 1)).astype(site.v.dtype),
        row_read=site.row_read,
        row_write=row_write,
    )
    return y, new_site


# --------------------------------------------------------------------------
# Fused backward: dx (+ dscale, dshift) in one kernel.


def _dx_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int, c: int,
               co: int, chunked: bool = False):
    """Grid (N, H/BH). Inputs: g block + g halo rows (zeros at canvas
    borders), x block (for the act mask and the per-channel accumulators),
    packed flipped-transposed weights WpT (3C, 3Co), scale/shift. Outputs:
    dx block, dscale (C,1) f32 acc, dshift (C,1) f32 acc.

    Implements the full replicate edge-gradient fold of the reference's
    outer padding: interior = transposed conv; left/right column folds via
    the shift fills (or a masked add at the true right edge when the width
    is lane-padded); canvas top/bottom row folds via two small matmuls on
    the g edge rows, active only in the first/last grid block."""

    def kernel(g_ref, gtop_ref, gbot_ref, x_ref, wpt_ref, sc_ref, sh_ref,
               dx_ref, dsc_ref, dsh_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = g_ref.shape[3]
        gb = g_ref[0]  # (Co, BH, W)
        top = _top_row(gtop_ref, t, chunked)  # (Co, W)
        bot = _bot_row(gbot_ref, t, nt, chunked)
        # gradient slab: zero halo rows at the canvas borders (gradients do
        # not flow in from outside the canvas, any padding mode)
        top = jnp.where(t == 0, 0.0, top).astype(top.dtype)
        bot = jnp.where(t == nt - 1, 0.0, bot).astype(bot.dtype)
        slab = jnp.concatenate([top[:, None, :], gb, bot[:, None, :]], axis=1)
        sg = _rows_stack(slab, bh)  # (3Co, BH*W)
        q = lax.dot_general(
            wpt_ref[:, :], sg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3C, BH*W)
        q0 = q[0:c].reshape(c, bh, w)
        q1 = q[c : 2 * c].reshape(c, bh, w)
        q2 = q[2 * c :].reshape(c, bh, w)
        if zeros_mode:
            fill_l = jnp.zeros_like(q0[:, :, :1])
            fill_r = jnp.zeros_like(q2[:, :, -1:])
        else:
            # left fold: da[:, :, 0] += Q2 col 0 — rides the shift fill
            fill_l = q2[:, :, :1]
            fill_r = q0[:, :, -1:] if w_true == w else jnp.zeros_like(q2[:, :, -1:])
        da = _shift_r(q0, fill_l) + q1 + _shift_l(q2, fill_r)
        col = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        if not zeros_mode and w_true != w:
            # right fold at the true edge (lane-padded width)
            da = da + jnp.where(col == w_true - 1, q0, 0.0)

        if not zeros_mode:
            # canvas top/bottom row folds: da[0,:] += sum_dx' wT[2,dx'] ⊛ g[0,:]
            # (and symmetric at the bottom with wT[0,dx']), with the corner
            # terms riding the same column-fill rules.
            row = lax.broadcasted_iota(jnp.int32, (1, bh, 1), 1)

            def row_fold(wcols, grow):
                tt = lax.dot_general(
                    wcols, grow, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (3C, W)
                # 3-D form: 2-D lane concats of sublane-offset slices are
                # unsupported by Mosaic ("offset mismatch on non-concat dim")
                t0 = tt[0:c].reshape(c, 1, w)
                t1 = tt[c : 2 * c].reshape(c, 1, w)
                t2 = tt[2 * c :].reshape(c, 1, w)
                f_l = t2[:, :, :1]
                f_r = t0[:, :, -1:] if w_true == w else jnp.zeros_like(t2[:, :, -1:])
                fr = _shift_r(t0, f_l) + t1 + _shift_l(t2, f_r)
                if w_true != w:
                    fr = fr + jnp.where(col == w_true - 1, t0, 0.0)
                return fr  # (C, 1, W)

            fold_top = row_fold(wpt_ref[:, 2 * co : 3 * co], slab[:, 1, :])
            fold_bot = row_fold(wpt_ref[:, 0:co], slab[:, bh, :])
            da = (
                da
                + jnp.where(jnp.logical_and(row == 0, t == 0), fold_top, 0.0)
                + jnp.where(jnp.logical_and(row == bh - 1, t == nt - 1), fold_bot, 0.0)
            )

        if w_true != w:
            # keep lane-padded columns out of dx and the accumulators
            da = jnp.where(col >= w_true, 0.0, da)

        xb = x_ref[0]  # (C, BH, W)
        if relu:
            pre = xb * sc_ref[:, :, :] + sh_ref[:, :, :]
            # compare in f32: bf16 cmpf is unsupported on this target
            da = da * (pre.astype(jnp.float32) > 0)
        dx_ref[0, :, :, :] = (da * sc_ref[:, :, :]).astype(dx_ref.dtype)
        # keep reductions 2-D end to end (1-D<->2-D reshapes crash Mosaic's
        # layout inference)
        dsc = jnp.sum((da * xb).reshape(c, bh * w), axis=1, keepdims=True)
        dsh = jnp.sum(da.reshape(c, bh * w), axis=1, keepdims=True)

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dsc_ref[:, :] = dsc
            dsh_ref[:, :] = dsh

        @pl.when(jnp.logical_not(first))
        def _():
            dsc_ref[:, :] = dsc_ref[:, :] + dsc
            dsh_ref[:, :] = dsh_ref[:, :] + dsh

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "c", "w_true", "emit_padded"))
def _conv3x3_chw_dx(x, g, wpt, scale, shift, *, relu: bool, outer_padding: str,
                    c: int, w_true: int = None, emit_padded: bool = False):
    zeros_mode = outer_padding == "constant"
    if w_true is None:
        w_true = x.shape[3]
        x = _pad_w_lanes(x, "zeros" if zeros_mode else "edge")
        g = _pad_w_lanes(g, "zeros")
    if x.shape[3] != w_true and scale.shape[-1] == w_true:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, co, h, w = g.shape
    bh = _pick_bh(h, w, 2 * c + 6 * co + 6 * c, x.dtype.itemsize)
    chunked = h % 8 == 0
    if chunked:
        gtops = gbots = g
        gtop_spec, gbot_spec = _chunk_specs(co, bh, w, h)
    else:
        gtops, gbots = _halo_rows(g, bh)
        gtop_spec = gbot_spec = _halo_spec(co, h // bh, w)
    kernel = _dx_kernel(relu, zeros_mode, bh, w_true, c, co, chunked)
    dx, dsc, dsh = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            gtop_spec,
            gbot_spec,
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 3 * co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c, h, w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(g, gtops, gbots, x, wpt, scale, shift)
    sl = slice(None) if emit_padded else slice(0, w_true)
    return dx[..., sl], dsc[:, 0], dsh[:, 0]


# --------------------------------------------------------------------------
# Fused backward: dW (+ db) in one kernel.


def _dw_kernel(relu: bool, zeros_mode: bool, bh: int, w_true: int, c: int,
               co: int, chunked: bool = False):
    """dW kernel: (3Co, 3C) += Gc @ Sx^T accumulated across every grid block
    (TPU grid is sequential; the output block has a constant index so it
    lives in VMEM for the whole grid). Gc = column-shifted g with the
    replicate right/left halo terms folded into its edge columns; Sx = the
    row-stacked NORMED slab (same normalization as the forward)."""

    def kernel(x_ref, top_ref, bot_ref, g_ref, sc_ref, sh_ref, dw_ref, db_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        w = x_ref.shape[3]
        slab = _norm_slab(
            x_ref[0], _top_row(top_ref, t, chunked),
            _bot_row(bot_ref, t, nt, chunked),
            sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true,
        )
        sx = _rows_stack(slab, bh)  # (3C, BH*W)
        gb = g_ref[0]  # (Co, BH, W)
        zf = jnp.zeros_like(gb[:, :, :1])
        gl = _shift_l(gb, zf)  # tap dx=0 pairs a[.., j-1] -> shift g left
        gr = _shift_r(gb, zf)  # tap dx=2 pairs a[.., j+1] -> shift g right
        if not zeros_mode:
            col = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
            # left halo a[.., -1] == a[.., 0]: fold g col 0 into Gc_0 col 0
            gl = gl + jnp.where(col == 0, gb, 0.0).astype(gl.dtype)
            if w_true == w:
                # right halo a[.., W] == a[.., W-1]: fold g's last column.
                # (When lane-padded, shift_r already placed g[w_true-1] in
                # column w_true where the slab carries the edge value.)
                gr = gr + jnp.where(col == w - 1, gb, 0.0).astype(gr.dtype)
        gc = jnp.concatenate(
            [gl.reshape(co, bh * w), gb.reshape(co, bh * w), gr.reshape(co, bh * w)],
            axis=0,
        )  # (3Co, BH*W)
        acc = lax.dot_general(
            gc, sx, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (3Co, 3C)
        db = jnp.sum(
            gb.reshape(co, bh * w).astype(jnp.float32), axis=1, keepdims=True
        )

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc
            db_ref[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc
            db_ref[:, :] = db_ref[:, :] + db

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "co", "w_true"))
def _conv3x3_chw_dw(x, g, scale, shift, *, relu: bool, outer_padding: str,
                    co: int, w_true: int = None):
    if w_true is None:
        w_true = x.shape[3]
        x = _pad_w_lanes(x, "zeros" if outer_padding == "constant" else "edge")
        if x.shape[3] != w_true:
            g = _pad_w_lanes(g, "zeros")  # zero grads in pad cols -> no dW leak
    if x.shape[3] != w_true and scale.shape[-1] == w_true:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, c, h, w = x.shape
    bh = _pick_bh(h, w, 6 * c + 5 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    if chunked:
        tops = bots = x
        top_spec, bot_spec = _chunk_specs(c, bh, w, h)
    else:
        tops, bots = _halo_rows(x, bh)
        top_spec = bot_spec = _halo_spec(c, h // bh, w)
    kernel = _dw_kernel(relu, outer_padding == "constant", bh, w_true, c, co,
                        chunked)
    dw, db = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3 * co, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, tops, bots, g, scale, shift)
    return dw, db[:, 0]


def _pack_w_partial(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,Co) kernel -> (3Co, 3C): rows (dx major, co minor), columns
    (dy major, c minor) — the forward partial-matmul layout."""
    co = w.shape[-1]
    c = w.shape[-2]
    return jnp.transpose(w, (1, 3, 0, 2)).reshape(3 * co, 3 * c)


def _unpack_dw_partial(acc: jnp.ndarray, c: int, co: int) -> jnp.ndarray:
    """(3Co, 3C) accumulated taps -> (3,3,C,Co): acc[(dx,co),(dy,c)]."""
    return jnp.transpose(acc.reshape(3, co, 3, c), (2, 0, 3, 1))


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


def _bcast_cw(v, c, w_):
    return jnp.broadcast_to(v.reshape(c, 1, 1), (c, 1, w_))


def _fwd_impl(x, w, b, scale, shift, relu, outer_padding):
    c, co = w.shape[2], w.shape[3]
    wp = _pack_w_partial(w).astype(x.dtype)
    w_ = x.shape[3]
    sc = _bcast_cw(scale, c, w_).astype(x.dtype)
    sh = _bcast_cw(shift, c, w_).astype(x.dtype)
    return _conv3x3_chw_fwd(
        x, wp, b.reshape(co, 1).astype(x.dtype), sc, sh,
        relu=relu, outer_padding=outer_padding,
    )


def _fwd_rule(x, w, b, scale, shift, relu, outer_padding):
    y = _fwd_impl(x, w, b, scale, shift, relu, outer_padding)
    return y, (x, w, b, scale, shift)


def _bwd_rule(relu, outer_padding, res, g):
    x, w, b, scale, shift = res
    c, co = w.shape[2], w.shape[3]
    w_ = x.shape[3]
    sc = _bcast_cw(scale, c, w_).astype(x.dtype)
    sh = _bcast_cw(shift, c, w_).astype(x.dtype)

    wpt = _pack_w_partial(_flip_transpose_w(w)).astype(g.dtype)  # (3C, 3Co)
    dx, dscale, dshift = _conv3x3_chw_dx(
        x, g, wpt, sc, sh, relu=relu, outer_padding=outer_padding, c=c
    )
    dw_acc, db = _conv3x3_chw_dw(
        x, g, sc, sh, relu=relu, outer_padding=outer_padding, co=co
    )
    dw = _unpack_dw_partial(dw_acc, c, co).astype(w.dtype)
    return (dx.astype(x.dtype), dw, db.astype(b.dtype),
            dscale.astype(scale.dtype), dshift.astype(shift.dtype))


conv3x3_chw.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv3x3_chw_stats(x, w, b, scale, shift, relu: bool = True,
                      outer_padding: str = "replicate"):
    """Like :func:`conv3x3_chw` but additionally returns the per-channel
    ``(sum, sum_sq)`` f32 statistics of the output — the NEXT BatchNorm's
    batch moments, accumulated inside the kernel instead of by an XLA
    reduce (which forced relayout copies at every Pallas boundary).

    Returns (y, s1, s2) with s1[c] = sum(y[:, c]), s2[c] = sum(y[:, c]^2)
    over (N, H, W). The backward applies the stats cotangents as the
    elementwise correction g + gs1 + 2*y*gs2 (the same term XLA's autodiff
    of the reduce produced) using the saved output."""
    c, co = w.shape[2], w.shape[3]
    wp = _pack_w_partial(w).astype(x.dtype)
    w_ = x.shape[3]
    sc = _bcast_cw(scale, c, w_).astype(x.dtype)
    sh = _bcast_cw(shift, c, w_).astype(x.dtype)
    return _conv3x3_chw_fwd(
        x, wp, b.reshape(co, 1).astype(x.dtype), sc, sh,
        relu=relu, outer_padding=outer_padding, want_stats=True,
    )


def _fwd_rule_stats(x, w, b, scale, shift, relu, outer_padding):
    y, s1, s2 = conv3x3_chw_stats(x, w, b, scale, shift, relu, outer_padding)
    return (y, s1, s2), (x, w, b, scale, shift, y)


def _bwd_rule_stats(relu, outer_padding, res, cts):
    x, w, b, scale, shift, y = res
    g, gs1, gs2 = cts
    co = w.shape[3]
    corr1 = gs1.reshape(1, co, 1, 1)
    corr2 = (2.0 * gs2).reshape(1, co, 1, 1)
    g = (g.astype(jnp.float32) + corr1 + corr2 * y.astype(jnp.float32)).astype(
        g.dtype
    )
    return _bwd_rule(relu, outer_padding, (x, w, b, scale, shift), g)


conv3x3_chw_stats.defvjp(_fwd_rule_stats, _bwd_rule_stats)


# --------------------------------------------------------------------------
# Padded-carry variants: activations flow between kernels at the PHYSICAL
# lane-padded width (the kernels write the replicate-edge fill into the pad
# columns themselves), so no XLA pad/slice fusion — and none of the relayout
# copies XLA's layout assignment hangs on them — sits between Pallas calls.
# Gradient contract: every cotangent carries ZERO pad columns (the dx
# kernels mask them; the stats-correction masks below preserve it), so the
# in-kernel pad-fill needs no explicit transpose term.


def _bn_corr_kernel(bh: int, w_true: int):
    def kernel(g_ref, y_ref, a_ref, b2_ref, o_ref):
        w = g_ref.shape[3]
        corr = a_ref[:, :, :] + b2_ref[:, :, :] * y_ref[0].astype(jnp.float32)
        if w_true != w:
            col = lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
            corr = jnp.where(col >= w_true, 0.0, corr)
        o_ref[0, :, :, :] = (g_ref[0].astype(jnp.float32) + corr).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("w_true",))
def _bn_corr(g, y, alpha, beta2, *, w_true: int):
    """g + (alpha + beta2*y) masked to the valid columns — the BN-statistics
    backward correction, as a Pallas kernel so XLA's layout assignment never
    sees it (the equivalent elementwise fusion chose {3,0,2,1} layouts and
    dragged full-size relayout copies around every Pallas boundary)."""
    n, c, h, w = g.shape
    bh = _pick_bh(h, w, 3 * c, g.dtype.itemsize)
    a = jnp.broadcast_to(alpha.reshape(c, 1, 1), (c, 1, w)).astype(jnp.float32)
    b2 = jnp.broadcast_to(beta2.reshape(c, 1, 1), (c, 1, w)).astype(jnp.float32)
    return pl.pallas_call(
        _bn_corr_kernel(bh, w_true),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, w), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        interpret=_interpret(),
    )(g, y, a, b2)


def _mask_pad_cols(a: jnp.ndarray, w_true: int) -> jnp.ndarray:
    if a.shape[-1] == w_true:
        return a
    col = jnp.arange(a.shape[-1])
    return jnp.where(col[None, None, None, :] < w_true, a, 0).astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def conv3x3_chw_p(x, w, b, scale, shift, relu: bool, outer_padding: str,
                  w_true: int, want_stats: bool):
    """Padded-carry :func:`conv3x3_chw`: ``x`` arrives at physical width
    (multiple of 128) with valid width ``w_true`` and replicate-edge fill in
    the pad columns; the output keeps the same contract. With
    ``want_stats`` returns (y, s1, s2) (pad columns excluded)."""
    c, co = w.shape[2], w.shape[3]
    wp = _pack_w_partial(w).astype(x.dtype)
    sc = _bcast_cw(scale, c, x.shape[3]).astype(x.dtype)
    sh = _bcast_cw(shift, c, x.shape[3]).astype(x.dtype)
    return _conv3x3_chw_fwd(
        x, wp, b.reshape(co, 1).astype(x.dtype), sc, sh,
        relu=relu, outer_padding=outer_padding, want_stats=want_stats,
        w_true=w_true, emit_padded=True,
    )


def _p_fwd_rule(x, w, b, scale, shift, relu, outer_padding, w_true, want_stats):
    out = conv3x3_chw_p(x, w, b, scale, shift, relu, outer_padding, w_true,
                        want_stats)
    y = out[0] if want_stats else out
    res = (x, w, b, scale, shift, y if want_stats else None)
    return out, res


def _p_bwd_rule(relu, outer_padding, w_true, want_stats, res, cts):
    x, w, b, scale, shift, y = res
    if want_stats:
        g, gs1, gs2 = cts
        g = _bn_corr(g, y, gs1, 2.0 * gs2, w_true=w_true)
    else:
        g = cts
    c, co = w.shape[2], w.shape[3]
    w_phys = x.shape[3]
    sc = _bcast_cw(scale, c, w_phys).astype(x.dtype)
    sh = _bcast_cw(shift, c, w_phys).astype(x.dtype)
    wpt = _pack_w_partial(_flip_transpose_w(w)).astype(g.dtype)
    dx, dscale, dshift = _conv3x3_chw_dx(
        x, g, wpt, sc, sh, relu=relu, outer_padding=outer_padding, c=c,
        w_true=w_true, emit_padded=True,
    )
    dw_acc, db = _conv3x3_chw_dw(
        x, g, sc, sh, relu=relu, outer_padding=outer_padding, co=co,
        w_true=w_true,
    )
    dw = _unpack_dw_partial(dw_acc, c, co).astype(w.dtype)
    return (dx.astype(x.dtype), dw, db.astype(b.dtype),
            dscale.astype(scale.dtype), dshift.astype(shift.dtype))


conv3x3_chw_p.defvjp(_p_fwd_rule, _p_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv1x1_chw_add_p(x, w, b, res, w_true: int, want_stats: bool):
    """Padded-carry :func:`conv1x1_chw_add(_stats)`: inputs at physical
    width with the pad-fill contract; output pad columns carry the
    replicate-edge fill (safe for both outer paddings — zeros-mode
    consumers self-mask)."""
    co = w.shape[-1]
    wm = jnp.transpose(w.reshape(-1, co), (1, 0)).astype(x.dtype)
    return _conv1x1_chw_fwd(
        x, wm, b.reshape(co, 1).astype(x.dtype), res,
        want_stats=want_stats, w_true=w_true, emit_padded=True,
    )


def _p1_fwd_rule(x, w, b, res, w_true, want_stats):
    out = conv1x1_chw_add_p(x, w, b, res, w_true, want_stats)
    y = out[0] if want_stats else out
    return out, (x, w, b, y if want_stats else None)


def _p1_bwd_rule(w_true, want_stats, saved, cts):
    x, w, b, y = saved
    if want_stats:
        g, gs1, gs2 = cts
        g = _bn_corr(g, y, gs1, 2.0 * gs2, w_true=w_true)
    else:
        g = _mask_pad_cols(cts, w_true)
    dx, dw, db = _conv1x1_bwd_rule((x, w, b), g)
    return dx, dw, db, g


conv1x1_chw_add_p.defvjp(_p1_fwd_rule, _p1_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def upsample2_chw_p(x, w_true: int, fill: str):
    """Padded-carry nearest-2x upsample: x at physical width with valid
    ``w_true``; output at round_up(2*w_true, 128) physical width with
    ``fill`` ('edge' or 'zeros') in its pad columns, baked into the
    interleave matrix."""
    n, c, h, wp_ = x.shape
    # The backward reconstructs x's physical width as round_up_128(w_true)
    # (shapes can't ride the residue), so that equality is a contract:
    if wp_ != _round_up_128(w_true):
        raise ValueError(
            f"upsample2_chw_p: physical width {wp_} must be "
            f"round_up_128(w_true={w_true}) = {_round_up_128(w_true)}"
        )
    target = 2 * w_true + (-(2 * w_true)) % 128
    e = _up_e_matrix_p(wp_, w_true, target, fill, x.dtype)
    return _up2_fwd_call(x, e)


def _up_e_matrix_p(w_phys: int, w_true: int, target: int, fill: str, dtype):
    rows = jnp.arange(w_phys)[:, None]
    cols = jnp.arange(target)[None, :]
    valid = (rows < w_true) & ((cols // 2) == rows) & (cols < 2 * w_true)
    m = valid
    if fill == "edge":
        m = m | ((rows == w_true - 1) & (cols >= 2 * w_true))
    return m.astype(dtype)


def _up2_p_fwd_rule(x, w_true, fill):
    return upsample2_chw_p(x, w_true, fill), None


def _up2_p_bwd_rule(w_true, fill, res, g):
    del res
    # pad-column cotangents are zero by the gradient contract; E^T folds
    # nothing extra. Output dx at x's physical width, zero pads.
    n, c, h2, wf = g.shape
    # x's physical width is round_up_128(w_true) — enforced by the forward's
    # contract check, so this reconstruction is exact.
    x_phys = _round_up_128(w_true)
    e = _up_e_matrix_p(x_phys, w_true, wf, fill, g.dtype)
    dx = _up2_bwd_call(g, jnp.transpose(e, (1, 0)))
    return (dx.astype(g.dtype),)


def _round_up_128(v: int) -> int:
    return v + (-v) % 128


upsample2_chw_p.defvjp(_up2_p_fwd_rule, _up2_p_bwd_rule)


# --------------------------------------------------------------------------
# Fused nearest-2x upsample + norm/act + 3x3 conv ("up-conv", the subpixel
# transform). Every generator residual block starts with upsample -> BN ->
# ReLU -> conv3x3 (reference models/generators.py:95-111 +
# models/layers.py:301-311). Because nearest-2x commutes with the
# per-channel BN affine and with ReLU, the whole prefix runs at HALF
# resolution and the conv becomes FOUR phase convs with 2x2 COMBINED
# kernels:
#
#   y[2i+di, 2j+dj] = sum_{r,c in {0,1}} W2[(di,dj)][r,c] . x[i-1+di+r, j-1+dj+c]
#   W2[(0,*)][0]=K[0], W2[(0,*)][1]=K[1]+K[2];  W2[(1,*)][0]=K[0]+K[1],
#   W2[(1,*)][1]=K[2]   (same recombination on the column axis)
#
# vs. the unfused pair this is 4x fewer MXU cycles (the partial matmul's N
# is the HALF-res pixel count and its M packs all 4 phases: K=3C, M=8Co —
# 78x104 = 49% array utilization at the b6 shapes vs 18.6%) and ~6x less
# VPU stack traffic. The historical blocker — Mosaic has no interleaved
# stores — dissolves: column interleave rides the same E-scatter matmuls
# the upsample kernel already uses, and row interleave is the supported
# pair-reshape (`_rowint` pattern).
#
# The fused math regroups additions ((K1+K2)*x vs K1*x+K2*x), so it is NOT
# bit-identical to the unfused pair. It is therefore used in TRAINING only
# (generator.py gates on train + halo-free); the halo-cache raster engine
# and the one-pass eval oracle keep the unfused kernels so their bit-exact
# equality tests remain the correctness anchor (tests/test_halo.py).


def _upconv_selectors():
    """Row/column tap-recombination selectors.

    RS[di, q, dy] = 1 iff x slab row offset q (x row i-1+q) receives tap
    K[dy] for output row phase di; CS[dj, s, dx] likewise for the column
    partial slot s of column phase dj (s=0 pairs x[j-1] for dj=0 / x[j] for
    dj=1; s=1 pairs x[j] / x[j+1])."""
    import numpy as np

    rs = np.zeros((2, 3, 3), np.float32)
    rs[0, 0, 0] = 1          # di=0: x[i-1] <- K[0]
    rs[0, 1, 1] = rs[0, 1, 2] = 1  # di=0: x[i] <- K[1]+K[2]
    rs[1, 1, 0] = rs[1, 1, 1] = 1  # di=1: x[i] <- K[0]+K[1]
    rs[1, 2, 2] = 1          # di=1: x[i+1] <- K[2]
    cs = np.zeros((2, 2, 3), np.float32)
    cs[0, 0, 0] = 1          # dj=0, s=0: x[j-1] <- K[.,0]
    cs[0, 1, 1] = cs[0, 1, 2] = 1  # dj=0, s=1: x[j] <- K[.,1]+K[.,2]
    cs[1, 0, 0] = cs[1, 0, 1] = 1  # dj=1, s=0: x[j] <- K[.,0]+K[.,1]
    cs[1, 1, 2] = 1          # dj=1, s=1: x[j+1] <- K[.,2]
    return jnp.asarray(rs), jnp.asarray(cs)


def _pack_w_upconv(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,Co) -> (8Co, 3C) combined-phase forward weights: row
    m = ((di*2+dj)*2+s)*Co + co, column q*C + ci."""
    c, co = w.shape[2], w.shape[3]
    rs, cs = _upconv_selectors()
    t = jnp.einsum("aqd,bse,dexy->absyqx", rs, cs, w.astype(jnp.float32))
    return t.reshape(8 * co, 3 * c)


def _unpack_dw_upconv(acc: jnp.ndarray, c: int, co: int) -> jnp.ndarray:
    """Transpose of :func:`_pack_w_upconv`: (8Co, 3C) phase-tap gradients
    -> (3,3,C,Co)."""
    rs, cs = _upconv_selectors()
    t = acc.reshape(2, 2, 2, co, 3, c)  # (di, dj, s, co, q, ci)
    return jnp.einsum("aqd,bse,absyqx->dexy", rs, cs, t)


def _pack_wt_upconv_dx(w: jnp.ndarray) -> jnp.ndarray:
    """dx main-matmul weights (3C, 8Co): row o_c*C + ci (o_c = the column
    partial slot: 0 pairs shiftR, 1 direct, 2 pairs shiftL), column
    m2 = ((di*2+dj)*2 + qh)*Co + co where the g slab (di, qh) holds
    g rows 2i+di + 2*qh - (di==1 ? 2 : 0)  (see `_updx_kernel`)."""
    import numpy as np

    c, co = w.shape[2], w.shape[3]
    # row selector: slab (di, qh) -> dy taps
    rsb = np.zeros((2, 2, 3), np.float32)
    rsb[0, 0, 1] = rsb[0, 0, 2] = 1  # g[2i]   <- Ky[1]+Ky[2]
    rsb[0, 1, 0] = 1                  # g[2i+2] <- Ky[0]
    rsb[1, 0, 2] = 1                  # g[2i-1] <- Ky[2]
    rsb[1, 1, 0] = rsb[1, 1, 1] = 1  # g[2i+1] <- Ky[0]+Ky[1]
    # column selector: (dj, o_c) -> dx taps
    csb = np.zeros((2, 3, 3), np.float32)
    csb[0, 2, 0] = 1                  # da[j] += Kx[0]        * g0[j+1]
    csb[0, 1, 1] = csb[0, 1, 2] = 1  # da[j] += (Kx[1]+Kx[2]) * g0[j]
    csb[1, 1, 0] = csb[1, 1, 1] = 1  # da[j] += (Kx[0]+Kx[1]) * g1[j]
    csb[1, 0, 2] = 1                  # da[j] += Kx[2]        * g1[j-1]
    t = jnp.einsum(
        "aqd,boe,dexy->oxabqy", jnp.asarray(rsb), jnp.asarray(csb),
        w.astype(jnp.float32),
    )
    return t.reshape(3 * c, 8 * co)


def _pack_wt_upconv_fold(w: jnp.ndarray, dy: int) -> jnp.ndarray:
    """Row-fold weights (3C, 2Co) for the canvas top (dy=0) / bottom (dy=2)
    replicate folds of the up-conv dx: the K[dy] row part against g's first
    (last) full-res row in both column phases. Column index dj*Co + co."""
    import numpy as np

    c, co = w.shape[2], w.shape[3]
    csb = np.zeros((2, 3, 3), np.float32)
    csb[0, 2, 0] = 1
    csb[0, 1, 1] = csb[0, 1, 2] = 1
    csb[1, 1, 0] = csb[1, 1, 1] = 1
    csb[1, 0, 2] = 1
    t = jnp.einsum(
        "boe,exy->oxby", jnp.asarray(csb), w[dy].astype(jnp.float32)
    )
    return t.reshape(3 * c, 2 * co)


def _up_scatter_matrices(w_hp: int, w_true_h: int, w_f: int, fill: str, dtype):
    """E_dj (w_hp, w_f): place half-res column j at full-res column 2j+dj.
    E1 additionally carries the target pad fill (edge: copy full-res edge
    column 2*w_true_h-1, which is phase dj=1 of half col w_true_h-1)."""
    rows = jnp.arange(w_hp)[:, None]
    cols = jnp.arange(w_f)[None, :]
    es = []
    for dj in (0, 1):
        m = (rows < w_true_h) & (cols == 2 * rows + dj)
        if dj == 1 and fill == "edge":
            m = m | ((rows == w_true_h - 1) & (cols >= 2 * w_true_h))
        es.append(m.astype(dtype))
    return es


def _up_collect_matrices(w_f: int, w_true_h: int, w_hp: int, dtype):
    """C_dj (w_f, w_hp): gather full-res column phase dj back to half-res
    (the transpose of the no-fill scatter; pad-column cotangents are zero
    by the gradient contract, so no fill terms are needed)."""
    rows = jnp.arange(w_f)[:, None]
    cols = jnp.arange(w_hp)[None, :]
    cs = []
    for dj in (0, 1):
        m = (cols < w_true_h) & (rows == 2 * cols + dj)
        cs.append(m.astype(dtype))
    return cs


def _upconv_kernel(relu: bool, zeros_mode: bool, bh: int, w_true_h: int,
                   co: int, want_stats: bool, chunked: bool):
    """Forward. Grid (N, H_h/BH). Block outputs (1, Co, 2BH, Wf)."""

    def kernel(x_ref, top_ref, bot_ref, wp_ref, b_ref, sc_ref, sh_ref,
               e0_ref, e1_ref, *rest):
        rest = list(rest)
        y_ref = rest.pop(0)
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        wh = x_ref.shape[3]
        wf = e0_ref.shape[1]
        slab = _norm_slab(
            x_ref[0], _top_row(top_ref, t, chunked),
            _bot_row(bot_ref, t, nt, chunked),
            sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true_h,
        )
        s = _rows_stack(slab, bh)  # (3C, BH*Wh)
        p = lax.dot_general(
            wp_ref[:, :], s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8Co, BH*Wh)

        def plane(di, dj):
            base = ((di * 2 + dj) * 2) * co
            p0 = p[base : base + co].reshape(co, bh, wh)
            p1 = p[base + co : base + 2 * co].reshape(co, bh, wh)
            if dj == 0:
                fill = (jnp.zeros_like(p0[:, :, :1]) if zeros_mode
                        else p0[:, :, :1])
                return _shift_r(p0, fill) + p1
            fill = (jnp.zeros_like(p1[:, :, -1:])
                    if zeros_mode or w_true_h != wh else p1[:, :, -1:])
            return p0 + _shift_l(p1, fill)

        rows = []
        for di in (0, 1):
            r = lax.dot_general(
                plane(di, 0).reshape(co * bh, wh), e0_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + lax.dot_general(
                plane(di, 1).reshape(co * bh, wh), e1_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (Co*BH, Wf)
            rows.append((r.reshape(co, bh * wf) + b_ref[:, :]).reshape(co, bh, wf))
        # row interleave: (Co, BH, 2, Wf) pair concat + merge — the exact
        # `_rowint` pattern (expand_dims via None-indexing on a 3-D value;
        # a flat->(co,bh,1,wf) reshape lowers as an unsupported "sublane
        # broadcast" on Mosaic)
        y = jnp.concatenate(
            [rows[0][:, :, None, :], rows[1][:, :, None, :]], axis=2
        ).reshape(co, 2 * bh, wf)
        yc = y.astype(y_ref.dtype)
        y_ref[0, :, :, :] = yc
        if want_stats:
            _acc_stats(yc, co, 2 * bh, wf, 2 * w_true_h, rest[0], rest[1],
                       jnp.logical_and(n == 0, t == 0))

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "w_true_h", "want_stats"))
def _upconv3x3_fwd(x, wp, b, scale, shift, e0, e1, *, relu: bool,
                   outer_padding: str, w_true_h: int, want_stats: bool):
    """x (N, C, H, Whp) padded-carry -> y (N, Co, 2H, Wf) padded-carry."""
    zeros_mode = outer_padding == "constant"
    n, c, h, wh = x.shape
    co = wp.shape[0] // 8
    wf = e0.shape[1]
    # working set ~ slab + 3C stack + 8Co f32 partials + planes + y rows
    bh = _pick_bh(h, wh, 6 * c + 26 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    if chunked:
        tops = bots = x
        top_spec, bot_spec = _chunk_specs(c, bh, wh, h)
    else:
        tops, bots = _halo_rows(x, bh)
        top_spec = bot_spec = _halo_spec(c, h // bh, wh)
    kernel = _upconv_kernel(relu, zeros_mode, bh, w_true_h, co, want_stats,
                            chunked)
    out_specs = pl.BlockSpec(
        (1, co, 2 * bh, wf), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, co, 2 * h, wf), x.dtype)
    if want_stats:
        acc_spec = pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((co, 1), jnp.float32)
        out_specs = (out_specs, acc_spec, acc_spec)
        out_shape = (out_shape, acc_shape, acc_shape)
    out = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            pl.BlockSpec((8 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, wf), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, wf), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(x, tops, bots, wp, b, scale, shift, e0, e1)
    if want_stats:
        y, s1, s2 = out
        return y, s1[:, 0], s2[:, 0]
    return out


def _split_row_phases(flat2d, co, rows, wh):
    """(Co*rows_full, Wh) descattered gradient (rows_full = 2*rows) ->
    (even, odd) planes (Co, rows*Wh) flat: reshape pairs to lanes, slice
    the two aligned halves, flatten back. All supported Mosaic reshapes."""
    v = flat2d.reshape(co, rows, 2 * wh)
    even = v[:, :, 0:wh].reshape(co, rows * wh)
    odd = v[:, :, wh : 2 * wh].reshape(co, rows * wh)
    return even, odd


def _updx_kernel(relu: bool, zeros_mode: bool, bh: int, w_true_h: int,
                 c: int, co: int, g_chunked: bool):
    """dx. Grid (N, H_h/BH). g block (1, Co, 2BH, Wf) + one halo row above
    (full-res row 2r0-1) and below (row 2r0+2BH); x block (1, C, BH, Whp)
    for the act mask / accumulators."""

    def kernel(g_ref, gtop_ref, gbot_ref, x_ref, wt_ref, ftop_ref, fbot_ref,
               c0_ref, c1_ref, sc_ref, sh_ref, dx_ref, dsc_ref, dsh_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        wf = g_ref.shape[3]
        wh = c0_ref.shape[1]
        gb = g_ref[0]  # (Co, 2BH, Wf)
        top = _top_row(gtop_ref, t, g_chunked)
        bot = _bot_row(gbot_ref, t, nt, g_chunked)
        top = jnp.where(t == 0, 0.0, top).astype(top.dtype)
        bot = jnp.where(t == nt - 1, 0.0, bot).astype(bot.dtype)
        gall = jnp.concatenate([top[:, None, :], gb, bot[:, None, :]], axis=1)
        # column descatter to half-res, per column phase
        gflat = gall.reshape(co * (2 * bh + 2), wf)
        gd = []
        for cref in (c0_ref, c1_ref):
            d = lax.dot_general(
                gflat, cref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(gb.dtype)  # (Co*(2BH+2), Wh) — exact: 0/1 selection
            gd.append(d)
        # row de-interleave: local pairs (2k, 2k+1) = full rows
        # (2(r0+k)-1, 2(r0+k)) -> planeA[k] = g[2i-1], planeB[k] = g[2i]
        planes = [_split_row_phases(gd[dj], co, bh + 1, wh) for dj in (0, 1)]

        def g_slab(di, dj, qh):
            a, bpl = planes[dj]
            src = bpl if di == 0 else a  # di=0: g[2i(+2)], di=1: g[2i-1(+2)]
            return src[:, qh * wh : qh * wh + bh * wh]

        # order must match _pack_wt_upconv_dx: m2 = ((di*2+dj)*2+qh)*Co+co
        sg = jnp.concatenate(
            [g_slab(di, dj, qh)
             for di in (0, 1) for dj in (0, 1) for qh in (0, 1)],
            axis=0,
        )  # (8Co, BH*Wh)
        q = lax.dot_general(
            wt_ref[:, :], sg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3C, BH*Wh)
        q0 = q[0:c].reshape(c, bh, wh)
        q1 = q[c : 2 * c].reshape(c, bh, wh)
        q2 = q[2 * c :].reshape(c, bh, wh)
        if zeros_mode:
            fill_l = jnp.zeros_like(q0[:, :, :1])
            fill_r = jnp.zeros_like(q2[:, :, -1:])
        else:
            fill_l = q2[:, :, :1]
            fill_r = q0[:, :, -1:] if w_true_h == wh else jnp.zeros_like(
                q2[:, :, -1:]
            )
        da = _shift_r(q0, fill_l) + q1 + _shift_l(q2, fill_r)
        col = lax.broadcasted_iota(jnp.int32, (1, 1, wh), 2)
        if not zeros_mode and w_true_h != wh:
            da = da + jnp.where(col == w_true_h - 1, q0, 0.0)

        if not zeros_mode:
            # canvas row folds: da[0] += K[0]-part x g full row 0 (t==0);
            # da[H-1] += K[2]-part x g full row 2H-1 (t==nt-1)
            row = lax.broadcasted_iota(jnp.int32, (1, bh, 1), 1)
            (a0, b0), (a1, b1) = planes

            def row_fold(wf_ref, g0_dj0, g0_dj1):
                gpair = jnp.concatenate([g0_dj0, g0_dj1], axis=0)  # (2Co, Wh)
                tt = lax.dot_general(
                    wf_ref[:, :], gpair, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (3C, Wh)
                t0 = tt[0:c].reshape(c, 1, wh)
                t1 = tt[c : 2 * c].reshape(c, 1, wh)
                t2 = tt[2 * c :].reshape(c, 1, wh)
                f_l = t2[:, :, :1]
                f_r = t0[:, :, -1:] if w_true_h == wh else jnp.zeros_like(
                    t2[:, :, -1:]
                )
                fr = _shift_r(t0, f_l) + t1 + _shift_l(t2, f_r)
                if w_true_h != wh:
                    fr = fr + jnp.where(col == w_true_h - 1, t0, 0.0)
                return fr

            # g full row 0 = planeB[0]; g full row 2H-1 = planeA[BH]
            fold_top = row_fold(
                ftop_ref,
                b0[:, 0:wh], b1[:, 0:wh],
            )
            fold_bot = row_fold(
                fbot_ref,
                a0[:, bh * wh : (bh + 1) * wh], a1[:, bh * wh : (bh + 1) * wh],
            )
            da = (
                da
                + jnp.where(jnp.logical_and(row == 0, t == 0), fold_top, 0.0)
                + jnp.where(
                    jnp.logical_and(row == bh - 1, t == nt - 1), fold_bot, 0.0
                )
            )

        if w_true_h != wh:
            da = jnp.where(col >= w_true_h, 0.0, da)

        xb = x_ref[0]
        if relu:
            pre = xb * sc_ref[:, :, :] + sh_ref[:, :, :]
            da = da * (pre.astype(jnp.float32) > 0)
        dx_ref[0, :, :, :] = (da * sc_ref[:, :, :]).astype(dx_ref.dtype)
        dsc = jnp.sum((da * xb).reshape(c, bh * wh), axis=1, keepdims=True)
        dsh = jnp.sum(da.reshape(c, bh * wh), axis=1, keepdims=True)

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dsc_ref[:, :] = dsc
            dsh_ref[:, :] = dsh

        @pl.when(jnp.logical_not(first))
        def _():
            dsc_ref[:, :] = dsc_ref[:, :] + dsc
            dsh_ref[:, :] = dsh_ref[:, :] + dsh

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "c", "w_true_h"))
def _upconv3x3_dx(x, g, w, scale, shift, *, relu: bool, outer_padding: str,
                  c: int, w_true_h: int):
    zeros_mode = outer_padding == "constant"
    n, co, h2, wf = g.shape
    h = h2 // 2
    wh = x.shape[3]
    bh = _pick_bh(h, wh, 4 * c + 30 * co, x.dtype.itemsize)
    g_chunked = h2 % 8 == 0 and (2 * bh) % 8 == 0
    if g_chunked:
        gtops = gbots = g
        gtop_spec, gbot_spec = _chunk_specs(co, 2 * bh, wf, h2)
    else:
        gtops, gbots = _halo_rows(g, 2 * bh)
        gtop_spec = gbot_spec = _halo_spec(co, h2 // (2 * bh), wf)
    wt = _pack_wt_upconv_dx(w).astype(g.dtype)
    ftop = _pack_wt_upconv_fold(w, 0).astype(g.dtype)
    fbot = _pack_wt_upconv_fold(w, 2).astype(g.dtype)
    c0, c1 = _up_collect_matrices(wf, w_true_h, wh, g.dtype)
    kernel = _updx_kernel(relu, zeros_mode, bh, w_true_h, c, co, g_chunked)
    dx, dsc, dsh = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, co, 2 * bh, wf), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            gtop_spec,
            gbot_spec,
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 8 * co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 2 * co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 2 * co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, wh), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, wh), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c, h, wh), x.dtype),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(g, gtops, gbots, x, wt, ftop, fbot, c0, c1, scale, shift)
    return dx, dsc[:, 0], dsh[:, 0]


def _updw_kernel(relu: bool, zeros_mode: bool, bh: int, w_true_h: int,
                 c: int, co: int, chunked: bool):
    """dW2' (8Co, 3C) += Gc @ Sx^T per block (same accumulation scheme as
    `_dw_kernel`); db from the raw full-res gradient."""

    def kernel(x_ref, top_ref, bot_ref, g_ref, c0_ref, c1_ref, sc_ref,
               sh_ref, dw_ref, db_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        wh = x_ref.shape[3]
        wf = g_ref.shape[3]
        slab = _norm_slab(
            x_ref[0], _top_row(top_ref, t, chunked),
            _bot_row(bot_ref, t, nt, chunked),
            sc_ref, sh_ref, relu, zeros_mode, t, nt, bh, w_true_h,
        )
        sx = _rows_stack(slab, bh)  # (3C, BH*Wh)
        gb = g_ref[0]  # (Co, 2BH, Wf)
        gflat = gb.reshape(co * 2 * bh, wf)
        slabs = []
        for dj, cref in ((0, c0_ref), (1, c1_ref)):
            d = lax.dot_general(
                gflat, cref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(gb.dtype)  # (Co*2BH, Wh)
            even, odd = _split_row_phases(d, co, bh, wh)
            for di, plane in ((0, even), (1, odd)):
                g3 = plane.reshape(co, bh, wh)
                # edge folds via slice+concat, NOT a (1,1,W)/iota mask: on
                # this reshaped-chain value Mosaic's layout inference lowers
                # the mask broadcast as an unsupported "Sublane broadcast"
                # (b6-shape compile failure) — the direct-ref-read kernels
                # (_dw_kernel) get away with the mask form
                for s in (0, 1):
                    if dj == 0 and s == 0:
                        # tap x[j-1]: shift g left; left halo (x[-1]==x[0])
                        # folds g col 0 into Gc col 0
                        if zeros_mode:
                            gs = _shift_l(g3, jnp.zeros_like(g3[:, :, :1]))
                        else:
                            gs = jnp.concatenate(
                                [g3[:, :, :1] + g3[:, :, 1:2], g3[:, :, 2:],
                                 jnp.zeros_like(g3[:, :, :1])],
                                axis=-1,
                            )
                    elif dj == 1 and s == 1:
                        # tap x[j+1]: shift g right; right halo folds the
                        # last true column (only when width is exact — the
                        # lane-padded case already pairs g[w_true-1] with
                        # the edge value carried in column w_true)
                        gs = _shift_r(g3, jnp.zeros_like(g3[:, :, :1]))
                        if not zeros_mode and w_true_h == wh:
                            gs = jnp.concatenate(
                                [gs[:, :, : wh - 1],
                                 gs[:, :, wh - 1 :] + g3[:, :, wh - 1 :]],
                                axis=-1,
                            )
                    else:
                        gs = g3
                    slabs.append(((di, dj, s), gs.reshape(co, bh * wh)))
        # order m = ((di*2+dj)*2+s)*Co+co (matches _pack_w_upconv)
        slabs.sort(key=lambda kv: (kv[0][0] * 2 + kv[0][1]) * 2 + kv[0][2])
        gc = jnp.concatenate([kv[1] for kv in slabs], axis=0)  # (8Co, BH*Wh)
        acc = lax.dot_general(
            gc, sx, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (8Co, 3C)
        db = jnp.sum(
            gb.reshape(co, 2 * bh * wf).astype(jnp.float32), axis=1,
            keepdims=True,
        )

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc
            db_ref[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc
            db_ref[:, :] = db_ref[:, :] + db

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "relu", "outer_padding", "co", "w_true_h"))
def _upconv3x3_dw(x, g, scale, shift, *, relu: bool, outer_padding: str,
                  co: int, w_true_h: int):
    n, c, h, wh = x.shape
    wf = g.shape[3]
    bh = _pick_bh(h, wh, 6 * c + 24 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    if chunked:
        tops = bots = x
        top_spec, bot_spec = _chunk_specs(c, bh, wh, h)
    else:
        tops, bots = _halo_rows(x, bh)
        top_spec = bot_spec = _halo_spec(c, h // bh, wh)
    c0, c1 = _up_collect_matrices(wf, w_true_h, wh, g.dtype)
    kernel = _updw_kernel(relu, outer_padding == "constant", bh, w_true_h,
                          c, co, chunked)
    dw2, db = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            pl.BlockSpec((1, co, 2 * bh, wf), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, wh), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, wh), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * co, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, tops, bots, g, c0, c1, scale, shift)
    return dw2, db[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def upconv3x3_chw_p(x, w, b, scale, shift, relu: bool, outer_padding: str,
                    w_true_h: int, want_stats: bool):
    """Fused nearest-2x upsample -> per-channel norm -> ReLU -> local-pad
    3x3 conv, padded-carry: x (N, C, H, round128(w_true_h)) with valid
    width ``w_true_h`` -> y (N, Co, 2H, round128(2*w_true_h)) with valid
    width ``2*w_true_h`` and the outer-padding fill in its pad columns.
    Equals ``conv3x3_chw_p(upsample2_chw_p(x, ...), ...)`` up to the float
    regrouping of the combined 2x2 kernels (tests/test_upconv.py). With
    ``want_stats`` also returns the output's (sum, sum_sq) per channel."""
    if x.shape[3] != _round_up_128(w_true_h):
        raise ValueError(
            f"upconv3x3_chw_p: physical width {x.shape[3]} must be "
            f"round_up_128(w_true_h={w_true_h})"
        )
    c, co = w.shape[2], w.shape[3]
    wp = _pack_w_upconv(w).astype(x.dtype)
    sc = _bcast_cw(scale, c, x.shape[3]).astype(x.dtype)
    sh = _bcast_cw(shift, c, x.shape[3]).astype(x.dtype)
    wf = _round_up_128(2 * w_true_h)
    fill = "zeros" if outer_padding == "constant" else "edge"
    e0, e1 = _up_scatter_matrices(x.shape[3], w_true_h, wf, fill, x.dtype)
    return _upconv3x3_fwd(
        x, wp, b.reshape(co, 1).astype(x.dtype), sc, sh, e0, e1,
        relu=relu, outer_padding=outer_padding, w_true_h=w_true_h,
        want_stats=want_stats,
    )


def _upconv_fwd_rule(x, w, b, scale, shift, relu, outer_padding, w_true_h,
                     want_stats):
    out = upconv3x3_chw_p(x, w, b, scale, shift, relu, outer_padding,
                          w_true_h, want_stats)
    y = out[0] if want_stats else out
    return out, (x, w, b, scale, shift, y if want_stats else None)


def _upconv_bwd_rule(relu, outer_padding, w_true_h, want_stats, res, cts):
    x, w, b, scale, shift, y = res
    if want_stats:
        g, gs1, gs2 = cts
        g = _bn_corr(g, y, gs1, 2.0 * gs2, w_true=2 * w_true_h)
    else:
        g = _mask_pad_cols(cts, 2 * w_true_h)
    c, co = w.shape[2], w.shape[3]
    sc = _bcast_cw(scale, c, x.shape[3]).astype(x.dtype)
    sh = _bcast_cw(shift, c, x.shape[3]).astype(x.dtype)
    dx, dscale, dshift = _upconv3x3_dx(
        x, g, w, sc, sh, relu=relu, outer_padding=outer_padding, c=c,
        w_true_h=w_true_h,
    )
    dw2, db = _upconv3x3_dw(
        x, g, sc, sh, relu=relu, outer_padding=outer_padding, co=co,
        w_true_h=w_true_h,
    )
    dw = _unpack_dw_upconv(dw2, c, co).astype(w.dtype)
    return (dx.astype(x.dtype), dw, db.astype(b.dtype),
            dscale.astype(scale.dtype), dshift.astype(shift.dtype))


upconv3x3_chw_p.defvjp(_upconv_fwd_rule, _upconv_bwd_rule)


# --------------------------------------------------------------------------
# Fused up-conv, HALO-CACHE variant (eval raster engine, `fuse_up='all'`).
#
# The cross-step halo protocol scales down by exactly 2 for a fused block's
# conv1: nearest-2x duplicates rows/columns, so the full-res halo row the
# unfused site caches (merged row (gh-1)*hp_f - 1, an ODD index since hp_f
# is even) IS half-res row (gh-1)*hp_h - 1, and likewise the v column and
# the row-buffer read offset ((gw-1)*wp_f*col = 2*(gw-1)*wp_h*col). The
# fused site therefore stores POST-NORM values at HALF resolution with the
# same formulas — 4x less halo state — and the kernel injects them exactly
# like `_conv_halo_kernel` does, on the half-res slab.


def _upconv_halo_kernel(relu: bool, zeros_mode: bool, bh: int, w_true_h: int,
                        c: int, co: int, use_rstrip: bool, chunked: bool):
    def kernel(*refs):
        refs = list(refs)
        x_ref, top_ref, bot_ref = refs[:3]
        refs = refs[3:]
        inj_ref = refs.pop(0) if chunked else None
        l_ref = refs.pop(0)
        r_ref = refs.pop(0) if use_rstrip else None
        wp_ref, b_ref, sc_ref, sh_ref, e0_ref, e1_ref, y_ref = refs
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        wh = x_ref.shape[3]
        wf = e0_ref.shape[1]
        if chunked:
            top_pn = jnp.where(
                t == 0, inj_ref[0, :, 0, :], top_ref[0][:, 7, :]
            ).astype(x_ref.dtype)
        else:
            top_pn = _halo_row_at(top_ref, t)
        slab = _norm_slab(
            x_ref[0], top_pn, _bot_row(bot_ref, t, nt, chunked), sc_ref,
            sh_ref, relu, zeros_mode, t, nt, bh, w_true_h, halo_top=True,
        )
        # restore the injected (already-normed) top row for the first block
        row = lax.broadcasted_iota(jnp.int32, (1, bh + 2, 1), 1)
        slab = jnp.where(
            jnp.logical_and(row == 0, t == 0),
            top_pn[:, None, :].astype(slab.dtype), slab,
        ).astype(slab.dtype)
        s = _rows_stack(slab, bh)  # (3C, BH*Wh)
        p = lax.dot_general(
            wp_ref[:, :], s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8Co, BH*Wh)

        def plane(di, dj):
            base = ((di * 2 + dj) * 2) * co
            p0 = p[base : base + co].reshape(co, bh, wh)
            p1 = p[base + co : base + 2 * co].reshape(co, bh, wh)
            if dj == 0:
                # left halo column: the (di, dj=0, s=0) tap block (pairs
                # x[j-1]) against the row-stacked strip — same fill-matmul
                # pattern as `_conv_halo_kernel`
                fill = lax.dot_general(
                    wp_ref[base : base + co, :], l_ref[0],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(co, bh, 1)
                return _shift_r(p0, fill) + p1
            if use_rstrip:  # w_true_h == Wh: right halo via its own strip
                fill = lax.dot_general(
                    wp_ref[base + co : base + 2 * co, :], r_ref[0],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(co, bh, 1)
            else:  # lane-padded: the slab pad columns carry the halo
                fill = jnp.zeros_like(p1[:, :, -1:])
            return p0 + _shift_l(p1, fill)

        rows = []
        for di in (0, 1):
            r = lax.dot_general(
                plane(di, 0).reshape(co * bh, wh), e0_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + lax.dot_general(
                plane(di, 1).reshape(co * bh, wh), e1_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (Co*BH, Wf)
            rows.append((r.reshape(co, bh * wf) + b_ref[:, :]).reshape(co, bh, wf))
        y = jnp.concatenate(
            [rows[0][:, :, None, :], rows[1][:, :, None, :]], axis=2
        ).reshape(co, 2 * bh, wf)
        y_ref[0, :, :, :] = y.astype(y_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("relu", "outer_padding"))
def _upconv3x3_fwd_halo(x, wp, b, scale, shift, e0, e1, top_pn, lstack,
                        rstack, *, relu: bool, outer_padding: str):
    """Half-res x (N,C,H,Wh_true) raw; top_pn (N,C,Wh_pad) POST-norm
    half-res top halo row (canvas cols 0..Wh-1, corner at col w_true_h when
    lane-padded); lstack/rstack (N, H, 3C) POST-norm half-res row-stacked
    halo column strips. Output (N, Co, 2H, Wf) lane-padded full-res."""
    w_true_h = x.shape[3]
    zeros_mode = outer_padding == "constant"
    x = _pad_w_lanes(x, "zeros" if zeros_mode else "edge")
    if x.shape[3] != w_true_h and scale.shape[-1] == w_true_h:
        scale = _pad_w_lanes(scale, "edge")
        shift = _pad_w_lanes(shift, "edge")
    n, c, h, wh = x.shape
    co = wp.shape[0] // 8
    wf = e0.shape[1]
    bh = _pick_bh(h, wh, 6 * c + 26 * co, x.dtype.itemsize)
    chunked = h % 8 == 0
    use_rstrip = w_true_h == wh
    kernel = _upconv_halo_kernel(relu, zeros_mode, bh, w_true_h, c, co,
                                 use_rstrip, chunked)
    strip_spec = pl.BlockSpec(
        (1, bh, 3 * c), lambda n, t: (n, t, 0), memory_space=pltpu.VMEM
    )
    nt = h // bh
    if chunked:
        top_spec, bot_spec = _chunk_specs(c, bh, wh, h)
        inj_spec = pl.BlockSpec(
            (1, c, 1, wh), lambda n, t: (n, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0),
                         memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            inj_spec,
            strip_spec,
        ]
        args = [x, x, x, top_pn[:, :, None, :], lstack]
    else:
        tops, bots = _halo_rows(x, bh)
        tops = jnp.concatenate([top_pn[:, :, None, :], tops[:, :, 1:]], axis=2)
        in_specs = [
            pl.BlockSpec((1, c, bh, wh), lambda n, t: (n, 0, t, 0),
                         memory_space=pltpu.VMEM),
            _halo_spec(c, nt, wh),
            _halo_spec(c, nt, wh),
            strip_spec,
        ]
        args = [x, tops, bots, lstack]
    if use_rstrip:
        in_specs.append(strip_spec)
        args.append(rstack)
    in_specs += [
        pl.BlockSpec((8 * co, 3 * c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 1, wh), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wh, wf), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wh, wf), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [wp, b, scale, shift, e0, e1]
    return pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, co, 2 * bh, wf), lambda n, t: (n, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, co, 2 * h, wf), x.dtype),
        interpret=_interpret(),
    )(*args)


def chw_upconv_halo_step(x, w, b, scale, shift, relu, outer_padding, site,
                         pos, gh, gw):
    """One stateful raster step of the FUSED up-conv (see block comment
    above): ``x`` (N, C, Hm_h, Wm_h) is the RAW half-res block input,
    ``site`` the HALF-RES SiteState (same NHWC buffer format and
    ``finalize_row`` semantics as the unfused engine, just at patch_res/2 —
    see generator_site_specs). Returns (full-res y (N, Co, 2Hm_h, 2Wm_h),
    updated site). Reference semantics: models/layers.py:78-143 applied to
    the conv1 input of an upsample->BN->ReLU->conv block
    (models/layers.py:301-311)."""
    from infinite_texture_gans_tpu.ops.padding import SiteState

    n, c, hm, wm = x.shape
    hp, wp_ = hm // gh, wm // gw
    co = w.shape[-1]
    zeros = outer_padding == "constant"

    def pn(a):  # post-norm domain for the tiny injection/cache arrays
        a = a * scale.reshape(1, c, 1, 1) + shift.reshape(1, c, 1, 1)
        return jnp.maximum(a, 0.0).astype(x.dtype) if relu else a.astype(x.dtype)

    # --- assemble post-norm half-res halo pieces -------------------------
    v_pn = jnp.transpose(site.v, (0, 3, 1, 2)).astype(x.dtype)  # (N,C,Hm,1)
    left = jnp.where(
        pos.first_col,
        jnp.zeros_like(v_pn) if zeros else pn(x[:, :, :, :1]),
        v_pn,
    )
    right = jnp.zeros_like(left) if zeros else pn(x[:, :, :, -1:])

    offset = (gw - 1) * wp_ * pos.col
    read = lax.dynamic_slice_in_dim(site.row_read, offset, wm + 2, axis=2)
    read_chw = jnp.transpose(read, (0, 3, 1, 2)).astype(x.dtype)  # (N,C,1,Wm+2)
    if zeros:
        own_top = jnp.zeros_like(read_chw)
    else:  # replicate: [left[0], pn(x row 0), right[0]]
        own_top = jnp.concatenate(
            [left[:, :, :1, :], pn(x[:, :, :1, :]), right[:, :, :1, :]], axis=3
        )
    top = jnp.where(pos.first_row, own_top, read_chw)  # (N, C, 1, Wm+2)

    # column strips spanning padded rows -1..Hm (post-norm)
    def strips(corner_t, col, corner_b):
        full = jnp.concatenate([corner_t, col[:, :, :, 0], corner_b], axis=2)
        stk = jnp.concatenate(
            [full[:, :, dy : dy + hm] for dy in range(3)], axis=1
        )  # (N, 3C, Hm)
        return jnp.transpose(stk, (0, 2, 1))  # (N, Hm, 3C): Mosaic block rule

    bl = jnp.zeros_like(left[:, :, -1, :]) if zeros else left[:, :, -1, :]
    br = jnp.zeros_like(right[:, :, -1, :]) if zeros else right[:, :, -1, :]
    lstack = strips(top[:, :, 0, :1], left, bl)
    rstack = strips(top[:, :, 0, -1:], right, br)

    # top row for the kernel: canvas cols 0..Wm-1, lane-padded with the
    # top-right corner placed at column Wm (see _upconv3x3_fwd_halo)
    top_k = top[:, :, 0, 1 : wm + 1]
    pad = (-wm) % 128
    if pad:
        top_k = jnp.pad(top_k, ((0, 0), (0, 0), (0, pad)))
        top_k = top_k.at[:, :, wm].set(top[:, :, 0, wm + 1])

    wp_k = _pack_w_upconv(w).astype(x.dtype)
    wh_pad = _round_up_128(wm)
    sc = _bcast_cw(scale, c, wm).astype(x.dtype)
    sh = _bcast_cw(shift, c, wm).astype(x.dtype)
    wf = _round_up_128(2 * wm)
    fill = "zeros" if zeros else "edge"
    e0, e1 = _up_scatter_matrices(wh_pad, wm, wf, fill, x.dtype)
    y = _upconv3x3_fwd_halo(
        x, wp_k, b.reshape(co, 1).astype(x.dtype), sc, sh, e0, e1, top_k,
        lstack, rstack, relu=relu, outer_padding=outer_padding,
    )[..., : 2 * wm]

    # --- cache updates (post-norm half-res, NHWC buffer format) ----------
    v_new = pn(x[:, :, :, (gw - 1) * wp_ - 1 : (gw - 1) * wp_])
    row_slice = pn(x[:, :, (gh - 1) * hp - 1 : (gh - 1) * hp, :])
    row_write = lax.dynamic_update_slice_in_dim(
        site.row_write,
        jnp.transpose(row_slice, (0, 2, 3, 1)).astype(site.row_write.dtype),
        offset + 1,
        axis=2,
    )
    new_site = SiteState(
        v=jnp.transpose(v_new, (0, 2, 3, 1)).astype(site.v.dtype),
        row_read=site.row_read,
        row_write=row_write,
    )
    return y, new_site


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1x1_chw_p(x, w, b, w_true: int):
    """Plain padded-carry 1x1 conv (no residual, no stats): the fused-up
    ResBlock shortcut runs it at HALF resolution (conv1x1 commutes with
    nearest-2x) before :func:`upsample2_chw_add_p`. Pointwise, so the
    input's pad-column fill maps straight to a valid output fill — no
    padfix matmul needed (zeros-mode pads become `bias`, don't-care under
    the consumers' self-masking)."""
    co = w.shape[-1]
    wm = jnp.transpose(w.reshape(-1, co), (1, 0)).astype(x.dtype)
    return _conv1x1_chw_fwd(
        x, wm, b.reshape(co, 1).astype(x.dtype), None,
        want_stats=False, w_true=x.shape[3], emit_padded=True,
    )


def _p1x1_fwd_rule(x, w, b, w_true):
    return conv1x1_chw_p(x, w, b, w_true), (x, w, b)


def _p1x1_bwd_rule(w_true, saved, g):
    g = _mask_pad_cols(g, w_true)
    return _conv1x1_bwd_rule(saved, g)


conv1x1_chw_p.defvjp(_p1x1_fwd_rule, _p1x1_bwd_rule)


def _up2_add_kernel(bh_half: int, w_out: int, w_true_f: int,
                    want_stats: bool):
    def kernel(x_ref, e_ref, res_ref, y_ref, *stats):
        n = pl.program_id(0)
        t = pl.program_id(1)
        x = _rowint(x_ref[0])  # (C, 2BH, Wh)
        c = x.shape[0]
        wh = x.shape[2]
        y = lax.dot_general(
            x.reshape(c * 2 * bh_half, wh), e_ref[:, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(c, 2 * bh_half, w_out) + res_ref[0].astype(jnp.float32)
        yc = y.astype(y_ref.dtype)
        y_ref[0, :, :, :] = yc
        if want_stats:
            _acc_stats(yc, c, 2 * bh_half, w_out, w_true_f, stats[0],
                       stats[1], jnp.logical_and(n == 0, t == 0))

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def upsample2_chw_add_p(x, res, w_true_h: int, fill: str, want_stats: bool):
    """y = nearest-2x(x) + res, padded-carry: x (N, C, H, round128(w_true_h)),
    res (N, C, 2H, round128(2*w_true_h)) — the fused-up ResBlock's residual
    join (shortcut upsample + add + the block's output BN statistics in one
    kernel; the unfused path's `conv1x1_chw_add_p` equivalent)."""
    n, c, h, wp_ = x.shape
    if wp_ != _round_up_128(w_true_h):
        raise ValueError(
            f"upsample2_chw_add_p: physical width {wp_} must be "
            f"round_up_128(w_true_h={w_true_h})"
        )
    target = _round_up_128(2 * w_true_h)
    if res.shape != (n, c, 2 * h, target):
        raise ValueError(f"res shape {res.shape} != {(n, c, 2 * h, target)}")
    e = _up_e_matrix_p(wp_, w_true_h, target, fill, x.dtype)
    bh_half = _pick_bh(h, 2 * wp_, 12 * c, x.dtype.itemsize)
    out_specs = pl.BlockSpec(
        (1, c, 2 * bh_half, target), lambda n, t: (n, 0, t, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n, c, 2 * h, target), x.dtype)
    if want_stats:
        acc_spec = pl.BlockSpec((c, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((c, 1), jnp.float32)
        out_specs = (out_specs, acc_spec, acc_spec)
        out_shape = (out_shape, acc_shape, acc_shape)
    out = pl.pallas_call(
        _up2_add_kernel(bh_half, target, 2 * w_true_h, want_stats),
        grid=(n, h // bh_half),
        in_specs=[
            pl.BlockSpec((1, c, bh_half, wp_), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp_, target), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 2 * bh_half, target), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(x, e, res)
    if want_stats:
        y, s1, s2 = out
        return y, s1[:, 0], s2[:, 0]
    return out


def _up2add_fwd_rule(x, res, w_true_h, fill, want_stats):
    out = upsample2_chw_add_p(x, res, w_true_h, fill, want_stats)
    y = out[0] if want_stats else out
    return out, (y if want_stats else None,)


def _up2add_bwd_rule(w_true_h, fill, want_stats, saved, cts):
    (y,) = saved
    if want_stats:
        g, gs1, gs2 = cts
        g = _bn_corr(g, y, gs1, 2.0 * gs2, w_true=2 * w_true_h)
    else:
        g = _mask_pad_cols(cts, 2 * w_true_h)
    x_phys = _round_up_128(w_true_h)
    e = _up_e_matrix_p(x_phys, w_true_h, g.shape[3], fill, g.dtype)
    dx = _up2_bwd_call(g, jnp.transpose(e, (1, 0)))
    return dx.astype(g.dtype), g


upsample2_chw_add_p.defvjp(_up2add_fwd_rule, _up2add_bwd_rule)


# --------------------------------------------------------------------------
# 1x1 conv (the ResBlock shortcut) on channels-major arrays.


def _conv1x1_kernel(bh: int, with_res: bool, w_true: int, co: int,
                    want_stats: bool = False, padfix: bool = False):
    def kernel(x_ref, w_ref, b_ref, *rest):
        rest = list(rest)
        res_ref = rest.pop(0) if with_res else None
        f_ref = rest.pop(0) if padfix else None
        y_ref = rest.pop(0)
        w = x_ref.shape[3]
        xm = x_ref[0].reshape(-1, bh * w)  # (C, BH*W)
        y = lax.dot_general(
            w_ref[:, :], xm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[:, :]
        if with_res:
            y = y + res_ref[0].reshape(-1, bh * w)
        if padfix:
            y = lax.dot_general(
                y.reshape(co * bh, w), f_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(co, bh * w)
        yc = y.reshape(-1, bh, w).astype(y_ref.dtype)
        y_ref[0, :, :, :] = yc
        if want_stats:
            _acc_stats(
                yc, co, bh, w, w_true, rest[0], rest[1],
                jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("want_stats", "w_true", "emit_padded"))
def _conv1x1_chw_fwd(x, wm, b, res=None, *, want_stats: bool = False,
                     w_true: int = None, emit_padded: bool = False):
    pre_padded = w_true is not None
    if not pre_padded:
        w_true = x.shape[3]
        x = _pad_w_lanes(x, "zeros")
    n, c, h, w = x.shape
    co = wm.shape[0]
    bh = _pick_bh(h, w, 2 * c + 2 * co, x.dtype.itemsize)
    in_specs = [
        pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co, c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, wm, b]
    if res is not None:
        in_specs.append(
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM)
        )
        args.append(res if pre_padded else _pad_w_lanes(res, "zeros"))
    padfix = emit_padded and w_true != w
    if padfix:
        in_specs.append(
            pl.BlockSpec((w, w), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(_padfix_matrix(w, w_true, x.dtype))
    out_specs = pl.BlockSpec(
        (1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, co, h, w), x.dtype)
    if want_stats:
        acc_spec = pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((co, 1), jnp.float32)
        out_specs = (out_specs, acc_spec, acc_spec)
        out_shape = (out_shape, acc_shape, acc_shape)
    out = pl.pallas_call(
        _conv1x1_kernel(bh, res is not None, w_true, co, want_stats, padfix),
        grid=(n, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    sl = slice(None) if emit_padded else slice(0, w_true)
    if want_stats:
        y, s1, s2 = out
        return y[..., sl], s1[:, 0], s2[:, 0]
    return out[..., sl]


def _dw1x1_kernel(bh: int):
    def kernel(x_ref, g_ref, dw_ref, db_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        w = x_ref.shape[3]
        xm = x_ref[0].reshape(-1, bh * w)       # (C, BH*W)
        g = g_ref[0].reshape(-1, bh * w)        # (Co, BH*W)
        acc = lax.dot_general(
            g, xm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Co, C)
        db = jnp.sum(g.astype(jnp.float32), axis=1, keepdims=True)  # (Co, 1)
        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc
            db_ref[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc
            db_ref[:, :] = db_ref[:, :] + db

    return kernel


@functools.partial(jax.jit, static_argnames=("co",))
def _conv1x1_chw_dw(x, g, *, co: int):
    """(dW, db) — db accumulates in-kernel so no XLA reduce ever touches the
    big gradient (the reduce's layout preference forced relayout copies)."""
    if x.shape[3] % 128:
        x = _pad_w_lanes(x, "zeros")
        g = _pad_w_lanes(g, "zeros")
    n, c, h, w = x.shape
    bh = _pick_bh(h, w, 2 * c + 2 * co, x.dtype.itemsize)
    return pl.pallas_call(
        _dw1x1_kernel(bh),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, c, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, bh, w), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((co, c), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((co, c), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ),
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
    dwm, db = _conv1x1_chw_dw(x, g, co=co)  # (Co, C), (Co, 1)
    dw = jnp.transpose(dwm, (1, 0)).reshape(w.shape).astype(w.dtype)
    return dx.astype(x.dtype), dw, db[:, 0].astype(b.dtype)


conv1x1_chw.defvjp(_conv1x1_fwd_rule, _conv1x1_bwd_rule)


@jax.custom_vjp
def conv1x1_chw_add(x, w, b, res):
    """y = 1x1 conv + res: the ResBlock shortcut FUSED with the residual
    add (reference models/layers.py:320-321 ``out + shortcut``) — one VMEM
    pass instead of a separate XLA elementwise add (which forces an extra
    HBM round-trip and a layout relayout between the Pallas calls)."""
    co = w.shape[-1]
    wm = jnp.transpose(w.reshape(-1, co), (1, 0)).astype(x.dtype)
    return _conv1x1_chw_fwd(x, wm, b.reshape(co, 1).astype(x.dtype), res)


def _conv1x1_add_fwd_rule(x, w, b, res):
    return conv1x1_chw_add(x, w, b, res), (x, w, b)


def _conv1x1_add_bwd_rule(saved, g):
    dx, dw, db = _conv1x1_bwd_rule(saved, g)
    return dx, dw, db, g


conv1x1_chw_add.defvjp(_conv1x1_add_fwd_rule, _conv1x1_add_bwd_rule)


@jax.custom_vjp
def conv1x1_chw_add_stats(x, w, b, res):
    """:func:`conv1x1_chw_add` + per-channel (sum, sum_sq) f32 statistics of
    the output — the residual block's output IS the next block's BatchNorm
    input (nearest-2x upsampling preserves per-channel mean and E[x^2], so
    the stats survive the upsample between blocks unchanged). Returns
    (y, s1, s2)."""
    co = w.shape[-1]
    wm = jnp.transpose(w.reshape(-1, co), (1, 0)).astype(x.dtype)
    return _conv1x1_chw_fwd(
        x, wm, b.reshape(co, 1).astype(x.dtype), res, want_stats=True
    )


def _conv1x1_add_stats_fwd_rule(x, w, b, res):
    y, s1, s2 = conv1x1_chw_add_stats(x, w, b, res)
    return (y, s1, s2), (x, w, b, y)


def _conv1x1_add_stats_bwd_rule(saved, cts):
    x, w, b, y = saved
    g, gs1, gs2 = cts
    co = w.shape[-1]
    corr1 = gs1.reshape(1, co, 1, 1)
    corr2 = (2.0 * gs2).reshape(1, co, 1, 1)
    g = (g.astype(jnp.float32) + corr1 + corr2 * y.astype(jnp.float32)).astype(
        g.dtype
    )
    dx, dw, db = _conv1x1_bwd_rule((x, w, b), g)
    return dx, dw, db, g


conv1x1_chw_add_stats.defvjp(_conv1x1_add_stats_fwd_rule, _conv1x1_add_stats_bwd_rule)


# --------------------------------------------------------------------------
# Nearest-2x upsample on channels-major arrays, as a Pallas kernel.
#
# Why: XLA compiles jnp.repeat as broadcast+reshape and prefers non-default
# layouts ({2,0,3,1} etc.) for that fusion, which forces a pair of relayout
# copies around EVERY adjacent Pallas conv (device traces: ~1.5-2 ms/step of
# the Exp-1 recipe). A Pallas kernel pins default layouts on both sides.
#
# Mosaic has no lane-interleave primitive, so columns are duplicated by a
# tiny 0/1 replication matmul on the MXU (y = x @ E with E[b, 2b] = E[b,
# 2b+1] = 1 — ~N*C*H*W*W/2 MACs, < 0.1 ms at the Exp-1 shapes) and rows by
# the supported stack+reshape interleave. The backward is the exact
# transpose: column pair-sum via E^T and row pair-sum via the inverse
# reshape.


def _up_e_matrix(w_half: int, w_true_half: int, dtype) -> jnp.ndarray:
    """(w_half, 2*w_half) 0/1 interleave matrix; rows >= w_true_half (lane
    padding) stay zero."""
    rows = jnp.arange(w_half)
    cols = jnp.arange(2 * w_half)
    valid = rows[:, None] < w_true_half
    hit = (cols[None, :] // 2) == rows[:, None]
    return (valid & hit).astype(dtype)


def _rowint(x: jnp.ndarray) -> jnp.ndarray:
    """(C, BH, W) -> (C, 2BH, W) nearest row duplication (supported Mosaic
    reshape: minor dim untouched)."""
    c, bh, w = x.shape
    return jnp.concatenate([x[:, :, None, :], x[:, :, None, :]], axis=2).reshape(
        c, 2 * bh, w
    )


def _up2_kernel(bh_half: int, w_out: int):
    def kernel(x_ref, e_ref, y_ref):
        x = _rowint(x_ref[0])  # (C, 2BH, Wh)
        c = x.shape[0]
        wh = x.shape[2]
        y = lax.dot_general(
            x.reshape(c * 2 * bh_half, wh), e_ref[:, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y_ref[0, :, :, :] = y.reshape(c, 2 * bh_half, w_out).astype(y_ref.dtype)

    return kernel


def _up2_bwd_kernel(bh_half: int, w_out: int):
    def kernel(g_ref, et_ref, dx_ref):
        g = g_ref[0]  # (C, 2BH, Wf)
        c = g.shape[0]
        wf = g.shape[2]
        cols = lax.dot_general(
            g.reshape(c * 2 * bh_half, wf), et_ref[:, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(c, bh_half, 2, w_out)  # inverse row interleave
        dx_ref[0, :, :, :] = (cols[:, :, 0, :] + cols[:, :, 1, :]).astype(
            dx_ref.dtype
        )

    return kernel


@jax.jit
def _up2_fwd_call(x, e):
    n, c, h, w = x.shape
    wh, w_out = e.shape
    # working set per block ~ input + interleaved + 4x output rows
    bh_half = _pick_bh(h, 2 * wh, 10 * c, x.dtype.itemsize)
    return pl.pallas_call(
        _up2_kernel(bh_half, w_out),
        grid=(n, h // bh_half),
        in_specs=[
            pl.BlockSpec((1, c, bh_half, wh), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, w_out), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 2 * bh_half, w_out), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, 2 * h, w_out), x.dtype),
        interpret=_interpret(),
    )(x, e)


@jax.jit
def _up2_bwd_call(g, et):
    n, c, h2, wf = g.shape
    w_out = et.shape[1]
    bh_half = _pick_bh(h2 // 2, wf, 10 * c, g.dtype.itemsize)
    return pl.pallas_call(
        _up2_bwd_kernel(bh_half, w_out),
        grid=(n, h2 // (2 * bh_half)),
        in_specs=[
            pl.BlockSpec((1, c, 2 * bh_half, wf), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wf, w_out), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, bh_half, w_out), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h2 // 2, w_out), g.dtype),
        interpret=_interpret(),
    )(g, et)


@jax.custom_vjp
def upsample2_chw(x):
    """Nearest-2x upsample of (N, C, H, W), Pallas-native (default layouts
    on both sides — no XLA relayout copies). Equivalent of the reference's
    nn.Upsample(scale_factor=2, mode='nearest'), models/generators.py:54."""
    w_true = x.shape[3]
    xp = _pad_w_lanes(x, "zeros")
    e = _up_e_matrix(xp.shape[3], w_true, xp.dtype)
    y = _up2_fwd_call(xp, e)
    return y[..., : 2 * w_true]


def _up2_fwd_rule(x):
    return upsample2_chw(x), None


def _up2_bwd_rule(res, g):
    del res  # shape/dtype derive from the cotangent itself
    w_true = g.shape[3] // 2
    gp = _pad_w_lanes(g, "zeros")
    if gp.shape[3] % 2:  # keep the half width even after padding
        gp = jnp.pad(gp, [(0, 0)] * 3 + [(0, 1)])
    et = jnp.transpose(_up_e_matrix(gp.shape[3] // 2, w_true, gp.dtype), (1, 0))
    dx = _up2_bwd_call(gp, et)
    return (dx[..., :w_true].astype(g.dtype),)


upsample2_chw.defvjp(_up2_fwd_rule, _up2_bwd_rule)


# --------------------------------------------------------------------------
# Discriminator stem: 4x4 / stride-2 / pad-1 conv on a 3-channel image.
#
# Status: parity-tested but OFF by default. The hypothesis was that XLA's
# NHWC conv on C=3 inputs (lane-padded ~43x) was worth ~2.6 ms/step; the
# round-3 v5e trace disproved it — after the BN-stat/upsample fusions
# landed, XLA runs conv0 inside its big fusions for ~1.5 ms/step total,
# while this stem costs 1.7 ms of kernel time plus ~1.1 ms of NCHW
# boundary relayouts (25.2 -> 26.9 ms step with it on). Kept because the
# kernels are correct at all shapes/dtypes and the tradeoff may flip where
# conv0 can't fuse. Channels-major Pallas scheme:
#
#   * columns: one 0/1 selection matmul  P = rows @ Mp,  Mp (W, 4*BW) with
#     Mp[s, dx*BW + j] = 1 iff s == 2j+dx-1 — extracts all four column taps
#     at output stride 2 (canvas zero-padding = absent rows);
#   * rows: taps 2i+dy-1 come from the supported pair reshape of the padded
#     row range [2r0-1, 2r0+2*bho]: O/E = odd/even row planes, the four dy
#     stacks are static slices of O/E;
#   * contraction: all 48 taps stacked (48, bho*BW) against the packed
#     (Co, 48) weight — one MXU pass.
#
# Reference: PatchDiscriminator conv0 (reference
# models/discriminators.py:187-195, Conv2d(img_ch, 64, 4, 2, 1)).


def _stem_mp_matrix(w_img: int, bw: int, w2: int, dtype) -> jnp.ndarray:
    s = jnp.arange(w_img)[:, None]
    cols = jnp.arange(4 * bw)[None, :]
    dx = cols // bw
    j = cols % bw
    hit = (s == 2 * j + dx - 1) & (j < w2)
    return hit.astype(dtype)


def _stem_pack_w(w4: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, 3, Co) -> (Co, 48) rows ordered (dy, c, dx)."""
    co = w4.shape[-1]
    return jnp.transpose(w4, (3, 0, 2, 1)).reshape(co, 48)


def _stem_tstack(x_blk, top, bot, mp_ref, bho, bw, dtype):
    """Shared forward/dW assembly: (3, 2bho, W) block + halo rows ->
    (48, bho*BW) tap stack."""
    rows = jnp.concatenate([top[:, None, :], x_blk, bot[:, None, :]], axis=1)
    w_img = rows.shape[2]
    p = lax.dot_general(
        rows.reshape(3 * (2 * bho + 2), w_img), mp_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(3, bho + 1, 8 * bw)
    # pair m of each channel = (odd row 2(r0+m)-1, even row 2(r0+m)); the
    # merged minor dim keeps them as lane bands [0,4BW) / [4BW,8BW) — all
    # selections below are slices (Mosaic lowers integer indexing on >2D
    # arrays as unsupported gathers).
    o = p[:, :, : 4 * bw]  # odd rows 2(r0+m)-1
    e = p[:, :, 4 * bw :]  # even rows 2(r0+m)
    dys = (o[:, :bho], e[:, :bho], o[:, 1:], e[:, 1:])
    blocks = []
    for dy in range(4):
        s = dys[dy]
        for c in range(3):
            for dx in range(4):
                blocks.append(
                    s[c : c + 1, :, dx * bw : (dx + 1) * bw].reshape(1, bho * bw)
                )
    return jnp.concatenate(blocks, axis=0)  # (48, bho*BW)


def _stem_row_zero_border(ref, t, pick7: bool, border_t, chunked: bool):
    """Stem halo row with ZERO border semantics (the D conv is zero-padded):
    chunked -> static row 7 (top chunk) or row 0 (bottom chunk), zeroed at
    the canvas border block ``border_t``."""
    if not chunked:
        return _halo_row_at(ref, t)
    ch = ref[0]
    row = ch[:, 7, :] if pick7 else ch[:, 0, :]
    return jnp.where(t == border_t, 0.0, row).astype(ch.dtype)


def _stem_kernel(bho: int, bw: int, co: int, w2s: int, chunked: bool = False):
    def kernel(x_ref, top_ref, bot_ref, mp_ref, wm_ref, b_ref, y_ref):
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        tstack = _stem_tstack(
            x_ref[0],
            _stem_row_zero_border(top_ref, t, True, 0, chunked),
            _stem_row_zero_border(bot_ref, t, False, nt - 1, chunked),
            mp_ref, bho, bw, x_ref.dtype,
        )
        # Contract on tstack's 48-row axis with the OUTPUT as (bho*bw, co):
        # the MXU is indifferent to the contraction order, and storing
        # pixels-major means the kernel emits NHWC directly — no XLA
        # transpose of the (N, Co, H2, W2) output on either stem call
        # (traced at ~0.27 ms/step, docs/PERF.md round 3).
        y = lax.dot_general(
            tstack, wm_ref[:, :], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[:, :]
        # Store only the true output columns (a sublane slice; w2s is
        # 8-aligned) so no XLA-side slice of the lane-padded width is
        # needed on either stem call.
        y_ref[0, :, :, :] = (
            y.reshape(bho, bw, co)[:, :w2s, :].astype(y_ref.dtype)
        )

    return kernel


def _stem_halo_rows(x: jnp.ndarray, bho: int):
    """Side rows for the stem blocks: tops[t] = x row 2*t*bho - 1 (zeros for
    t=0, the canvas zero padding), bots[t] = row 2*(t+1)*bho (zeros at the
    bottom edge). Same dim order as x — layout-neutral slices."""
    n, c, h, w = x.shape
    z = jnp.zeros((n, c, 1, w), x.dtype)
    tops = jnp.concatenate([z, x[:, :, 2 * bho - 1 : h - 1 : 2 * bho, :]], axis=2)
    nt = h // (2 * bho)
    bots_main = x[:, :, 2 * bho :: 2 * bho, :]
    bots = jnp.concatenate([bots_main, z], axis=2)[:, :, :nt, :]
    pad = (-nt) % 8
    if pad:
        tops = jnp.pad(tops, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bots = jnp.pad(bots, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return tops, bots


def _stem_pick_bho(h2: int) -> int:
    cands = [d for d in range(8, h2 + 1, 8) if h2 % d == 0 and d <= 64]
    return cands[-1] if cands else h2


def _stem_chunk_plan(x, bho: int):
    """Chunked (aligned, relayout-free) stem halo fetch when legal: tops[t]
    = x row 2*t*bho - 1 (row 7 of chunk t*bho/4 - 1), bots[t] = row
    2*(t+1)*bho (row 0 of chunk (t+1)*bho/4); borders are zeroed in-kernel
    (`_stem_row_zero_border`)."""
    n, c3, h, w_img = x.shape
    chunked = h % 8 == 0 and bho % 4 == 0
    if not chunked:
        tops, bots = _stem_halo_rows(x, bho)
        spec = _halo_spec(3, (h // 2) // bho, w_img)
        return False, tops, bots, spec, spec
    k = bho // 4
    h8 = h // 8
    top_spec = pl.BlockSpec(
        (1, 3, 8, w_img),
        lambda n, t: (n, 0, jnp.maximum(t * k - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, 3, 8, w_img),
        lambda n, t: (n, 0, jnp.minimum((t + 1) * k, h8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return True, x, x, top_spec, bot_spec


@functools.partial(jax.jit, static_argnums=(4,))
def _stem_fwd_call(x, mp, wm, b, w2s):
    n, c3, h, w_img = x.shape
    h2 = h // 2
    bw = mp.shape[1] // 4
    co = wm.shape[0]
    bho = _stem_pick_bho(h2)
    chunked, tops, bots, top_spec, bot_spec = _stem_chunk_plan(x, bho)
    nt = h2 // bho
    return pl.pallas_call(
        _stem_kernel(bho, bw, co, w2s, chunked),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 3, 2 * bho, w_img), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            pl.BlockSpec((w_img, 4 * bw), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 48), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bho, w2s, co), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2s, co), x.dtype),
        interpret=_interpret(),
    )(x, tops, bots, mp, wm, b)


def _stem_dw_kernel(bho: int, bw: int, co: int, w2s: int, chunked: bool = False):
    def kernel(x_ref, top_ref, bot_ref, mp_ref, g_ref, dw_ref, db_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        tstack = _stem_tstack(
            x_ref[0],
            _stem_row_zero_border(top_ref, t, True, 0, chunked),
            _stem_row_zero_border(bot_ref, t, False, nt - 1, chunked),
            mp_ref, bho, bw, x_ref.dtype,
        )
        # g arrives NHWC (1, bho, w2s, co) at its TRUE width — the layout
        # XLA's discriminator backward produces natively, so neither a
        # boundary transpose nor an XLA-side width pad of the incoming
        # gradient is needed. Zero-fill the lane-pad columns in VMEM
        # (a sublane concat) to match tstack's (m, j) column flattening.
        gv = g_ref[0]
        if w2s != bw:
            gv = jnp.concatenate(
                [gv, jnp.zeros((bho, bw - w2s, co), gv.dtype)], axis=1
            )
        gflat = gv.reshape(bho * bw, co)
        acc = lax.dot_general(
            tstack, gflat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (48, Co)
        db = jnp.sum(gflat.astype(jnp.float32), axis=0, keepdims=True)  # (1, Co)
        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw_ref[:, :] = acc
            db_ref[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:, :] = dw_ref[:, :] + acc
            db_ref[:, :] = db_ref[:, :] + db

    return kernel


@jax.jit
def _stem_dw_call(x, mp, g):
    n, c3, h, w_img = x.shape
    h2 = h // 2
    bw = mp.shape[1] // 4
    co = g.shape[3]
    w2s = g.shape[2]
    bho = _stem_pick_bho(h2)
    chunked, tops, bots, top_spec, bot_spec = _stem_chunk_plan(x, bho)
    nt = h2 // bho
    return pl.pallas_call(
        _stem_dw_kernel(bho, bw, co, w2s, chunked),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 3, 2 * bho, w_img), lambda n, t: (n, 0, t, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
            pl.BlockSpec((w_img, 4 * bw), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bho, w2s, co), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((48, co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((48, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, tops, bots, mp, g)


def _stem_mpt_chunks(w_img: int, bw: int, w2: int, dtype) -> jnp.ndarray:
    """(nc, 4*128, W) per-lane-chunk transposed column-scatter matrices:
    chunk k maps the 128 output columns [128k, 128k+128) back to input
    columns. Chunked because Mosaic only supports the kernel's (1, bho*L) ->
    (bho, L) tap reshape at the native lane width L=128."""
    nc = bw // 128
    s = jnp.arange(w_img)[None, None, :]
    rows = jnp.arange(4 * 128)[None, :, None]
    k = jnp.arange(nc)[:, None, None]
    dx = rows // 128
    j = rows % 128 + k * 128
    hit = (s == 2 * j + dx - 1) & (j < w2)
    return hit.astype(dtype)


def _stem_dx_kernel(bho: int, co: int, w_img: int, w2s: int, nc: int):
    def kernel(g_ref, wt_ref, mpt_ref, dx_ref, topo_ref, boto_ref):
        c_id = pl.program_id(2)
        # g arrives NHWC (1, bho, w2s, co) at its TRUE width (one block per
        # lane chunk — no XLA-side width pad). Each chunk's 128 output
        # columns are a static sublane slice, zero-filled past w2s; build
        # every chunk's (48, bho*128) tap-grad matrix (the wt contraction
        # is tiny) and select this chunk's in f32 by grid index (Mosaic
        # cannot select packed bf16 vectors).
        gv = g_ref[0]
        qf = None
        for c in range(nc):
            wc = min(128, w2s - 128 * c)
            gc = gv[:, 128 * c : 128 * c + wc, :]
            if wc < 128:
                gc = jnp.concatenate(
                    [gc, jnp.zeros((bho, 128 - wc, co), gv.dtype)], axis=1
                )
            qc = lax.dot_general(
                wt_ref[:, :], gc.reshape(bho * 128, co),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (48, bho*128), rows (dy, c, dx)
            if nc == 1:
                qf = qc
            else:
                m = (c_id == c).astype(jnp.float32)
                qf = qc * m if qf is None else qf + qc * m
        q = qf.astype(gv.dtype)
        mpt = mpt_ref[0]  # (4*128, W)
        # per (dy, c): scatter the four dx tap-grads back onto input columns
        # through the matching Mp^T row band
        cols = []  # cols[dy][c] = (bho, W) f32
        for dy in range(4):
            per_c = []
            for c in range(3):
                base = (dy * 3 + c) * 4
                acc = None
                for dx in range(4):
                    qdx = q[base + dx : base + dx + 1].reshape(bho, 128)
                    part = lax.dot_general(
                        qdx, mpt[dx * 128 : (dx + 1) * 128, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (bho, W)
                    acc = part if acc is None else acc + part
                per_c.append(acc)
            cols.append(per_c)
        z1 = jnp.zeros((1, w_img), jnp.float32)

        # odd rows 2(r0+m)-1, m 0..bho: dy0 hits m 0..bho-1, dy2 hits 1..bho
        odd = jnp.stack(
            [
                jnp.concatenate([cols[0][c], z1], axis=0)
                + jnp.concatenate([z1, cols[2][c]], axis=0)
                for c in range(3)
            ]
        )  # (3, bho+1, W)
        even = jnp.stack(
            [
                jnp.concatenate([cols[1][c], z1], axis=0)
                + jnp.concatenate([z1, cols[3][c]], axis=0)
                for c in range(3)
            ]
        )
        # main rows of this block: even[m] = row 2(r0+m), odd[m+1] = row
        # 2(r0+m)+1, m 0..bho-1 -> interleave. Slice and expand_dims must be
        # SEPARATE ops: a fused `x[:, :bho, None, :]` lowers as an N-D
        # gather, which Mosaic rejects.
        ev = even[:, :bho, :][:, :, None, :]
        od = odd[:, 1:, :][:, :, None, :]
        main = jnp.concatenate([ev, od], axis=2).reshape(3, 2 * bho, w_img)
        # halo spill rows: odd[0] targets row 2r0-1 (previous block),
        # even[bho] targets row 2r0+2bho (next block). Slice+reshape, not
        # integer indexing: Mosaic lowers mid-dim integer indexes as gathers.
        top = odd[:, :1, :].reshape(3, w_img)
        bot = even[:, bho:, :].reshape(3, w_img)
        # lane chunks write disjoint-ish column ranges of the SAME (n, t)
        # output block: initialize at chunk 0, accumulate after.
        @pl.when(c_id == 0)
        def _():
            dx_ref[0, :, :, :] = main.astype(dx_ref.dtype)
            topo_ref[0, 0, :, :] = top.astype(topo_ref.dtype)
            boto_ref[0, 0, :, :] = bot.astype(boto_ref.dtype)

        @pl.when(c_id != 0)
        def _():
            dx_ref[0, :, :, :] = dx_ref[0, :, :, :] + main.astype(dx_ref.dtype)
            topo_ref[0, 0, :, :] = topo_ref[0, 0, :, :] + top.astype(topo_ref.dtype)
            boto_ref[0, 0, :, :] = boto_ref[0, 0, :, :] + bot.astype(boto_ref.dtype)

    return kernel


@jax.jit
def _stem_dx_call(g, wt, mpt_c):
    n, h2, w2s, co = g.shape
    nc, _, w_img = mpt_c.shape
    bho = _stem_pick_bho(h2)
    nt = h2 // bho
    dx, topo, boto = pl.pallas_call(
        _stem_dx_kernel(bho, co, w_img, w2s, nc),
        grid=(n, nt, nc),
        in_specs=[
            pl.BlockSpec((1, bho, w2s, co), lambda n, t, c: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, co), lambda n, t, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * 128, w_img), lambda n, t, c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, 2 * bho, w_img), lambda n, t, c: (n, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, w_img), lambda n, t, c: (n, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, w_img), lambda n, t, c: (n, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, 2 * bho * nt, w_img), g.dtype),
            jax.ShapeDtypeStruct((n, nt, 3, w_img), g.dtype),
            jax.ShapeDtypeStruct((n, nt, 3, w_img), g.dtype),
        ),
        interpret=_interpret(),
    )(g, wt, mpt_c)
    # fold the spill rows back: topo[t] targets row 2*t*bho - 1 (= last row
    # of chunk t-1), boto[t] targets row 2*(t+1)*bho (= first row of chunk
    # t+1). Build a per-chunk add tensor with only the first/last row of
    # each chunk populated — pure concat/zeros, one fused elementwise add.
    if nt == 1:
        return dx
    z1c = jnp.zeros((n, 3, 1, w_img), g.dtype)  # one chunk's worth of rows
    top_sh = jnp.transpose(topo, (0, 2, 1, 3))[:, :, 1:, :]  # (N, 3, nt-1, W)
    bot_sh = jnp.transpose(boto, (0, 2, 1, 3))[:, :, : nt - 1, :]
    first_rows = jnp.concatenate([z1c, bot_sh], axis=2)[:, :, :, None, :]
    last_rows = jnp.concatenate([top_sh, z1c], axis=2)[:, :, :, None, :]
    mid = jnp.zeros((n, 3, nt, 2 * bho - 2, w_img), g.dtype)
    add = jnp.concatenate([first_rows, mid, last_rows], axis=3)
    h = 2 * bho * nt
    return (dx.reshape(n, 3, nt, 2 * bho, w_img) + add).reshape(n, 3, h, w_img)


@jax.custom_vjp
def conv4x4s2_stem(x, w, b):
    """4x4 / stride-2 / pad-1 conv on an NHWC 3-channel image via the
    channels-major Pallas stem (see the section comment above). x (N, H, W,
    3) -> (N, H/2, W/2, Co). Weight w (4, 4, 3, Co) HWIO (spectral
    normalization, if any, happens on the weight in XLA before this call)."""
    return _stem_impl(x, w, b)[0]


def _stem_impl(x, w, b):
    xc = jnp.transpose(x, (0, 3, 1, 2))  # (N, 3, H, W)
    return _stem_impl_chw(xc, w, b)


def _stem_impl_chw(xc, w, b):
    n, c3, h, w_img = xc.shape
    co = w.shape[-1]
    w2 = w_img // 2
    bw = _round_up_128(w2)
    # Mosaic needs the block height 8-aligned (the (1, bho*BW) -> (bho, BW)
    # tap reshape); pad rows so H/2 is a multiple of 8. Zero row padding
    # equals the canvas zero padding, so real output rows are unchanged.
    h2 = h // 2
    h2p = h2 + (-h2) % 8
    if h2p != h2:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (0, 2 * (h2p - h2)), (0, 0)))
    mp = _stem_mp_matrix(w_img, bw, w2, xc.dtype)
    wm = _stem_pack_w(w).astype(xc.dtype)
    # The kernels store/load the 8-aligned TRUE width (w2s), not the
    # lane-padded bw: no XLA pad/slice of the stem boundary arrays.
    w2s = w2 + (-w2) % 8
    y = _stem_fwd_call(xc, mp, wm, b.reshape(1, co).astype(xc.dtype), w2s)
    return y[:, :h2, :w2, :], xc


def _stem_fwd_rule(x, w, b):
    y, xc = _stem_impl(x, w, b)
    return y, (xc, w, b)


def _stem_bwd_impl(res, g):
    """Shared backward: returns (dx CHANNELS-MAJOR (N, 3, H, W), dw, db)."""
    xc, w, b = res  # xc row-padded to H/2 multiple-of-8 (see _stem_impl)
    n, c3, hp, w_img = xc.shape
    co = w.shape[-1]
    w2 = w_img // 2
    bw = _round_up_128(w2)
    gc = g  # NHWC (N, H2, W2, Co) — the dw/dx kernels load it natively
    h2 = gc.shape[1]
    h2p = hp // 2
    w2s = w2 + (-w2) % 8  # kernels zero-fill past w2s in VMEM themselves
    if w2s != w2 or h2p != h2:
        gc = jnp.pad(gc, ((0, 0), (0, h2p - h2), (0, w2s - w2), (0, 0)))
    mp = _stem_mp_matrix(w_img, bw, w2, xc.dtype)
    dw_acc, db = _stem_dw_call(xc, mp, gc)
    # rows (dy, c, dx) -> (4, 4, 3, Co) HWIO
    dw = jnp.transpose(dw_acc.reshape(4, 3, 4, co), (0, 2, 1, 3)).astype(w.dtype)
    wt = _stem_pack_w(w).T.astype(gc.dtype)  # (48, Co)
    mpt_c = _stem_mpt_chunks(w_img, bw, w2, gc.dtype)
    dxc = _stem_dx_call(gc, wt, mpt_c)
    return dxc[:, :, : 2 * h2, :].astype(gc.dtype), dw, db[0].astype(b.dtype)


def _stem_bwd_rule(res, g):
    dxc, dw, db = _stem_bwd_impl(res, g)
    return jnp.transpose(dxc, (0, 2, 3, 1)), dw, db


conv4x4s2_stem.defvjp(_stem_fwd_rule, _stem_bwd_rule)


@jax.custom_vjp
def conv4x4s2_stem_chw(x_chw, w, b):
    """Same stem conv, but the image arrives CHANNELS-MAJOR (N, 3, H, W) —
    the layout the generator's Pallas tail already produces for the fake
    image — and the gradient wrt the image is returned channels-major too.
    No C=3 NHWC array (a pathological ~43x lane-padded layout) materializes
    on the fake path. Traced A/B on v5e: step-time-neutral vs letting XLA
    transpose + fuse conv0 itself (docs/PERF.md round 3 A/B); kept to hold
    the G<->D boundary in Pallas-owned layouts. Output stays NHWC
    (N, H/2, W/2, Co) for the rest of the XLA discriminator."""
    return _stem_impl_chw(x_chw, w, b)[0]


def _stem_fwd_rule_chw(x_chw, w, b):
    y, xc = _stem_impl_chw(x_chw, w, b)
    return y, (xc, w, b)


def _stem_bwd_rule_chw(res, g):
    return _stem_bwd_impl(res, g)


conv4x4s2_stem_chw.defvjp(_stem_fwd_rule_chw, _stem_bwd_rule_chw)


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
