"""Pallas TPU kernels for the SSM modulation chain, channels-major.

StochasticSpatialModulation (reference models/layers.py:203-234) predicts a
per-pixel gamma/beta from a random spatial map through two VALID 3x3 convs:

    maps (N, H+4, W+4, md) -> conv3x3 -> ReLU -> conv3x3 -> (gamma|beta)

On the channels-major Pallas tail, running this chain in XLA NHWC costs more
than the convs are worth (r3 SSM trace): the md-channel maps and the
2C-channel embed output are both ~10-100x lane-padded in HBM, and the embed
output then pays a full NHWC->NCHW relayout copy per norm site (~0.45 ms
fwd + ~0.25 ms copy per site at 192^2, plus the mirrored backward).

This module computes the WHOLE chain in ONE kernel pass per direction,
channels-major end to end. The two stages use DIFFERENT schemes, chosen by
input channel count:

- Stage 1 (md -> 128): the maps slab is tiny, so the classic 9-tap stack is
  nearly free — A = W1 @ M9 with M9 the nine (dy, dx)-shifted copies of the
  lane-merged maps rows. One dot, no partial combine, no multi-MB f32
  intermediates. (The (3h, 3md) column-partial form was traced 3x slower:
  its K=3md matmul writes a (3h, rows*Wp) f32 partial that the VPU then has
  to re-read and shift-combine.) The 9 shifted slices are lane-misaligned
  by dx and cross row boundaries at the last two lanes of each row; the
  crossed values only ever multiply activation columns >= w_true+2, which
  are identically zero in every consumer (see the column audit below).
- Stage 2 (128 -> 2C): the column-partial scheme of ops/pallas_conv.py
  (3-row stack, one (3co, 3h) matmul, two output lane shifts) — stacking a
  128-channel slab nine times would cost 3x the VPU traffic.

VALID mode everywhere: output col j pairs input cols j..j+2, so partials
combine with plain left shifts and no halo fill rules — every tap reads
real data from the 4px-oversized map. Row halos need no side arrays: the
whole per-image maps slab (md * (H+8) * Wp) lives in VMEM and blocks slice
their rows from the lane-merged flat view (8-aligned chunk reads + aligned
lane slices, per the Mosaic rules in ops/pallas_conv.py). The 128-channel
hidden activation never touches HBM: stage 1 feeds stage 2 in VMEM and the
backward recomputes it the same way.

Backward (custom_vjp) is ONE kernel computing dK2, db2, dK1, db1 — the
maps are RNG-generated latents with no trainable producer, so their
cotangent is defined as zero (the wrapper also stop-gradients them):

  dW2 (3co, 3h) += Gc @ SA^T — the dx-shifted cotangent against the
       row-stacked recomputed activation (pallas_conv._dw_kernel's shape
       language);
  d_pre = ReLU-masked transposed stage-2 conv of the cotangent (column
       partials with opposite shifts, zero fills at the cotangent borders);
  dW1 (h, 9md) += d_pre @ M9^T — the same nine-fold maps stack as the
       forward, contracted over pixels (M=h, N=9md: full MXU tiles, where
       the (3h, 3md) layout would run a N=3 matmul at 2% utilization).

Each block owns hidden rows [t*bh, t*bh+bh+2); the 2-row overlap is zeroed
except on the last block so every hidden row is counted exactly once.

Lane-pad contract (padded-carry, ops/pallas_conv.py): the output is
emitted at the consumer's physical width with replicate-edge fill in the
pad columns — modulated pad columns must equal the modulated edge because
the next conv kernel reads column w_true as the right halo. Fill and its
adjoint (pad-column cotangents folding into the edge column) are pure
slice/reduce/concat lane ops — the earlier (Wp, Wp) fill matmuls cost
~20 GFLOP-equivalent per step at 192^2 and dominated the first trace.

Column audit (why the shifted-slice row crossings are safe): the incoming
cotangent is zero in cols >= w_true after the fold; d_actv col v reads
cotangent cols v, v-1, v-2, so d_actv (and d_pre) are identically zero for
v >= w_true+2; stage-1 A is garbage only for v >= Wp-2 >= w_true+2 (maps
true width w_true+4 <= Wp), and every consumer either multiplies those
columns by the d_pre zeros (dW1), pairs them with cotangent cols
<= w_true-1 (dW2), or overwrites them (forward padfix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infinite_texture_gans_tpu.ops.pallas_conv import (
    _interpret,
    _pack_w_partial,
    _shift_r,
    _unpack_dw_partial,
)


def _round_up(v: int, m: int) -> int:
    return v + (-v) % m


def _offset_stack(flat, wp: int, offsets, length_rows: int):
    """(C, R*Wp) lane-merged flat rows -> (len(offsets)*C, length_rows*Wp):
    for each row offset dy, the window rows [dy, dy+length_rows), stacked on
    the sublane axis (dy major, channel minor). Lane-aligned slices when
    Wp % 128 == 0."""
    return jnp.concatenate(
        [flat[:, dy * wp : (dy + length_rows) * wp] for dy in offsets], axis=0
    )


def _maps9(m_flat, wp: int, rows_out: int):
    """(md, R*Wp) flat maps rows -> (9md, rows_out*Wp): the nine
    (dy, dx)-shifted tap windows, dx major, then dy, then md. Built as the
    aligned 3-row stack plus two per-row left shifts — Mosaic cannot
    concatenate lane-misaligned slices (mismatched vpad offsets), and the
    per-row shift also keeps values from wrapping across row boundaries.
    The dx-shifted fill columns (the last 1-2 lanes of each row) only ever
    multiply activation columns >= w_true+2, which are identically zero in
    every consumer (module docstring column audit)."""
    md = m_flat.shape[0]
    m3 = _offset_stack(m_flat, wp, (0, 1, 2), rows_out)  # (3md, rows*Wp)
    m3r = m3.reshape(3 * md, rows_out, wp)
    z = jnp.zeros_like(m3r[:, :, :1])
    s1 = jnp.concatenate([m3r[:, :, 1:], z], axis=-1)
    s2 = jnp.concatenate([m3r[:, :, 2:], z, z], axis=-1)
    flat = rows_out * wp
    return jnp.concatenate(
        [m3, s1.reshape(3 * md, flat), s2.reshape(3 * md, flat)], axis=0
    )


def _maps_rows(m_ref, t, bh: int, rows: int, wp: int):
    """Full-maps VMEM ref (1, md, Hm8, Wp) -> lane-merged flat view of rows
    [t*bh, t*bh + rows_up8) as (md, rows_up8*Wp). t*bh is 8-aligned (bh
    multiple of 8); the read length is rounded up to a multiple of 8 rows
    (the wrapper row-pads maps so this stays in bounds)."""
    r8 = _round_up(rows, 8)
    chunk = m_ref[0, :, pl.ds(t * bh, r8), :]  # (md, r8, Wp)
    return chunk.reshape(chunk.shape[0], r8 * wp)


def _stage1(m9, w1_ref, b1_ref):
    """A = ReLU(W1 @ M9 + b1), FLAT (h, rows*Wp) in the compute dtype.
    One 9-tap dot; bias on the lane-merged form (the 3-D (h, 1, 1) form
    lowers as an unsupported Mosaic sublane broadcast). All activation and
    partial tensors stay in the input dtype (bf16 on TPU) — the f32
    variants tripled the per-block VPU traffic for no consumer that needs
    the precision; only the dW/db accumulators are f32."""
    a = lax.dot_general(
        w1_ref[:, :], m9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic: matmul acc must be 32-bit
    ).astype(m9.dtype)
    return jnp.maximum(a + b1_ref[:, :], 0.0)


def _valid_combine(p, co: int, rows: int, wp: int):
    """(3co, rows*Wp) stage-2 partials -> (co, rows, Wp): out col j =
    P0[j] + P1[j+1] + P2[j+2] (left shifts, zero fill — the shifted-in
    columns only land in cols >= w_true, which the caller fills)."""
    p0 = p[0:co].reshape(co, rows, wp)
    p1 = p[co : 2 * co].reshape(co, rows, wp)
    p2 = p[2 * co :].reshape(co, rows, wp)
    z1 = jnp.zeros_like(p1[:, :, :1])
    z2 = jnp.zeros_like(p2[:, :, :2])
    return (
        p0
        + jnp.concatenate([p1[:, :, 1:], z1], axis=-1)
        + jnp.concatenate([p2[:, :, 2:], z2], axis=-1)
    )


def _edge_fill(y3, w_true: int):
    """Replicate col w_true-1 into the lane-pad columns (padded-carry)."""
    co, r, wp = y3.shape
    if w_true == wp:
        return y3
    edge = y3[:, :, w_true - 1 : w_true]
    fill = jnp.broadcast_to(edge, (co, r, wp - w_true))
    return jnp.concatenate([y3[:, :, :w_true], fill], axis=-1)


def _fold_pad_cotangent(g3, w_true: int):
    """Adjoint of :func:`_edge_fill` on a (co, R, Wp) cotangent block:
    pad-column cotangents fold into the edge column, pad columns zero."""
    co, r, wp = g3.shape
    gf = g3.astype(jnp.float32)
    if w_true == wp:
        return gf
    fold = jnp.sum(gf[:, :, w_true:], axis=-1, keepdims=True)
    edge = gf[:, :, w_true - 1 : w_true] + fold
    z = jnp.zeros((co, r, wp - w_true), jnp.float32)
    return jnp.concatenate([gf[:, :, : w_true - 1], edge, z], axis=-1)


def _ssm_fwd_kernel(bh: int, w_true: int, co: int, md: int):
    """Forward kernel factory. Grid (N, H/bh). Output block (1, co, bh, Wp)."""

    def kernel(m_ref, w1_ref, b1_ref, wp2_ref, b2_ref, y_ref):
        t = pl.program_id(1)
        wp = m_ref.shape[3]
        m_flat = _maps_rows(m_ref, t, bh, bh + 4, wp)
        m9 = _maps9(m_flat, wp, bh + 2)
        a_flat = _stage1(m9, w1_ref, b1_ref)
        s2 = _offset_stack(a_flat, wp, (0, 1, 2), bh)  # (3h, bh*Wp)
        p = lax.dot_general(
            wp2_ref[:, :], s2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(s2.dtype)  # (3co, bh*Wp)
        y = _valid_combine(p, co, bh, wp)
        y = (y.reshape(co, bh * wp) + b2_ref[:, :]).reshape(co, bh, wp)
        y_ref[0, :, :, :] = _edge_fill(y, w_true).astype(y_ref.dtype)

    return kernel


def _ssm_bwd_kernel(bh: int, w_true: int, co: int, md: int, nt: int):
    """One backward kernel for all four weight grads; see module docstring."""

    def kernel(m_ref, w1_ref, b1_ref, wq_ref, g_ref, gt_ref, gb_ref,
               dw2_ref, db2_ref, dw1_ref, db1_ref):
        n = pl.program_id(0)
        t = pl.program_id(1)
        wp = m_ref.shape[3]
        cd = m_ref.dtype
        m_flat = _maps_rows(m_ref, t, bh, bh + 4, wp)
        m9 = _maps9(m_flat, wp, bh + 2)  # shared by stage 1 and dW1
        a_flat = _stage1(m9, w1_ref, b1_ref)  # cd (h, (bh+2)*Wp)
        h = a_flat.shape[0]
        # cotangent rows [t*bh-2, t*bh+bh+2): 2 rows from the chunk above
        # (zero at the top border), the block, 2 from the chunk below
        top = gt_ref[0][:, 6:8, :]
        top = jnp.where(t == 0, 0.0, top.astype(jnp.float32))
        bot = gb_ref[0][:, 0:2, :]
        bot = jnp.where(t == nt - 1, 0.0, bot.astype(jnp.float32))
        asm = jnp.concatenate([top, g_ref[0].astype(jnp.float32), bot], axis=1)
        asm = _fold_pad_cotangent(asm, w_true).astype(cd)  # (co, bh+4, Wp)
        asm_flat = asm.reshape(co, (bh + 4) * wp)

        # ---- dW2 / db2 over the block's own output rows: nine (dx, dy)
        # dots against FREE lane slices of the cotangent shifts and the
        # activation (no (3co,·)/(3h,·) stacks — their multi-MB VMEM writes
        # dominated the first kernels), assembled into (3co, 3h) at the end
        gf = asm_flat[:, 2 * wp : (2 + bh) * wp].reshape(co, bh, wp)
        z = jnp.zeros_like(gf[:, :, :1])
        g1 = _shift_r(gf, z)
        g_dx = (gf, g1, _shift_r(g1, z))
        acc2 = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        lax.dot_general(
                            g_dx[dx].reshape(co, bh * wp),
                            a_flat[:, dy * wp : (dy + bh) * wp],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for dy in range(3)
                    ],
                    axis=1,
                )
                for dx in range(3)
            ],
            axis=0,
        )  # (3co, 3h)
        db2 = jnp.sum(
            gf.reshape(co, bh * wp).astype(jnp.float32), axis=1, keepdims=True
        )

        # ---- transposed stage-2 conv -> d_pre over rows [t*bh, t*bh+bh+2)
        # dy row offsets: d_actv row u pairs cotangent row u-dy = assembly
        # row (u_local+2) - dy -> offsets (2, 1, 0) for dy = (0, 1, 2).
        # Split by dx (one (h, 3co) dot each, shift-accumulated in f32)
        # instead of one (3h, ·) dot — same MXU passes, half the f32
        # partial traffic.
        rows = bh + 2
        sg = _offset_stack(asm_flat, wp, (2, 1, 0), rows)  # (3co, rows*Wp)
        d_actv = None
        zf = None
        for dx in range(3):
            q = lax.dot_general(
                wq_ref[dx * h : (dx + 1) * h, :], sg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(h, rows, wp)
            if dx == 0:
                d_actv = q
                zf = jnp.zeros_like(q[:, :, :1])
            elif dx == 1:
                d_actv = d_actv + _shift_r(q, zf)
            else:
                d_actv = d_actv + _shift_r(_shift_r(q, zf), zf)
        # mask in f32: Mosaic rejects cmpf/select on packed bf16 vectors
        a3 = a_flat.reshape(h, rows, wp).astype(jnp.float32)
        d_pre = jnp.where(a3 > 0.0, d_actv, 0.0)
        # overlap rows bh..bh+1 belong to the NEXT block except at t==nt-1
        keep = jnp.where(t == nt - 1, 1.0, 0.0)
        d_pre = jnp.concatenate(
            [d_pre[:, :bh, :], d_pre[:, bh:, :] * keep], axis=1
        )
        db1 = jnp.sum(d_pre.reshape(h, rows * wp), axis=1, keepdims=True)
        d_pre_flat = d_pre.reshape(h, rows * wp).astype(cd)

        # ---- dW1: contract d_pre against the nine-fold maps stack
        acc1 = lax.dot_general(
            d_pre_flat, m9,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (h, 9md)

        first = jnp.logical_and(n == 0, t == 0)

        @pl.when(first)
        def _():
            dw2_ref[:, :] = acc2
            db2_ref[:, :] = db2
            dw1_ref[:, :] = acc1
            db1_ref[:, :] = db1

        @pl.when(jnp.logical_not(first))
        def _():
            dw2_ref[:, :] = dw2_ref[:, :] + acc2
            db2_ref[:, :] = db2_ref[:, :] + db2
            dw1_ref[:, :] = dw1_ref[:, :] + acc1
            db1_ref[:, :] = db1_ref[:, :] + db1

    return kernel


def _pick_bh_ssm(h: int, bwd: bool = False) -> int:
    """Block rows: 16 where it divides (fewer blocks -> less of the 2-row
    stage-1 overlap recompute), else 8. With every activation/partial in
    the compute dtype both directions fit VMEM at 16."""
    del bwd
    for cand in (16, 8):
        if h % cand == 0:
            return cand
    return 0  # caller falls back to XLA


@functools.partial(jax.jit, static_argnames=("h", "w_true", "out_w"))
def ssm_embed_fwd_call(m, w1, b1, wp2, b2, h: int, w_true: int, out_w: int):
    """m: (N, md, Hm8, Wp) row-padded + lane-padded maps (true rows H+4,
    true cols w_true+4). Output (N, co, h, out_w) with the padded-carry
    replicate fill in cols >= w_true."""
    n, md, hm8, wpad = m.shape
    co = wp2.shape[0] // 3
    bh = _pick_bh_ssm(h)
    assert bh, "h must be a multiple of 8 for the Pallas SSM embed"
    hidden = w1.shape[0]
    out = pl.pallas_call(
        _ssm_fwd_kernel(bh, w_true, co, md),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, md, hm8, wpad), lambda n, t: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 9 * md), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 1), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * co, 3 * hidden), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, bh, wpad), lambda n, t: (n, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, co, h, wpad), m.dtype),
        interpret=_interpret(),
    )(m, w1, b1, wp2, b2)
    if out_w != wpad:
        out = out[..., :out_w]
    return out


@functools.partial(jax.jit, static_argnames=("h", "w_true"))
def ssm_embed_bwd_call(m, w1, b1, wq2, g, h: int, w_true: int):
    """Backward entry: m as in the forward; g the output cotangent ALREADY
    zero-padded to the maps' physical width Wp. Returns
    (dw2_acc (3co, 3h), db2 (co,), dw1_acc (h, 9md), db1 (hidden,))."""
    n, md, hm8, wpad = m.shape
    hidden = w1.shape[0]
    co = g.shape[1]
    bh = _pick_bh_ssm(h, bwd=True)
    nt = h // bh
    k = bh // 8
    h8 = h // 8
    g_spec = pl.BlockSpec((1, co, bh, wpad), lambda n, t: (n, 0, t, 0),
                          memory_space=pltpu.VMEM)
    gtop_spec = pl.BlockSpec(
        (1, co, 8, wpad),
        lambda n, t: (n, 0, jnp.maximum(t * k - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    gbot_spec = pl.BlockSpec(
        (1, co, 8, wpad),
        lambda n, t: (n, 0, jnp.minimum((t + 1) * k, h8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    dw2, db2, dw1, db1 = pl.pallas_call(
        _ssm_bwd_kernel(bh, w_true, co, md, nt),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, md, hm8, wpad), lambda n, t: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 9 * md), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 1), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hidden, 3 * co), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            g_spec, gtop_spec, gbot_spec,
        ],
        out_specs=(
            pl.BlockSpec((3 * co, 3 * hidden), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 9 * md), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 1), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3 * co, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
            jax.ShapeDtypeStruct((hidden, 9 * md), jnp.float32),
            jax.ShapeDtypeStruct((hidden, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(m, w1, b1, wq2, g, g, g)
    return dw2, db2[:, 0], dw1, db1[:, 0]


def _pack_w1(k1: jnp.ndarray) -> jnp.ndarray:
    """(3,3,md,h) -> (h, 9md): columns ordered (dx major, dy, md minor) to
    match :func:`_maps9`'s stack order."""
    h = k1.shape[3]
    return jnp.transpose(k1, (3, 1, 0, 2)).reshape(h, -1)


def _unpack_dw1(acc: jnp.ndarray, md: int) -> jnp.ndarray:
    """(h, 9md) accumulated taps (dx, dy, md cols) -> (3,3,md,h)."""
    h = acc.shape[0]
    return jnp.transpose(acc.reshape(h, 3, 3, md), (2, 1, 3, 0))


def _pack_w2t(k2: jnp.ndarray) -> jnp.ndarray:
    """(3,3,h,co) -> (3h, 3co): rows (dx, c), cols (dy, co) — the transposed
    -conv partial layout used by the backward kernel."""
    h = k2.shape[2]
    co = k2.shape[3]
    return jnp.transpose(k2, (1, 2, 0, 3)).reshape(3 * h, 3 * co)


def _prep_maps(maps: jnp.ndarray) -> jnp.ndarray:
    """(N, md, H+4, W+4) -> (N, md, H+8, Wp): 4 zero rows (block reads are
    rounded to 8-row chunks) and zero lane padding (the pad columns only
    ever touch output columns >= w_true, which the kernels fill)."""
    n, md, h4, w4 = maps.shape
    wp = _round_up(w4, 128)
    return jnp.pad(maps, ((0, 0), (0, 0), (0, 4), (0, wp - w4)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ssm_embed_chw_p(maps, k1, b1, k2, b2, w_true: int, out_w: int,
                    bwd_impl: str = "xla"):
    """The SSM gamma/beta chain as one channels-major Pallas pass:

        (N, md, H+4, W+4) maps -> conv3x3(k1,b1) -> ReLU -> conv3x3(k2,b2)
        -> (N, 2C, H, out_w)

    Both convs are VALID (reference models/layers.py:212-216 with p=0 in
    'local' mode); ``w_true`` = the consumer's true width W, ``out_w`` =
    the consumer's physical lane-padded width (columns >= w_true carry the
    replicate-edge fill per the padded-carry contract). H % 8 == 0; one
    image's map slab must fit VMEM (always true for the generator's merged
    grids).

    Gradients flow to k1/b1/k2/b2 only. The maps cotangent is DEFINED AS
    ZERO: maps are RNG latents with no trainable producer (the caller
    should stop_gradient them; computing the true dmaps would cost a third
    transposed-conv pass for a value that is always discarded).

    ``bwd_impl``: 'xla' (default) differentiates a recomputed NHWC XLA
    chain — the 128-channel hidden stage is lane-native in NHWC and XLA's
    transposed conv runs at ~80% MFU there, beating the channels-major
    Pallas backward at these shapes (measured head-to-head, docs/PERF.md);
    'pallas' uses the fully fused channels-major backward kernel. The
    FORWARD is always the Pallas kernel: it is what kills the per-site
    NHWC->NCHW relayout copy, and it matches XLA's forward cost.
    """
    m = _prep_maps(maps)
    hidden = k1.shape[3]
    co = k2.shape[3]
    return ssm_embed_fwd_call(
        m,
        _pack_w1(k1).astype(m.dtype),
        b1.reshape(hidden, 1).astype(m.dtype),
        _pack_w_partial(k2).astype(m.dtype),
        b2.reshape(co, 1).astype(m.dtype),
        h=maps.shape[2] - 4, w_true=w_true, out_w=out_w,
    )


def _ssm_p_fwd_rule(maps, k1, b1, k2, b2, w_true, out_w, bwd_impl):
    y = ssm_embed_chw_p(maps, k1, b1, k2, b2, w_true, out_w, bwd_impl)
    return y, (maps, k1, b1, k2, b2)


def _bwd_pallas(maps, k1, b1, k2, b2, g, w_true):
    m = _prep_maps(maps)
    h = maps.shape[2] - 4
    hidden = k1.shape[3]
    md = k1.shape[2]
    co = k2.shape[3]
    wpad = m.shape[3]
    if g.shape[3] != wpad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, wpad - g.shape[3])))
    dw2, db2, dw1, db1 = ssm_embed_bwd_call(
        m,
        _pack_w1(k1).astype(m.dtype),
        b1.reshape(hidden, 1).astype(m.dtype),
        _pack_w2t(k2).astype(m.dtype),
        g, h=h, w_true=w_true,
    )
    dk1 = _unpack_dw1(dw1, md).astype(k1.dtype)
    dk2 = _unpack_dw_partial(dw2, hidden, co).astype(k2.dtype)
    return dk1, db1.astype(b1.dtype), dk2, db2.astype(b2.dtype)


def _bwd_xla(maps, k1, b1, k2, b2, g, w_true):
    """Differentiate a recomputed NHWC chain: the hidden stage's 128
    channels are lane-native there, so XLA's transposed conv and dW run at
    ~80% MFU — faster than the channels-major kernel at these shapes."""
    cd = maps.dtype
    # adjoint of the replicate fill: fold pad-column cotangents into the
    # true edge column before differentiating the unfilled chain
    gt = g[..., :w_true]
    if g.shape[3] > w_true:
        fold = jnp.sum(
            g[..., w_true:].astype(jnp.float32), axis=-1
        ).astype(g.dtype)
        gt = jnp.concatenate(
            [gt[..., :-1], gt[..., -1:] + fold[..., None]], axis=-1
        )
    m_nhwc = jnp.transpose(maps, (0, 2, 3, 1))

    def chain(k1, b1, k2, b2):
        a = lax.conv_general_dilated(
            m_nhwc, k1.astype(cd), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1.astype(cd)
        a = jax.nn.relu(a)
        y = lax.conv_general_dilated(
            a, k2.astype(cd), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2.astype(cd)
        return jnp.transpose(y, (0, 3, 1, 2))

    _, vjp = jax.vjp(chain, k1, b1, k2, b2)
    return vjp(gt)


def _ssm_p_bwd_rule(w_true, out_w, bwd_impl, res, g):
    maps, k1, b1, k2, b2 = res
    impl = _bwd_pallas if bwd_impl == "pallas" else _bwd_xla
    dk1, db1, dk2, db2 = impl(maps, k1, b1, k2, b2, g, w_true)
    return jnp.zeros_like(maps), dk1, db1, dk2, db2


ssm_embed_chw_p.defvjp(_ssm_p_fwd_rule, _ssm_p_bwd_rule)


def ssm_embed_chw_reference(maps_chw, k1, b1, k2, b2):
    """Pure-XLA oracle: two VALID 3x3 convs with a ReLU between, on
    channels-major arrays. maps_chw (N, md, H+4, W+4) -> (N, 2C, H, W)."""
    a = lax.conv_general_dilated(
        maps_chw.astype(jnp.float32), k1.astype(jnp.float32), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + b1[None, :, None, None]
    a = jax.nn.relu(a)
    y = lax.conv_general_dilated(
        a, k2.astype(jnp.float32), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + b2[None, :, None, None]
    return y
