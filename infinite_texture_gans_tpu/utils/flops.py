"""Analytic FLOPs model + MFU (model FLOPs utilization) accounting.

Counts the matmul-shaped FLOPs (convolutions, attention contractions) of the
generator/discriminator forward passes and composes them into per-train-step
and per-canvas totals, so bench.py can report MFU — the fraction of the
chip's peak matmul throughput the measured wall-clock achieves. Elementwise
work (norms, activations, upsamples, residual adds, EMA/optimizer updates)
is excluded: it is O(activations) vs the convs' O(activations x channels x
taps) and contributes <1% of the model FLOPs at the flagship shapes (it DOES
contribute wall time — that is the point of reporting MFU against the conv
FLOPs: memory-bound overhead shows up as lost utilization).

Backward-pass convention (the standard 2x rule): a differentiated forward
costs 3x its forward FLOPs (1x forward + ~2x backward for the dW and dx
convolutions); a backward that only needs input gradients (the G-update pass
through the frozen D) costs ~1x forward, so that pass totals 2x. The
composition mirrors train_step._make_step_impl exactly (which reuses the
last D-iteration's G forward for the G update — G runs forward once).

Architecture shapes follow the reference channel plans
(reference models/generators.py:59-83, models/discriminators.py:187-206)
via this package's ``generator_channel_plan``.
"""

from __future__ import annotations

from typing import Optional

from infinite_texture_gans_tpu.models.generator import generator_channel_plan


def conv2d_flops(cin: int, cout: int, k: int, out_h: int, out_w: int) -> int:
    """2 * MACs of a k x k convolution producing an (out_h, out_w, cout) map."""
    return 2 * cin * cout * k * k * out_h * out_w


def attention_flops(channels: int, h: int, w: int) -> int:
    """SAGAN self-attention on one (h, w, C) patch (models/layers.py:
    Attention): theta/phi C->C/8, g C->C/2, o C/2->C 1x1 convs (phi/g on the
    2x2-max-pooled map), plus the theta^T phi and attn @ g contractions."""
    hw = h * w
    hw4 = (h // 2) * (w // 2)  # phi/g are 2x2 max-pooled
    c8, c2 = channels // 8, channels // 2
    f = conv2d_flops(channels, c8, 1, h, w)  # theta
    f += conv2d_flops(channels, c8, 1, h // 2, w // 2)  # phi (pooled)
    f += conv2d_flops(channels, c2, 1, h // 2, w // 2)  # g (pooled)
    f += conv2d_flops(c2, channels, 1, h, w)  # o
    f += 2 * hw * hw4 * c8  # scores = theta^T phi
    f += 2 * hw * hw4 * c2  # out = attn @ g
    return f


def generator_forward_flops(
    G, *, num_images: int = 1, gh: Optional[int] = None, gw: Optional[int] = None
) -> int:
    """Conv FLOPs of ONE generator forward on an (gh x gw)-patch merged grid
    (training uses the module's own 3x3 grid; the canvas engine calls each
    raster step with the same grid). Covers start conv, residual blocks
    (conv1/conv2 + 1x1 shortcut), SSM embed chains, per-patch attention and
    the final conv."""
    gh = G.num_patches_h if gh is None else gh
    gw = G.num_patches_w if gw is None else gw
    br = G.base_res
    plan = generator_channel_plan(G.G_ch, G.n_layers_G)

    total = conv2d_flops(G.z_dim, G.G_ch * 8, 3, gh * br, gw * br)  # start
    for i, (cin, cout) in enumerate(plan, start=1):
        r = br * (2 ** (i - 1))
        h_i, w_i = gh * r, gw * r
        total += conv2d_flops(cin, cout, 3, h_i, w_i)  # conv1
        total += conv2d_flops(cout, cout, 3, h_i, w_i)  # conv2
        if cin != cout:
            total += conv2d_flops(cin, cout, 1, h_i, w_i)  # shortcut
        if G.type_norm == "SSM":
            # bn1 (cin) + bn2 (cout) + bn3 (cin, learnable shortcut only):
            # each SSM runs mlp_shared (map_dim -> 128) + embed (128 -> 2C)
            # 3x3 convs over the block's merged map
            # (reference models/layers.py:203-234)
            ssm_sites = [cin, cout] + ([cin] if cin != cout else [])
            for c in ssm_sites:
                total += conv2d_flops(G.map_dim, 128, 3, h_i, w_i)
                total += conv2d_flops(128, 2 * c, 3, h_i, w_i)
        if i == 3 and G.attention:
            # applied per patch: patches are batch entries for the attention
            r3 = br * 4
            total += gh * gw * attention_flops(plan[2][1], r3, r3)
    P = br * (2 ** (G.n_layers_G - 1))
    total += conv2d_flops(plan[-1][1], G.img_ch, 3, gh * P, gw * P)  # final
    return total * num_images


def discriminator_forward_flops(
    D, h: int, w: int, batch: int, in_ch: int = 3
) -> int:
    """Conv FLOPs of one PatchDiscriminator forward on a (batch, h, w,
    in_ch) input (reference models/discriminators.py:187-206 layout: k4 s2
    stem, then n_layers_D-1 convs doubling channels capped at 512 with
    stride 2 except the last, final k4 s1 -> 1)."""
    k, p = D.kw, 1

    def out_size(size: int, stride: int) -> int:
        return (size + 2 * p - k) // stride + 1

    total = 0
    cin, cout = in_ch, D.base_ch
    h, w = out_size(h, 2), out_size(w, 2)
    total += conv2d_flops(cin, cout, k, h, w)
    nf = D.base_ch
    for n in range(1, D.n_layers_D):
        cin, nf = nf, min(nf * 2, 512)
        stride = 1 if n == D.n_layers_D - 1 else 2
        h, w = out_size(h, stride), out_size(w, stride)
        total += conv2d_flops(cin, nf, k, h, w)
    h, w = out_size(h, 1), out_size(w, 1)
    total += conv2d_flops(nf, 1, k, h, w)
    return total * batch


def train_step_flops(
    G,
    D,
    *,
    batch_size: int,
    crop: int,
    num_images: int,
    disc_iters: int = 1,
) -> int:
    """Model FLOPs of ONE fused G+D train step (train_step._make_step_impl):
    per D iteration a fresh G forward (only the LAST is differentiated — its
    vjp is reused for the G update) and a differentiated D pass on real +
    fake; then the G update's D-fwd + dx-only backward and the G backward."""
    g_fwd = generator_forward_flops(G, num_images=num_images)
    P = G.patch_resolution
    fake_hw = (G.num_patches_h * P, G.num_patches_w * P)
    d_real = discriminator_forward_flops(D, crop, crop, batch_size, G.img_ch)
    d_fake = discriminator_forward_flops(D, *fake_hw, num_images, G.img_ch)

    total = (disc_iters - 1) * g_fwd  # fwd-only G samples
    total += 3 * g_fwd  # last G fwd + full backward
    total += disc_iters * 3 * (d_real + d_fake)  # D updates (fwd + dW+dx bwd)
    total += 2 * d_fake  # G update: D fwd + dx-only backward
    return total


def canvas_flops(G, out_h: int, out_w: int, num_images: int = 1) -> int:
    """Conv FLOPs of one patch-by-patch canvas generation: steps_h x steps_w
    raster steps, each a (gh x gw)-grid G forward (sampling/infinite.py;
    step count per reference utils.py:298-303)."""
    P = G.patch_resolution
    steps_h = -(-max(out_h // P - 1, 1) // 2)  # ceil((out/P - 1) / 2)
    steps_w = -(-max(out_w // P - 1, 1) // 2)
    return steps_h * steps_w * generator_forward_flops(G, num_images=num_images)


#: Peak dense-matmul throughput per chip, FLOP/s, by jax device_kind prefix.
#: bf16 numbers (the bench's default compute dtype); f32 runs on the same
#: MXU at roughly half rate on v5e-class chips.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6": 918e12,  # Trillium / v6e
}


def peak_flops(device, compute_dtype: str = "bfloat16") -> Optional[float]:
    """Best-known peak matmul FLOP/s for a jax device, or None when unknown
    (e.g. CPU) — callers should then omit MFU rather than fake it."""
    kind = getattr(device, "device_kind", "")
    best = None
    for prefix, val in PEAK_FLOPS.items():
        if kind.startswith(prefix) and (best is None or len(prefix) > best[0]):
            best = (len(prefix), val)
    if best is None:
        return None
    scale = 1.0 if compute_dtype == "bfloat16" else 0.5
    return best[1] * scale
