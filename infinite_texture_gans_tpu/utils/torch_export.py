"""JAX variables -> PyTorch reference checkpoint exporter.

Inverse of :mod:`utils.torch_import`: converts this framework's generator
variable pytrees into the reference's ``state_dict`` naming
(reference models/generators.py:59-83) and checkpoint dict format
(reference train.py:200-217, the ``{'netG_state_dict', 'args', ...}`` dict
that reference test_sample.py:49-62 consumes), so models trained on TPU can
be taken BACK to the reference's PyTorch tooling unchanged. Round-trip
(torch -> jax -> torch, ``strict=True`` load) is asserted bit-for-bit in
``tests/test_export.py``.

Conversions (each the inverse of the importer's): HWIO conv kernels ->
OIHW; ``scale``/``bias`` + ``batch_stats`` -> BN ``weight``/``bias``/
``running_mean``/``running_var`` (+ ``num_batches_tracked``, which torch's
``state_dict`` includes and ``strict`` loading requires — restored from the
``torch_extras`` side collection the importer captured, 0 for models that
never came from torch); SSM's ``mlp_shared`` conv -> the reference's
``mlp_shared.0`` (first entry of its ``nn.Sequential(conv, relu)``,
reference models/layers.py:220-222).

Spectral-norm state (a ``spectral`` collection of u/v power-iteration
vectors — present both for ``--spec_norm_G`` training checkpoints, whose
``netG_variables`` carry the raw collections, and for imported reference SN
checkpoints) exports as torch's SN buffer set ``weight_orig``/``weight_u``/
``weight_v`` per conv, with ``weight_v`` permuted from this framework's
HWIO-flat order back to torch's OIHW-flat order — the true inverse of the
importer, for G exactly as for D. (The reference's own inference path then
rebuilds SN-off and consumes ``weight_orig``, test_sample.py:32-41, 55-58.)
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Sequence

import numpy as np


def _t(a):
    """array-like -> torch tensor (floats as float32 — the reference's
    parameter dtype; bf16 arrays are not torch.from_numpy-compatible)."""
    import torch

    a = np.asarray(a)
    if a.dtype != np.float32 and a.dtype.kind in ("f", "V"):  # V: bfloat16
        a = a.astype(np.float32)
    a = np.ascontiguousarray(a)
    if not a.flags.writeable:  # torch.from_numpy rejects read-only views
        a = a.copy()
    return torch.from_numpy(a)


def _conv(
    sd: Dict[str, Any],
    params: Dict[str, Any],
    tkey: str,
    sn: Optional[Dict[str, Any]] = None,
) -> None:
    """params {kernel HWIO, bias?} -> ``tkey.weight`` (OIHW) [+ ``.bias``];
    with spectral state ``sn`` ({u, v}), the torch SN buffer set
    ``weight_orig``/``weight_u``/``weight_v`` instead (``v`` permuted from
    HWIO-flat back to torch's OIHW-flat order, inverse of the importer)."""
    kernel = np.asarray(params["kernel"])
    if sn is not None:
        sd[f"{tkey}.weight_orig"] = _t(kernel.transpose(3, 2, 0, 1))
        if "u" in sn:
            sd[f"{tkey}.weight_u"] = _t(sn["u"])
        if "v" in sn:
            v = np.asarray(sn["v"])
            kh, kw, i, _ = kernel.shape
            sd[f"{tkey}.weight_v"] = _t(
                v.reshape(kh, kw, i).transpose(2, 0, 1).reshape(-1)
            )
    else:
        sd[f"{tkey}.weight"] = _t(kernel.transpose(3, 2, 0, 1))
    if "bias" in params:
        sd[f"{tkey}.bias"] = _t(params["bias"])


def _bn(
    sd,
    tkey: str,
    params: Optional[Dict[str, Any]],
    stats: Dict[str, Any],
    extras: Optional[Dict[str, Any]] = None,
):
    import torch

    if params is not None:  # affine BN
        sd[f"{tkey}.weight"] = _t(params["scale"])
        sd[f"{tkey}.bias"] = _t(params["bias"])
    sd[f"{tkey}.running_mean"] = _t(stats["mean"])
    sd[f"{tkey}.running_var"] = _t(stats["var"])
    nbt = (extras or {}).get("num_batches_tracked", 0)
    sd[f"{tkey}.num_batches_tracked"] = torch.tensor(int(nbt), dtype=torch.int64)


def _node(tree: Optional[Dict[str, Any]], *path) -> Optional[Dict[str, Any]]:
    """Walk ``path`` through a nested dict; None wherever absent."""
    for k in path:
        if not isinstance(tree, dict):
            return None
        tree = tree.get(k)
    return tree  # type: ignore[return-value]


def export_generator_state_dict(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Generator variables pytree -> reference ``ResidualPatchGenerator``
    state_dict (loads with ``strict=True``). The block topology (conv3
    presence, bn3, SSM vs BN, attention) is read off the tree itself, so any
    supported configuration exports without extra arguments. A ``spectral``
    collection (``--spec_norm_G`` training checkpoints, or imported reference
    SN checkpoints) exports each covered conv as torch SN buffers — in the
    reference, SN=True normalizes EVERY generator conv incl. SSM embeds and
    attention (reference models/generators.py:59-83, models/layers.py:220-243)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    spectral = variables.get("spectral", {})
    extras = variables.get("torch_extras", {})
    sd: Dict[str, Any] = {}

    _conv(sd, params["start"]["conv"], "start.conv", _node(spectral, "start", "conv"))
    blocks = sorted(
        (k for k in params if k.startswith("block")), key=lambda k: int(k[5:])
    )
    for blk in blocks:
        bp, bs = params[blk], stats.get(blk, {})
        bsn, bex = spectral.get(blk, {}), extras.get(blk, {})
        _conv(sd, bp["conv1"]["conv"], f"{blk}.conv1.conv", _node(bsn, "conv1", "conv"))
        _conv(sd, bp["conv2"]["conv"], f"{blk}.conv2.conv", _node(bsn, "conv2", "conv"))
        if "conv3" in bp:
            _conv(sd, bp["conv3"], f"{blk}.conv3", _node(bsn, "conv3"))
        for bn in ("bn1", "bn2", "bn3"):
            if bn in bp and "mlp_shared" in bp[bn]:  # SSM site
                _bn(sd, f"{blk}.{bn}.bn", None, bs[bn]["bn"], _node(bex, bn, "bn"))
                _conv(
                    sd, bp[bn]["mlp_shared"], f"{blk}.{bn}.mlp_shared.0",
                    _node(bsn, bn, "mlp_shared"),
                )
                _conv(sd, bp[bn]["embed"], f"{blk}.{bn}.embed", _node(bsn, bn, "embed"))
            elif bn in bp:  # plain BN site
                _bn(sd, f"{blk}.{bn}", bp[bn], bs[bn], _node(bex, bn))
    if "attention" in params:
        ap = params["attention"]["attn"]
        for part in ("theta", "phi", "g", "o"):
            _conv(
                sd, ap[part], f"attention.{part}",
                _node(spectral, "attention", "attn", part),
            )
        sd["attention.gamma"] = _t(ap["gamma"])
    if "bn" in params:  # final BN (BN mode only)
        _bn(sd, "bn", params["bn"], stats["bn"], _node(extras, "bn"))
    _conv(sd, params["final"]["conv"], "final.conv", _node(spectral, "final", "conv"))
    return sd


def export_patch_discriminator_state_dict(
    variables: Dict[str, Any], *, norm_layer: Optional[str] = None
) -> Dict[str, Any]:
    """PatchDiscriminator variables -> the reference's ``nn.Sequential``
    state_dict (reference models/discriminators.py:187-206 layout: [conv,
    lrelu] + (n_layers_D-1) x [conv, norm?, lrelu] + [conv]). Spectral-norm
    convs export as ``weight_orig``/``weight_u``/``weight_v`` (the torch SN
    buffer set), with ``weight_v`` permuted back from this framework's
    HWIO-flat order to torch's OIHW-flat order (inverse of the importer).
    ``norm_layer`` must match the model's (it shifts the Sequential indices
    even when the norm has no state, e.g. ``'instance'``)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    spectral = variables.get("spectral", {})
    extras = variables.get("torch_extras", {})
    sd: Dict[str, Any] = {}

    n_layers_D = sum(
        1 for k in params if k.startswith("conv") and k != "conv_out"
    )
    per = 3 if norm_layer else 2
    idx = 0
    _conv(sd, params["conv0"], f"model.{idx}", spectral.get("conv0"))
    idx += 2  # conv, lrelu
    for n in range(1, n_layers_D):
        _conv(sd, params[f"conv{n}"], f"model.{idx}", spectral.get(f"conv{n}"))
        if norm_layer == "batch":
            _bn(
                sd, f"model.{idx + 1}", params[f"norm{n}"], stats[f"norm{n}"],
                extras.get(f"norm{n}"),
            )
        idx += per
    _conv(sd, params["conv_out"], f"model.{idx}", spectral.get("conv_out"))
    return sd


def export_generator_pth(
    path: str,
    variables: Dict[str, Any],
    args: Any,
    *,
    epoch: Optional[int] = None,
    gloss: Optional[Sequence[float]] = None,
    dloss: Optional[Sequence[float]] = None,
    seed: Optional[int] = None,
    d_variables: Optional[Dict[str, Any]] = None,
    d_norm_layer: Optional[str] = None,
) -> None:
    """Write a reference-format ``.pth`` checkpoint (reference
    train.py:200-217 keys; the minimal ``{'netG_state_dict', 'args'}`` form
    is what reference test_sample.py needs — epoch/losses/seed ride along
    when provided). ``args`` may be a Namespace or a flag dict (e.g. a
    framework checkpoint's ``meta['args']``); TPU-only flags are harmless
    extra namespace attributes for the reference's loaders."""
    import torch

    if not isinstance(args, argparse.Namespace):
        args = argparse.Namespace(**dict(args))
    ckpt: Dict[str, Any] = {
        "netG_state_dict": export_generator_state_dict(variables),
        "args": args,
    }
    if d_variables is not None:
        ckpt["netD_state_dict"] = export_patch_discriminator_state_dict(
            d_variables, norm_layer=d_norm_layer
        )
    if epoch is not None:
        ckpt["epoch"] = int(epoch)
    if gloss is not None:
        ckpt["Gloss"] = list(gloss)
    if dloss is not None:
        ckpt["Dloss"] = list(dloss)
    if seed is not None:
        ckpt["seed"] = int(seed)
    torch.save(ckpt, path)
