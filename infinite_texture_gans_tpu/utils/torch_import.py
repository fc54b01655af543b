"""PyTorch checkpoint -> JAX params importer.

Converts reference checkpoints (reference train.py:200-217 save format;
state-dict naming from models/generators.py + models/discriminators.py) into
this framework's variable pytrees, so trained reference models run on TPU
and so tests can assert pixel-level parity against the PyTorch oracle.

Conversions: OIHW conv weights -> HWIO; ``module.`` DataParallel prefixes
stripped (reference test_sample.py:32-41); spectral-norm ``weight_orig``/
``weight_u`` -> kernel + spectral/u; BatchNorm weight/bias/running_* ->
scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {(k[len("module."):] if k.startswith("module.") else k): v for k, v in sd.items()}


def _conv_weight(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.spectral: Dict[str, Any] = {}
        self.torch_extras: Dict[str, Any] = {}

    def _set(self, root, path, value):
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    def conv(self, sd, tkey, *path):
        """Import a conv (plain or spectral-normalized) at params path."""
        if f"{tkey}.weight_orig" in sd:
            self._set(self.params, (*path, "kernel"), _conv_weight(sd[f"{tkey}.weight_orig"]))
            if f"{tkey}.weight_u" in sd:
                self._set(self.spectral, (*path, "u"), _np(sd[f"{tkey}.weight_u"]))
            if f"{tkey}.weight_v" in sd:
                # torch flattens the (O, I, kh, kw) weight to (O, I*kh*kw);
                # our HWIO view flattens to (O, kh*kw*I) — permute v to match.
                v = _np(sd[f"{tkey}.weight_v"])
                w = _np(sd[f"{tkey}.weight_orig"])
                if w.ndim == 4:
                    o, i, kh, kw = w.shape
                    v = v.reshape(i, kh, kw).transpose(1, 2, 0).reshape(-1)
                self._set(self.spectral, (*path, "v"), v)
        else:
            self._set(self.params, (*path, "kernel"), _conv_weight(sd[f"{tkey}.weight"]))
        if f"{tkey}.bias" in sd:
            self._set(self.params, (*path, "bias"), _np(sd[f"{tkey}.bias"]))

    def bn(self, sd, tkey, *path, affine=True):
        if affine:
            self._set(self.params, (*path, "scale"), _np(sd[f"{tkey}.weight"]))
            self._set(self.params, (*path, "bias"), _np(sd[f"{tkey}.bias"]))
        self._set(self.batch_stats, (*path, "mean"), _np(sd[f"{tkey}.running_mean"]))
        self._set(self.batch_stats, (*path, "var"), _np(sd[f"{tkey}.running_var"]))
        if f"{tkey}.num_batches_tracked" in sd:
            # torch's BN counter has no JAX consumer, but it must survive a
            # torch -> jax -> torch round trip (a trained reference ckpt has
            # count > 0; resetting it would skew momentum=None averaging if
            # torch training were resumed). Carried in a side collection the
            # flax modules ignore; torch_export restores it.
            self._set(
                self.torch_extras,
                (*path, "num_batches_tracked"),
                int(_np(sd[f"{tkey}.num_batches_tracked"])),
            )

    def scalar(self, sd, tkey, *path):
        self._set(self.params, path, _np(sd[tkey]))

    def variables(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        if self.spectral:
            out["spectral"] = self.spectral
        if self.torch_extras:
            out["torch_extras"] = self.torch_extras
        return out


def import_generator(sd: Dict[str, Any], *, n_layers_G: int = 6, type_norm: str = "BN",
                     attention: bool = True) -> Dict[str, Any]:
    """Reference ResidualPatchGenerator state_dict -> variables pytree.

    Torch module names (models/generators.py:59-83): start.conv, blockN.{conv1,
    conv2}.conv, blockN.conv3, blockN.{bn1,bn2,bn3}, attention.{theta,phi,g,o,
    gamma}, bn, final.conv.
    """
    sd = strip_module_prefix(sd)
    b = _TreeBuilder()
    n_blocks = {4: 4, 5: 5, 6: 6}[n_layers_G]

    b.conv(sd, "start.conv", "start", "conv")
    for i in range(1, n_blocks + 1):
        blk = f"block{i}"
        b.conv(sd, f"{blk}.conv1.conv", blk, "conv1", "conv")
        b.conv(sd, f"{blk}.conv2.conv", blk, "conv2", "conv")
        if f"{blk}.conv3.weight" in sd or f"{blk}.conv3.weight_orig" in sd:
            b.conv(sd, f"{blk}.conv3", blk, "conv3")
        for bn_name in ("bn1", "bn2", "bn3"):
            if type_norm == "BN":
                if f"{blk}.{bn_name}.weight" in sd:
                    b.bn(sd, f"{blk}.{bn_name}", blk, bn_name)
            else:  # SSM
                if f"{blk}.{bn_name}.bn.running_mean" in sd:
                    b.bn(sd, f"{blk}.{bn_name}.bn", blk, bn_name, "bn", affine=False)
                    b.conv(sd, f"{blk}.{bn_name}.mlp_shared.0", blk, bn_name, "mlp_shared")
                    b.conv(sd, f"{blk}.{bn_name}.embed", blk, bn_name, "embed")
    if attention:
        for part in ("theta", "phi", "g", "o"):
            b.conv(sd, f"attention.{part}", "attention", "attn", part)
        b.scalar(sd, "attention.gamma", "attention", "attn", "gamma")
    if type_norm == "BN":
        b.bn(sd, "bn", "bn")
    b.conv(sd, "final.conv", "final", "conv")
    return b.variables()


def import_patch_discriminator(
    sd: Dict[str, Any], *, n_layers_D: int = 4, norm_layer: Optional[str] = None
) -> Dict[str, Any]:
    """Reference PatchDiscriminator (Sequential) state_dict -> variables.

    Sequential layout (models/discriminators.py:187-206): [conv, lrelu] +
    (n_layers_D-1) x ([conv, norm?, lrelu]) + [conv]."""
    sd = strip_module_prefix(sd)
    b = _TreeBuilder()
    idx = 0
    b.conv(sd, f"model.{idx}", "conv0")
    idx += 2  # conv, lrelu
    per = 3 if norm_layer else 2
    for n in range(1, n_layers_D):
        b.conv(sd, f"model.{idx}", f"conv{n}")
        if norm_layer == "batch":
            b.bn(sd, f"model.{idx + 1}", f"norm{n}")
        idx += per
    b.conv(sd, f"model.{idx}", "conv_out")
    return b.variables()


def load_torch_checkpoint(path: str):
    """Load a reference .pth checkpoint (train.py:200-217 format). Returns
    the raw dict: keys epoch, netG_state_dict, netD_state_dict, Gloss, Dloss,
    args, seed (EMA variant: netG_state_dict, args)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
