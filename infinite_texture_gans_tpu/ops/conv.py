"""Convolution / linear primitives: orthogonal init, spectral norm, factories.

Equivalents of reference models/layers.py:178-200 (conv3x3/conv4x4/conv1x1/
Linear with optional spectral normalization) and utils.py:745-763
(orthogonal init). Weights are HWIO (TPU-native NHWC convs on the MXU);
spectral norm is explicit power-iteration state in a ``spectral`` variable
collection instead of a hidden forward hook.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# Orthogonal init, matching torch.nn.init.orthogonal_ on the (O, I*kh*kw)
# weight view (reference utils.py:745-763): flax builds the orthonormal
# matrix over (prod(other dims), column_axis) which is the same distribution
# transposed.
orthogonal = nn.initializers.orthogonal


# NOTE: the reference's init_weight has an N(1, 0.02) branch for BatchNorm
# scales (utils.py:752-754), but it is dead code there — .apply(init_weight)
# is only called on the Conv/Linear factories (models/layers.py:180-200),
# never on BatchNorm2d instances — so torch's default ones-init is what the
# reference actually uses, and flax's default matches it. See PARITY.md.


def spectral_normalize(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    update: bool,
    n_iter: int = 1,
    eps: float = 1e-12,
):
    """Spectral normalization; returns (kernel/sigma, new_u, new_v).

    Matches ``torch.nn.utils.spectral_norm`` semantics exactly: the weight is
    viewed as (O, -1); u, v are stop-gradient buffers persisted across steps;
    in train mode one power iteration refreshes them, in eval sigma is
    computed from the *stored* vectors without iterating;
    sigma = u^T W v is differentiated w.r.t. W only. HWIO kernels are
    transposed to (O, I*kh*kw) so stored u/v are interchangeable with
    torch's for weight import.
    """
    o = kernel.shape[-1]
    w_mat = kernel.reshape(-1, o).T  # (O, I*kh*kw)
    u_ = lax.stop_gradient(u)
    v_ = lax.stop_gradient(v)
    if update:
        for _ in range(n_iter):
            v_ = w_mat.T @ u_
            v_ = v_ / (jnp.linalg.norm(v_) + eps)
            u_ = w_mat @ v_
            u_ = u_ / (jnp.linalg.norm(u_) + eps)
        u_ = lax.stop_gradient(u_)
        v_ = lax.stop_gradient(v_)
    sigma = jnp.dot(u_, w_mat @ v_)
    return kernel / sigma, u_, v_


def _u_init(features: int, salt: int = 0) -> jnp.ndarray:
    """Power-iteration singular-vector estimate init (unit normal,
    normalized — torch uses the same; the vectors converge within a few
    training forwards regardless of the key)."""
    u = jax.random.normal(jax.random.key(salt), (features,))
    return u / (jnp.linalg.norm(u) + 1e-12)


def sn_kernel(mdl, kernel: jnp.ndarray, features: int, update_sn: bool):
    """Declare the ``spectral`` u/v variables on module ``mdl`` and return
    the spectrally-normalized kernel. THE single copy of the SN
    parameter/spectral-tree contract (names, shapes, one power-iteration
    step per update) — checkpoints and the torch importer depend on it, so
    every conv/dense/stem module must route through here."""
    u_var = mdl.variable("spectral", "u", _u_init, features, 0)
    v_var = mdl.variable("spectral", "v", _u_init, kernel.size // features, 1)
    do_update = update_sn and not mdl.is_initializing()
    kernel, u_new, v_new = spectral_normalize(
        kernel, u_var.value, v_var.value, do_update
    )
    if do_update:
        u_var.value = u_new
        v_var.value = v_new
    return kernel


class Conv(nn.Module):
    """NHWC conv with orthogonal init and optional spectral normalization.

    ``padding`` is an int (symmetric explicit pad, matching torch's
    ``padding=p``) — e.g. kernel 4 / stride 2 / pad 1 halves resolution
    exactly like the reference conv4x4 (models/layers.py:190-194).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    sn: bool = False
    dtype: Any = jnp.float32
    kernel_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        ks = self.kernel_size
        init = self.kernel_init if self.kernel_init is not None else orthogonal(column_axis=-1)
        kernel = self.param("kernel", init, (ks, ks, in_ch, self.features))
        if self.sn:
            kernel = sn_kernel(self, kernel, self.features, update_sn)
        pad = [(self.padding, self.padding)] * 2
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (self.strides, self.strides),
            pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """Linear layer with orthogonal init and optional spectral norm
    (reference models/layers.py:184-188)."""

    features: int
    use_bias: bool = True
    sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", orthogonal(column_axis=-1), (in_ch, self.features))
        if self.sn:
            kernel = sn_kernel(self, kernel, self.features, update_sn)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def conv3x3(features, sn=False, strides=1, padding=1, use_bias=True, dtype=jnp.float32, name=None):
    return Conv(features, 3, strides, padding, use_bias, sn, dtype, name=name)


def conv4x4(features, sn=False, strides=2, padding=1, use_bias=True, dtype=jnp.float32, name=None):
    return Conv(features, 4, strides, padding, use_bias, sn, dtype, name=name)


def conv1x1(features, sn=False, strides=1, padding=0, use_bias=True, dtype=jnp.float32, name=None):
    return Conv(features, 1, strides, padding, use_bias, sn, dtype, name=name)
