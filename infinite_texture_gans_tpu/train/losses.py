"""GAN losses — flag-complete.

The reference parses ``--loss standard|hinge|wgan`` but hard-codes
BCEWithLogits (reference utils.py:85-86 vs train.py:81). Here the flag is
implemented for real, with ``standard`` as the parity default (SURVEY.md
§2.8). Labels support one-sided smoothing (``--smooth`` -> real label 0.9,
reference train.py:84-89); the smoothed label is also used as the G target
(train.py:164).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _bce_mean(logits: jnp.ndarray, label: float) -> jnp.ndarray:
    labels = jnp.full_like(logits, label)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def d_loss_real(loss_type: str, real_logit: jnp.ndarray, label_t: float = 1.0):
    if loss_type == "hinge":
        return jnp.mean(jnp.maximum(0.0, 1.0 - real_logit))
    if loss_type == "wgan":
        return -jnp.mean(real_logit)
    return _bce_mean(real_logit, label_t)


def d_loss_fake(loss_type: str, fake_logit: jnp.ndarray, label_f: float = 0.0):
    if loss_type == "hinge":
        return jnp.mean(jnp.maximum(0.0, 1.0 + fake_logit))
    if loss_type == "wgan":
        return jnp.mean(fake_logit)
    return _bce_mean(fake_logit, label_f)


def g_loss(loss_type: str, fake_logit: jnp.ndarray, label_t: float = 1.0):
    if loss_type in ("hinge", "wgan"):
        return -jnp.mean(fake_logit)
    return _bce_mean(fake_logit, label_t)


def calc_ralsloss_G(real: jnp.ndarray, fake: jnp.ndarray, margin: float = 1.0):
    """Relativistic-average LS loss (reference utils.py:650-655; dead code in
    the reference pipeline, provided for component parity)."""
    loss_real = jnp.mean((real - fake.mean() + margin) ** 2)
    loss_fake = jnp.mean((fake - real.mean() - margin) ** 2)
    return loss_real + loss_fake
