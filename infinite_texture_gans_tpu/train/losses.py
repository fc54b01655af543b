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


def gradient_penalty(
    d_fn,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    key,
) -> jnp.ndarray:
    """WGAN-GP gradient penalty (Gulrajani et al. 2017) on random
    interpolates between real and fake samples.

    ``d_fn`` maps an image batch to critic logits. The reference parses
    ``--loss wgan`` but never implements a Lipschitz term
    (reference utils.py:85-86); here the flag is real. When real crops and
    fake patches have different spatial sizes (Exp-1: 192 crops vs 128
    patches) the real batch is center-cropped to the fake patch size — the
    critic is fully convolutional, so penalising its gradient on that input
    domain is the same constraint evaluated at the generated scale. Batches
    are sliced to the smaller of the two so interpolation is one-to-one.
    """
    import jax

    rh, rw = real.shape[1], real.shape[2]
    fh, fw = fake.shape[1], fake.shape[2]
    h, w = min(rh, fh), min(rw, fw)
    real = real[:, (rh - h) // 2 : (rh - h) // 2 + h, (rw - w) // 2 : (rw - w) // 2 + w]
    fake = fake[:, (fh - h) // 2 : (fh - h) // 2 + h, (fw - w) // 2 : (fw - w) // 2 + w]
    n = min(real.shape[0], fake.shape[0])
    real, fake = real[:n], fake[:n]

    eps = jax.random.uniform(key, (n, 1, 1, 1), dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    def critic_sum(x):
        return jnp.sum(d_fn(x))

    g = jax.grad(critic_sum)(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def calc_ralsloss_G(real: jnp.ndarray, fake: jnp.ndarray, margin: float = 1.0):
    """Relativistic-average LS loss (reference utils.py:650-655; dead code in
    the reference pipeline, provided for component parity)."""
    loss_real = jnp.mean((real - fake.mean() + margin) ** 2)
    loss_fake = jnp.mean((fake - real.mean() - margin) ** 2)
    return loss_real + loss_fake
