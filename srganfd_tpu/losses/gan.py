"""Adversarial losses.

Parity targets:
- plain BCE-with-logits on real/fake label maps (BSRGAN/Real-ESRGAN/
  A-ESRGAN: ``BSRGAN/train_bsrgan.py:403-427`` — labels are full
  ``[N,H,W,1]`` maps for the U-Net discriminators);
- ESRGAN's relativistic average form ``C(x_r) - E[C(x_f)]``
  (``ESRGAN/train_esrgan.py:379-381,407-415``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits", "relativistic_d_loss", "relativistic_g_loss"]


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (torch ``BCEWithLogitsLoss``
    semantics, numerically stable form). Computes in at least f32 (bf16
    logits are promoted; f64 under x64 stays f64 for parity tests)."""
    dt = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(dt)
    targets = targets.astype(dt)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def relativistic_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """ESRGAN discriminator loss: the reference computes
    ``BCE(real - mean(fake), 1)`` (fake detached) and
    ``BCE(fake - mean(real), 0)`` (real from the already-computed graph),
    each halved and stepped together (``ESRGAN/train_esrgan.py:400-420``).
    Callers are responsible for stop_gradient on the generator output."""
    loss_real = bce_with_logits(real_logits - jnp.mean(fake_logits), jnp.ones_like(real_logits))
    loss_fake = bce_with_logits(fake_logits - jnp.mean(real_logits), jnp.zeros_like(fake_logits))
    return 0.5 * (loss_real + loss_fake)


def relativistic_g_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """ESRGAN generator adversarial term: symmetric relativistic BCE with
    flipped labels (``ESRGAN/train_esrgan.py:379-381``); the real branch is
    detached by the caller."""
    loss_real = bce_with_logits(real_logits - jnp.mean(fake_logits), jnp.zeros_like(real_logits))
    loss_fake = bce_with_logits(fake_logits - jnp.mean(real_logits), jnp.ones_like(fake_logits))
    return 0.5 * (loss_real + loss_fake)
