"""Losses: pixel/GAN/VGG-content/LPIPS."""

from srganfd_tpu.losses.gan import (  # noqa: F401
    bce_with_logits,
    relativistic_d_loss,
    relativistic_g_loss,
)
from srganfd_tpu.losses.content import ContentLoss, VGG19Features  # noqa: F401
