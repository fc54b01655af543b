"""TPU-native framework for seamless infinite-sized texture synthesis with
patch-based GANs ("Local Padding in Patch-Based GANs", arXiv:2309.02340).

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference PyTorch implementation (ai4netzero/Infinite_Texture_GANs), designed
TPU-first:

- Generator activations live in *merged grid layout* ``(N, gh*H, gw*W, C)``
  (NHWC). Training-mode "local padding" (reference merge->pad->crop around
  every conv, models/layers.py:145-173) is mathematically identical to a
  replicate-padded convolution on the merged grid, so the hot path is plain
  large XLA convolutions on the MXU with zero data movement.
- The inference halo cache (reference models/layers.py:70-143, four mutable
  tensors per conv) is an explicit functional pytree threaded through
  ``lax.scan`` over the canvas raster — jit-safe, checkpointable, race-free
  by construction.
- Multi-chip scaling uses ``jax.sharding.Mesh`` + jit shardings (data axis)
  instead of the reference's ``nn.DataParallel``.
"""

__version__ = "0.1.0"

from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator
from infinite_texture_gans_tpu.models.discriminator import (
    PatchDiscriminator,
    ResDiscriminator,
    DCDiscriminator,
    SNDiscriminator,
)

__all__ = [
    "ResidualPatchGenerator",
    "PatchDiscriminator",
    "ResDiscriminator",
    "DCDiscriminator",
    "SNDiscriminator",
]
