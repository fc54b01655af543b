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

import os as _os


def host_cache_fingerprint() -> str:
    """Short fingerprint of this host's CPU identity (arch + ISA flags +
    vendor/family/model/name/stepping/cache size).

    XLA's persistent-cache key does NOT include the compile host's CPU
    target features, and XLA:CPU AOT executables compiled on a machine with
    a richer ISA abort (SIGABRT/SIGILL) when loaded on a host without it —
    observed when this environment migrated machines mid-round. Keying the
    cache directory by host CPU makes a migration start a fresh cache
    instead of loading incompatible executables. Flags alone proved too
    weak a key (round 3: "machine features don't match" AOT loads slipped
    through on a migrated host with identical flags), so the full identity
    lines participate — XLA's CpuMachineFeatures compares more than the ISA.
    TPU executables don't depend on the host ISA, so the only cost is one
    cold compile per new host."""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key == "flags":
                    ident.append(" ".join(sorted(line.split(":", 1)[1].split())))
                elif key in (
                    "vendor_id", "cpu family", "model", "model name",
                    "stepping", "cache size",
                ):
                    ident.append(line.split(":", 1)[1].strip())
                elif key == "power management":  # end of first processor block
                    break
    except OSError:
        pass
    import hashlib
    import platform

    return hashlib.md5(
        (platform.machine() + ":" + "|".join(ident)).encode()
    ).hexdigest()[:8]


def _enable_persistent_compilation_cache() -> None:
    """XLA compiles of the full train step take minutes on TPU; cache the
    compiled executables on disk so every CLI/bench process after the first
    starts warm. Opt out with ITG_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("ITG_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"),
            ".cache",
            "itg_tpu_xla_" + host_cache_fingerprint(),
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


_enable_persistent_compilation_cache()

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
