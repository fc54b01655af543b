"""Device mesh + sharding.

Replaces the reference's single-process ``nn.DataParallel``
(reference train.py:74-77: replicate module, scatter batch, gather outputs,
NCCL under the hood) with the TPU-native equivalent: a
``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded over it,
parameters are replicated, and XLA inserts the gradient ``psum`` over ICI
automatically when the jitted train step consumes sharded inputs.

The CLI's ``--num_gpus``/``--gpu_list`` map onto the mesh for command-line
compatibility; ``--mesh data:N`` specifies it directly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    spec: Optional[str] = None,
    num_devices: Optional[int] = None,
    device_list: Optional[list] = None,
) -> Optional[Mesh]:
    """Build a 1-axis data mesh.

    spec: 'data:N' (or None). num_devices: fallback count (--num_gpus).
    device_list: explicit device indices (--gpu_list, reference
    utils.py:134-145 picks concrete devices the same way).
    Returns None for single-device runs (no sharding needed).
    """
    if spec:
        axis, _, n = spec.partition(":")
        n = int(n) if n else len(jax.devices())
        if axis != "data":
            raise ValueError(f"unsupported mesh axis {axis!r}; expected 'data'")
    else:
        n = num_devices or 1
    if n <= 1:
        return None
    all_devices = jax.devices()
    if device_list:
        bad = [i for i in device_list if i < 0 or i >= len(all_devices)]
        if bad:
            raise ValueError(
                f"--gpu_list indices {bad} out of range: only "
                f"{len(all_devices)} devices available"
            )
        if len(set(device_list)) != len(device_list):
            raise ValueError(f"--gpu_list contains duplicates: {device_list}")
        if len(device_list) < n:
            raise ValueError(
                f"--gpu_list has {len(device_list)} entries but the mesh "
                f"needs {n} devices"
            )
        devices = [all_devices[i] for i in device_list[:n]]
    else:
        devices = all_devices[:n]
    if len(devices) < n:
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.array(devices), ("data",))


def shard_batch(x: Any, mesh: Optional[Mesh]):
    """Put a host batch on device, sharded on the leading axis."""
    if mesh is None:
        return jax.device_put(x)
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(tree: Any, mesh: Optional[Mesh]):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
