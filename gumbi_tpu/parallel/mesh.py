"""Device-mesh construction helpers.

The reference has no distributed runtime (its only device knob is a single
CUDA flag, reference gumbi/regression/botorch/GP.py:40). Here scaling is
mesh-native: restarts of the hyperparameter search shard over a 'restart'
axis (data-parallel analog) and large-N Gram/prediction work shards over a
'data' axis (tensor-parallel analog), with XLA inserting ICI collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "shard_leading", "P", "NamedSharding"]


def make_mesh(n_devices=None, restart_axis=1, devices=None) -> Mesh:
    """Build a ('restart', 'data') mesh over the available devices.

    ``restart_axis`` devices are dedicated to parallel restarts; the rest to
    the data axis. Defaults to putting all devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % restart_axis != 0:
        raise ValueError(f"{n} devices not divisible by restart_axis={restart_axis}")
    arr = np.array(devices).reshape(restart_axis, n // restart_axis)
    return Mesh(arr, axis_names=("restart", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding on the mesh."""
    return NamedSharding(mesh, P())


def shard_leading(mesh: Mesh, axis: str) -> NamedSharding:
    """Shard the leading array axis over the named mesh axis."""
    return NamedSharding(mesh, P(axis))
