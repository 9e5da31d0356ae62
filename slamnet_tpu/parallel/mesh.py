"""Device-mesh construction helpers.

The reference's entire "distributed backend" is a hand-rolled thread pool
(BaseSLAM/ParallelWorker.cs); the TPU-native replacement is a jax.sharding.Mesh
with named axes and XLA collectives over ICI (SURVEY.md §2.5, §5.8).

Axis conventions used across the framework:
  'search' — data parallelism over Monte-Carlo candidates / particles (P2)
  'beam'   — sequence parallelism over the lidar beam axis (P3)
  'tile'   — map-row tiling: grid memory sharded across devices with 1-row
             halo exchange (the long-context story, SURVEY.md §5.7)
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Mapping[str, int], devices: Sequence | None = None) -> Mesh:
    """Create a Mesh with the given {axis_name: size} layout.

    The product of sizes must equal the device count (defaults to all devices).
    """
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if devices is None:
        n = int(np.prod(shape))
        devices = jax.devices()[:n]
        dev_mesh = mesh_utils.create_device_mesh(shape, devices=devices)
    else:
        dev_mesh = np.asarray(devices).reshape(shape)
    return Mesh(dev_mesh, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
