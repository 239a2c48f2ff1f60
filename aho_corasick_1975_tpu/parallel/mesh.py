"""Device mesh helpers.

The reference has no distributed dimension at all (SURVEY.md §2c) — its only
concurrency is a process-local mutex (aho_corasick.c:81). Here the corpus is
sharded data-parallel over a 1-D ``jax.sharding.Mesh`` ("data" axis), the
automaton tables are replicated per chip, and match reductions ride XLA
collectives over ICI/DCN. A 1-D mesh is the right shape for this workload:
the automaton is small and replicated (no tensor/pipeline dimension), so all
devices — across hosts too — form one data axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def data_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis_name))
