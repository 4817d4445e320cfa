"""Mesh construction helpers.

One logical axis ("shards") is enough for domain-sharded NTT/codeword
work: within a slice the axis maps onto ICI; across hosts XLA routes the
same collectives over DCN.  Multi-host initialization goes through
``jax.distributed.initialize`` (call :func:`init_distributed` once per
process before any backend use).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "shards",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over the first ``num_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def cpu_mesh(num_devices: int, axis_name: str = "shards") -> Mesh:
    """A mesh over virtual CPU devices (requires
    ``--xla_force_host_platform_device_count``); used by CI and the
    multi-chip dry run to validate sharding without TPU hardware."""
    return make_mesh(num_devices, axis_name, devices=jax.devices("cpu"))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host process bring-up (jax.distributed.initialize wrapper)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_device_get(x):
    """``jax.device_get`` that also works on process-spanning arrays.

    In a multi-controller run each process addresses only its local
    shards; fetching a global array directly raises.  Every controller
    runs the same host-side prover program in lockstep, so the global
    value is what all of them need — allgather it (tiled reassembly of
    the shards) and fetch.  Fully-addressable arrays (single process, or
    replicated locally) keep the direct, allgather-free path.
    """
    if getattr(x, "is_fully_addressable", True):
        return jax.device_get(x)
    from jax.experimental import multihost_utils

    import numpy as np

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
