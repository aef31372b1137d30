"""Device mesh helpers for barcode-sharded execution.

The demultiplexing workload is data-parallel over barcodes: call tables and
logits shard on the barcode axis, genotype beta tables replicate, and EM
M-step partials merge with one psum per iteration. A 1-D mesh over all
devices is the right shape at any scale (chips on ICI, hosts via
jax.distributed over DCN).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

BARCODE_AXIS = "barcodes"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = BARCODE_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def call_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for flat per-call arrays laid out shard-major by barcode range."""
    return NamedSharding(mesh, PartitionSpec(BARCODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def init_distributed(**kwargs) -> None:
    """Initialize multi-host execution (wraps jax.distributed.initialize).

    Call once per host process before any computation when running on a
    multi-host pod slice; single-host usage needs nothing.
    """
    jax.distributed.initialize(**kwargs)


def put_global(x, sharding: NamedSharding):
    """Place a host array onto a (possibly multi-host) sharding.

    Single-process meshes use a plain device_put; on multi-host meshes each
    process contributes the shards it can address (every process must hold
    the same logical array — host-local loading of only-your-shard data can
    pass a callback-compatible view instead).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    import numpy as np

    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def to_host(x):
    """Fetch a device array to host numpy, multi-host safe.

    Replicated or sharded global arrays on non-addressable meshes are
    reassembled via allgather across processes.
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
