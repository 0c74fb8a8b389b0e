"""Device-mesh sharding for the channel batch.

The reference's only parallelism axis is independent modem channels
(one FSKCore per AudioWorkletNode, demo/demo.js:233-237); here that
axis is the leading [B] batch dimension of every kernel, and multi-chip
scale-out shards B across a 1-D ``jax.sharding.Mesh`` over ICI.
Channels never communicate, so the sharding is embarrassingly parallel:
XLA inserts no collectives, and each chip runs the identical fused
demod pipeline on its B/n_devices slice — the layout the scaling
playbook calls pure data parallelism with zero cross-shard traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHANNEL_AXIS = "channels"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = CHANNEL_AXIS) -> Mesh:
    """1-D mesh over the channel axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"need {n_devices} devices, have {len(devices)}")
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def channel_sharding(mesh: Mesh,
                     axis_name: str = CHANNEL_AXIS) -> NamedSharding:
    """Shard the leading (channel) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def check_mesh_batch(batch: int, mesh: Mesh, who: str,
                     axis_name: str = CHANNEL_AXIS) -> None:
    """Fail fast (clear ValueError) when ``batch`` does not divide the
    channel mesh axis: ``jax.device_put`` of a [B] leaf over
    ``P(channels)`` otherwise raises an opaque sharding error deep in
    construction."""
    n = mesh.shape.get(axis_name, 1) if hasattr(mesh, "shape") else 1
    if n and batch % n != 0:
        raise ValueError(
            f"{who}(batch={batch}, mesh={n} devices on "
            f"'{axis_name}'): the channel batch must divide the mesh "
            f"evenly — every [B] state leaf shards over P('{axis_name}')"
            f"; use a batch that is a multiple of {n}")


def shard_state(state, mesh: Mesh, axis_name: str = CHANNEL_AXIS):
    """Place a demod-state pytree with the channel axis sharded over
    ``mesh``.  Channel position by leaf rank: 1-D leaves are [B];
    leaves of rank >= 2 (the time-major carried windows) are [..., B];
    0-d leaves (e.g. the PSK delay-line index, shared by every channel)
    are replicated."""

    def place(x):
        if x.ndim == 0:
            spec = P()
        elif x.ndim == 1:
            spec = P(axis_name)
        else:
            spec = P(*([None] * (x.ndim - 1)), axis_name)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)
