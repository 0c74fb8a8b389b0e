"""Checkpoint / resume for streaming demodulator state.

SURVEY.md §5: the reference's only durable-state analog is the
carry-over streaming state (NCO phase, filter histories, sync windows,
framing registers — fsk.ts:102-131) held in a mutable object.  Here
that state is an explicit ``DemodState`` pytree, so checkpointing is a
serialization of the pytree: a farm (or single modem) can be snapshot
mid-stream, restarted in a new process, resharded onto a different
mesh, and continue producing bit-identical output.

Plain ``.npz`` is used (self-contained, no service deps); the pytrees
also work directly with orbax if an async checkpointer is wanted.
"""

from __future__ import annotations

import io
import json
from typing import Tuple

import numpy as np

import jax

from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
from webaudio_modem_tpu.ops.fsk_demod import DemodState, init_state


def state_to_arrays(state: DemodState) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def save_state(path_or_file, state: DemodState, config: FSKConfig,
               ds_phase: int = 0) -> None:
    arrays = state_to_arrays(state)
    meta = {
        "config": {
            "sample_rate": config.sample_rate,
            "baud_rate": config.baud_rate,
            "mark_frequency": config.mark_frequency,
            "space_frequency": config.space_frequency,
            "preamble_pattern": list(config.preamble_pattern),
            "sfd_pattern": list(config.sfd_pattern),
            "start_bits": config.start_bits,
            "stop_bits": config.stop_bits,
            "parity": config.parity,
            "sync_threshold": config.sync_threshold,
            "agc_enabled": config.agc_enabled,
            "pre_filter_bandwidth": config.pre_filter_bandwidth,
            "adaptive_threshold": config.adaptive_threshold,
        },
        "ds_phase": ds_phase,
        "n_leaves": len(arrays),
    }
    np.savez(path_or_file, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_state(path_or_file,
               mesh=None) -> Tuple[DemodState, FSKConfig, int]:
    """Returns (state, config, ds_phase); optionally placed on a mesh."""
    with np.load(path_or_file) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        config = FSKConfig.from_dict(meta["config"])
        params = FSKParams.from_config(config)
        batch = int(data["leaf_0"].shape[0])
        template = init_state(params, batch)
        leaves, treedef = jax.tree.flatten(template)
        restored = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
        for ref, got in zip(leaves, restored):
            if ref.shape != got.shape:
                raise ValueError(
                    f"checkpoint shape mismatch: {got.shape} vs "
                    f"{ref.shape} — config/batch changed?")
        state = jax.tree.unflatten(
            treedef, [np.asarray(x) for x in restored])
    if mesh is not None:
        from webaudio_modem_tpu.parallel.sharding import shard_state

        state = shard_state(state, mesh)
    else:
        state = jax.tree.map(jax.numpy.asarray, state)
    return state, config, int(meta["ds_phase"])


def dumps_state(state: DemodState, config: FSKConfig,
                ds_phase: int = 0) -> bytes:
    buf = io.BytesIO()
    save_state(buf, state, config, ds_phase)
    return buf.getvalue()


def loads_state(blob: bytes, mesh=None):
    return load_state(io.BytesIO(blob), mesh=mesh)
