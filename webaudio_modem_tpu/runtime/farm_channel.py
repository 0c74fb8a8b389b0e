"""Farm-scale data channels: N concurrent transports over ONE batched farm.

The reference runs one modem per AudioWorkletNode and one transport per
modem (demo/demo.js:233-250).  Here the same IDataChannel surface
(src/core.ts:45-70) is served per channel as a VIEW over a single
batched ``ModemFarm`` pair: every audio quantum moves ONE [B, T] frame
per direction through the jitted demod pipeline, and the decoded byte
streams are parsed by the native C++ deframer
(native/modem_native.cpp) into per-channel wire events — no per-byte
Python on the drain path.

Topology: ``FarmLoopbackHub`` models B independent full-duplex wires
between side "a" and side "b" (a's TX is b's RX and vice versa, like
B loopback GainNode pairs).  ``hub.channel("a", i)`` returns the
IDataChannel for wire i as seen from side a.

Fast path: a ``FarmDataChannel`` also exposes ``next_frame()`` /
``supports_frames`` — XModemTransport detects this and consumes parsed
PACKET/CONTROL events directly (C++-deframed) instead of re-parsing a
byte stream in Python.
"""

from __future__ import annotations

import asyncio
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from webaudio_modem_tpu.core import IDataChannel
from webaudio_modem_tpu.models.farm import ModemFarm
from webaudio_modem_tpu.native.deframer import Deframer, Frame
from webaudio_modem_tpu.utils.abort import (AbortError, AbortSignal,
                                            race_abort)
from webaudio_modem_tpu.utils.trace import metrics


class _TxSlot:
    """Per-channel transmit queue: signals waiting to play out."""

    __slots__ = ("queue",)

    def __init__(self):
        # list of [signal np.ndarray, position int, future]
        self.queue: List[list] = []

    def pending(self) -> bool:
        return bool(self.queue)

    def fill(self, out: np.ndarray) -> None:
        """Copy up to len(out) samples into ``out`` (already zeroed),
        resolving futures of fully played signals."""
        offset = 0
        while self.queue and offset < len(out):
            entry = self.queue[0]
            sig, pos, fut = entry
            n = min(len(out) - offset, len(sig) - pos)
            out[offset:offset + n] = sig[pos:pos + n]
            offset += n
            entry[1] = pos + n
            if entry[1] >= len(sig):
                self.queue.pop(0)
                if fut is not None and not fut.done():
                    fut.set_result(None)

    def abort_all(self, exc: Exception) -> None:
        for _, _, fut in self.queue:
            if fut is not None and not fut.done():
                fut.set_exception(exc)
        self.queue.clear()


class FarmDataChannel(IDataChannel):
    """IDataChannel view of one wire endpoint on a FarmLoopbackHub.

    ``modulate`` resolves when the signal has fully entered the wire
    (played out of this side's transmit queue), mirroring the
    reference's modulate-resolves-on-playout contract
    (fsk-processor.ts:89-111).  ``demodulate`` blocks until bytes are
    available (fsk-processor.ts:113-135).  ``next_frame`` blocks until
    the native deframer emits the next wire event.
    """

    supports_frames = True

    # backlog bound while NO consumer is attached: bytes decoded before
    # anyone asks are retained (the hub's auto-created views), but a
    # channel that only ever decodes noise must not grow its queues
    # without bound on a long-running hub — beyond this many queued
    # items the oldest are dropped until a consumer attaches
    UNCONSUMED_BACKLOG = 1024

    def __init__(self, hub: "FarmLoopbackHub", side: str, index: int):
        self._hub = hub
        self.side = side
        self.index = index
        self._bytes_q: asyncio.Queue = asyncio.Queue()
        self._frames_q: asyncio.Queue = asyncio.Queue()
        # which surface the consumer uses (a transport picks one);
        # the unused queue stops filling so long runs don't leak
        self._byte_consumer = False
        self._frame_consumer = False
        # reset() drops blocked demodulate()/next_frame() waiters (same
        # contract as QueueDataChannel.reset / the reference mock)
        self._pending_gets: list = []
        self._reset_gen = 0

    # -- IDataChannel ---------------------------------------------------

    async def modulate(self, data: bytes,
                       signal: Optional[AbortSignal] = None) -> None:
        if signal is not None:
            signal.throw_if_aborted()
        data = bytes(data)
        if not data:
            return
        sig = self._hub._modulate_signal(data)
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        entry = [sig, 0, fut]
        slot = self._hub._tx(self.side, self.index)
        slot.queue.append(entry)
        try:
            await race_abort(fut, signal)
        except BaseException:
            # halt playout of the aborted transmission — the remainder
            # must not keep feeding the wire (FSKProcessor abort parity)
            if entry in slot.queue:
                slot.queue.remove(entry)
            raise

    async def _get(self, queue: asyncio.Queue, signal):
        get_task = asyncio.ensure_future(queue.get())
        self._pending_gets.append(get_task)
        gen = self._reset_gen
        try:
            item = await race_abort(get_task, signal)
        except asyncio.CancelledError:
            if self._reset_gen != gen:
                raise AbortError("DataChannel reset")
            raise  # genuine external cancellation must propagate
        finally:
            if get_task in self._pending_gets:
                self._pending_gets.remove(get_task)
        if isinstance(item, Exception):
            raise item
        return item

    async def demodulate(self,
                         signal: Optional[AbortSignal] = None) -> bytes:
        self._byte_consumer = True
        return await self._get(self._bytes_q, signal)

    async def next_frame(self,
                         signal: Optional[AbortSignal] = None) -> Frame:
        self._frame_consumer = True
        return await self._get(self._frames_q, signal)

    def flush_frames(self) -> None:
        """Drop queued frames and any partially assembled wire bytes —
        the frame-path analog of the byte path's RX-buffer flush on a
        receive error (xmodem.ts:256-259)."""
        while not self._frames_q.empty():
            self._frames_q.get_nowait()
        self._hub._deframer(self.side).reset(self.index)

    async def reset(self) -> None:
        self._hub._tx(self.side, self.index).abort_all(
            AbortError("DataChannel reset"))
        for q in (self._bytes_q, self._frames_q):
            while not q.empty():
                q.get_nowait()
        # drop blocked demodulate()/next_frame() waiters — they raise
        # AbortError, matching QueueDataChannel.reset and the
        # reference's reset-rejects-pending contract
        # (webaudio-data-channel.ts:164-174)
        self._reset_gen += 1
        pending, self._pending_gets = self._pending_gets, []
        for t in pending:
            if not t.done():
                t.cancel()
        self._hub._deframer(self.side).reset(self.index)

    def is_ready(self) -> bool:
        return True

    # -- hub delivery ----------------------------------------------------

    def _deliver(self, piece: bytes, frames: List[Frame]) -> None:
        # fill both surfaces until the consumer picks one, then stop
        # filling (and drop) the unused queue — otherwise a long-running
        # hub leaks one queue per channel forever
        frame_only = self._frame_consumer and not self._byte_consumer
        byte_only = self._byte_consumer and not self._frame_consumer
        unconsumed = not (self._byte_consumer or self._frame_consumer)
        if piece and not frame_only:
            self._bytes_q.put_nowait(piece)
        elif frame_only:
            while not self._bytes_q.empty():
                self._bytes_q.get_nowait()
        if not byte_only:
            for f in frames:
                self._frames_q.put_nowait(f)
        elif byte_only:
            while not self._frames_q.empty():
                self._frames_q.get_nowait()
        if unconsumed:
            # no consumer yet: retain a bounded backlog, drop oldest
            for q in (self._bytes_q, self._frames_q):
                while q.qsize() > self.UNCONSUMED_BACKLOG:
                    q.get_nowait()


class FarmLoopbackHub:
    """B independent full-duplex wires, each direction one ModemFarm.

    ``run()`` pumps audio quanta: per step and per direction it
    assembles the [B, T] transmit frame from the per-channel TX queues,
    applies ``channel_fn`` (AWGN etc., see sim/channels.py), feeds the
    receiving side's batched demodulator, and drains decoded bytes
    through the native C++ deframer into per-channel queues.
    """

    def __init__(self, config, batch: int, quantum: int = 4800,
                 channel_fn: Optional[Callable] = None,
                 mesh=None):
        self.config = config
        self.batch = batch
        self.quantum = quantum
        self.channel_fn = channel_fn
        # direction x->y: modulated by side x, demodulated by farm of y
        self._farms = {"a": ModemFarm(config, batch, mesh=mesh),
                       "b": ModemFarm(config, batch, mesh=mesh)}
        self._deframers = {"a": Deframer(batch), "b": Deframer(batch)}
        self._tx_slots: Dict[str, List[_TxSlot]] = {
            "a": [_TxSlot() for _ in range(batch)],
            "b": [_TxSlot() for _ in range(batch)]}
        self._channels: Dict[Tuple[str, int], FarmDataChannel] = {}
        # host/device pipelining: the DemodOut of the chunk dispatched
        # at step t is drained at step t+1, so the device computes
        # chunk t+1 while the host parses t (SURVEY §2 PP analog)
        self._pending: Dict[str, Optional[object]] = {"a": None, "b": None}
        self._running = False
        self.steps = 0
        self._params = self._farms["a"].params

    # -- wiring -----------------------------------------------------------

    def channel(self, side: str, index: int) -> FarmDataChannel:
        key = (side, index)
        if key not in self._channels:
            self._channels[key] = FarmDataChannel(self, side, index)
        return self._channels[key]

    def _tx(self, side: str, index: int) -> _TxSlot:
        return self._tx_slots[side][index]

    def _deframer(self, rx_side: str) -> Deframer:
        return self._deframers[rx_side]

    def _modulate_signal(self, data: bytes) -> np.ndarray:
        # dispatch through the farm's model family (FSK or PSK), not a
        # hardcoded modulator
        ops = self._farms["a"]._ops
        sig = ops.modulate_batch(self._params, [data])
        return np.asarray(sig, dtype=np.float32)[0]

    # -- the pump ----------------------------------------------------------

    def _assemble(self, side: str) -> Optional[np.ndarray]:
        slots = self._tx_slots[side]
        if not any(s.pending() for s in slots):
            return None
        frame = np.zeros((self.batch, self.quantum), np.float32)
        for b, slot in enumerate(slots):
            if slot.pending():
                slot.fill(frame[b])
        return frame

    def _drain(self, rx_side: str, out) -> None:
        """Parse one DemodOut into per-channel byte/frame queues
        through the native deframer (forces device->host transfer)."""
        counts = np.asarray(out.byte_count)
        if not counts.any():
            return
        vals = np.asarray(out.bytes_out)
        deframer = self._deframers[rx_side]
        for b in np.nonzero(counts)[0]:
            piece = bytes(vals[b, :counts[b]])
            deframer.push(int(b), piece)
            frames = deframer.poll_all(int(b))
            # auto-create the view so bytes decoded before anyone
            # asked for the channel are not lost
            self.channel(rx_side, int(b))._deliver(piece, frames)

    def step(self) -> None:
        """One audio quantum for both directions.

        Pipelined: dispatch this quantum's demod (async under jax) and
        THEN drain the previous quantum's outputs, overlapping device
        compute with host-side parsing.  Call ``flush()`` (or one extra
        ``step()``) to force out the last quantum's bytes."""
        for tx_side, rx_side in (("a", "b"), ("b", "a")):
            frame = self._assemble(tx_side)
            if frame is None:
                # silence still advances the receiver's EOD/silence
                # tracking
                frame = np.zeros((self.batch, self.quantum), np.float32)
            if self.channel_fn is not None:
                frame = np.asarray(self.channel_fn(frame),
                                   dtype=np.float32)
            farm = self._farms[rx_side]
            with metrics.timer("farm_hub.chunk"):
                out = farm.demodulate_chunk(frame)     # async dispatch
                prev, self._pending[rx_side] = \
                    self._pending[rx_side], out
                if prev is not None:
                    self._drain(rx_side, prev)
        self.steps += 1

    def flush(self) -> None:
        """Drain any pipelined-but-unparsed demod outputs."""
        for side in ("a", "b"):
            out, self._pending[side] = self._pending[side], None
            if out is not None:
                self._drain(side, out)

    async def run(self, max_steps: Optional[int] = None,
                  idle_limit: Optional[int] = None) -> None:
        """Pump until stopped; yields to the event loop each step so
        transport coroutines interleave.  ``idle_limit`` stops after
        that many consecutive silent steps (both directions idle)."""
        self._running = True
        idle = 0
        n = 0
        try:
            while self._running and (max_steps is None or n < max_steps):
                busy = any(s.pending()
                           for side in ("a", "b")
                           for s in self._tx_slots[side])
                self.step()
                n += 1
                idle = 0 if busy else idle + 1
                if idle_limit is not None and idle >= idle_limit:
                    break
                await asyncio.sleep(0)
        finally:
            self._running = False
            self.flush()

    def stop(self) -> None:
        self._running = False

    def get_status(self) -> dict:
        return {
            "steps": self.steps,
            "native_deframer": self._deframers["a"].is_native,
            "farm_a": self._farms["a"].get_status(),
            "farm_b": self._farms["b"].get_status(),
        }
