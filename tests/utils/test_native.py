"""Native runtime component tests: C++ CRC-16 and XModem deframer,
cross-checked against the pure-Python implementations."""

import numpy as np
import pytest

from webaudio_modem_tpu.native import get_lib
from webaudio_modem_tpu.native.deframer import (CONTROL, JUNK, PACKET,
                                                BAD_CRC, Deframer, Frame)
from webaudio_modem_tpu.transports.xmodem import ControlType, XModemPacket
from webaudio_modem_tpu.utils.crc16 import CRC16


def _wire(seq, payload):
    return XModemPacket.serialize(XModemPacket.create_data(seq, payload))


native_available = get_lib() is not None


@pytest.mark.skipif(not native_available, reason="g++ lib not built")
class TestNativeCRC:
    def test_matches_python_vectors(self):
        lib = get_lib()
        for data, expected in [(b"", 0xFFFF), (b"A", 0xB915),
                               (b"123456789", 0x29B1),
                               (bytes([0x00]), 0xE1F0),
                               (bytes([0xFF]), 0xFF00)]:
            assert lib.wam_crc16(data, len(data)) == expected

    def test_matches_python_random(self):
        lib = get_lib()
        rng = np.random.RandomState(0)
        for _ in range(20):
            data = bytes(rng.randint(0, 256, rng.randint(0, 300),
                                     dtype=np.uint8))
            assert lib.wam_crc16(data, len(data)) == CRC16.calculate(data)


@pytest.mark.parametrize("force_python",
                         [True] + ([False] if native_available else []))
class TestDeframer:
    def test_single_packet(self, force_python):
        d = Deframer(1, force_python=force_python)
        d.push(0, _wire(1, b"hello"))
        f = d.poll(0)
        assert f == Frame(kind=PACKET, seq=1, payload=b"hello")
        assert d.poll(0) is None

    def test_incremental_bytes(self, force_python):
        d = Deframer(1, force_python=force_python)
        wire = _wire(7, b"abc")
        for b in wire[:-1]:
            d.push(0, bytes([b]))
            assert d.poll(0) is None
        d.push(0, wire[-1:])
        f = d.poll(0)
        assert f.kind == PACKET and f.seq == 7 and f.payload == b"abc"

    def test_control_bytes(self, force_python):
        d = Deframer(1, force_python=force_python)
        d.push(0, bytes([ControlType.ACK, ControlType.NAK,
                         ControlType.EOT]))
        assert [d.poll(0).byte for _ in range(3)] == [0x06, 0x15, 0x04]

    def test_junk_skipped(self, force_python):
        d = Deframer(1, force_python=force_python)
        d.push(0, b"\x99" + _wire(1, b"x"))
        f1 = d.poll(0)
        assert f1.kind == JUNK and f1.byte == 0x99
        assert d.poll(0).kind == PACKET

    def test_bad_crc_reported(self, force_python):
        d = Deframer(1, force_python=force_python)
        wire = bytearray(_wire(1, b"abc"))
        wire[-1] ^= 0xFF
        d.push(0, bytes(wire))
        assert d.poll(0).kind == BAD_CRC

    def test_empty_payload_packet(self, force_python):
        d = Deframer(1, force_python=force_python)
        d.push(0, _wire(3, b""))
        f = d.poll(0)
        assert f.kind == PACKET and f.payload == b""

    def test_multichannel_independence(self, force_python):
        d = Deframer(3, force_python=force_python)
        d.push(0, _wire(1, b"zero"))
        d.push(2, _wire(9, b"two"))
        assert d.poll(1) is None
        assert d.poll(0).payload == b"zero"
        assert d.poll(2).seq == 9

    def test_poll_all_mixed_stream(self, force_python):
        d = Deframer(1, force_python=force_python)
        stream = (bytes([ControlType.NAK]) + _wire(1, b"a")
                  + bytes([ControlType.ACK]) + _wire(2, b"b")
                  + bytes([ControlType.EOT]))
        d.push(0, stream)
        kinds = [f.kind for f in d.poll_all(0)]
        assert kinds == [CONTROL, PACKET, CONTROL, PACKET, CONTROL]

    def test_reset(self, force_python):
        d = Deframer(1, force_python=force_python)
        d.push(0, b"\x01\x01")  # partial header
        assert d.pending(0) == 2
        d.reset(0)
        assert d.pending(0) == 0


@pytest.mark.skipif(not native_available, reason="g++ lib not built")
def test_native_matches_python_on_fuzzed_streams():
    rng = np.random.RandomState(42)
    dn = Deframer(1)
    dp = Deframer(1, force_python=True)
    assert dn.is_native
    # fuzz: valid packets interleaved with junk and corruption
    stream = bytearray()
    for i in range(30):
        r = rng.randint(4)
        if r == 0:
            stream += _wire(rng.randint(1, 256),
                            bytes(rng.randint(0, 256, rng.randint(0, 40),
                                              dtype=np.uint8)))
        elif r == 1:
            stream += bytes([rng.choice([0x04, 0x06, 0x15])])
        elif r == 2:
            stream += bytes(rng.randint(0, 256, rng.randint(1, 10),
                                        dtype=np.uint8))
        else:
            w = bytearray(_wire(5, b"corrupt-me"))
            w[rng.randint(len(w))] ^= 0xFF
            stream += w
    # feed in random-size pieces
    i = 0
    frames_n, frames_p = [], []
    while i < len(stream):
        n = rng.randint(1, 17)
        piece = bytes(stream[i:i + n])
        i += n
        dn.push(0, piece)
        dp.push(0, piece)
        frames_n += dn.poll_all(0)
        frames_p += dp.poll_all(0)
    assert frames_n == frames_p
    assert any(f.kind == PACKET for f in frames_n)


@pytest.mark.skipif(not native_available, reason="g++ lib not built")
class TestBatchedDrain:
    """wam_deframer_drain — the ONE-call-per-quantum farm drain path
    (VERDICT r2: the C ABI was single-channel; the hub paid three
    ctypes crossings per active channel per quantum)."""

    def _mk_quantum(self, rng, C, maxb):
        """Random [C, maxb] vals + counts: fragments of wire streams."""
        vals = np.zeros((C, maxb), np.uint8)
        counts = np.zeros(C, np.int32)
        for c in range(C):
            if rng.rand() < 0.3:
                continue  # silent channel
            r = rng.randint(4)
            if r == 0:
                piece = _wire(rng.randint(1, 256),
                              bytes(rng.randint(0, 256, rng.randint(0, 20),
                                                dtype=np.uint8)))
            elif r == 1:
                piece = bytes([rng.choice([0x04, 0x06, 0x15])])
            elif r == 2:
                piece = bytes(rng.randint(0, 256, rng.randint(1, 8),
                                          dtype=np.uint8))
            else:
                w = bytearray(_wire(3, b"xx"))
                w[rng.randint(len(w))] ^= 0xFF
                piece = bytes(w)
            n = min(len(piece), maxb) if rng.rand() < 0.5 \
                else rng.randint(1, min(len(piece), maxb) + 1)
            vals[c, :n] = np.frombuffer(piece[:n], np.uint8)
            counts[c] = n
        return vals, counts

    def test_matches_per_channel_loop(self):
        """drain() must be event-equivalent to the per-channel
        push + poll_all loop, including carry of partial frames across
        quanta."""
        rng = np.random.RandomState(7)
        C, maxb = 16, 24
        batched = Deframer(C)
        looped = Deframer(C)
        assert batched.is_native and looped.is_native
        for _ in range(40):
            vals, counts = self._mk_quantum(rng, C, maxb)
            got = batched.drain(vals, counts)
            want = []
            for c in range(C):
                if counts[c]:
                    looped.push(c, bytes(vals[c, :counts[c]]))
                for f in looped.poll_all(c):
                    want.append((c, f))
            assert got == want
        assert batched.total_pending() == looped.total_pending()

    def test_matches_python_fallback(self):
        rng = np.random.RandomState(11)
        C, maxb = 8, 24
        dn = Deframer(C)
        dp = Deframer(C, force_python=True)
        for _ in range(30):
            vals, counts = self._mk_quantum(rng, C, maxb)
            assert dn.drain(vals, counts) == dp.drain(vals, counts)
        assert dn.total_pending() == dp.total_pending()

    def test_empty_quantum_is_free(self):
        d = Deframer(4)
        assert d.drain(np.zeros((4, 8), np.uint8),
                       np.zeros(4, np.int32)) == []

    def test_total_pending_tracks_buffers(self):
        d = Deframer(2)
        d.push(0, b"\x01\x01")       # partial header, stays buffered
        d.push(1, b"\x06")           # control, consumed on poll
        assert d.total_pending() == 3
        assert d.poll(1).kind == CONTROL
        assert d.total_pending() == 2
        d.reset(0)
        assert d.total_pending() == 0
