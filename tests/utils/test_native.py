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
