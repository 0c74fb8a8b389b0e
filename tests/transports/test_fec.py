"""FEC layer tests — the reference's advanced-error-correction design
memo (soft-decision + convolutional FEC + framing) implemented and
verified."""

import numpy as np
import pytest

from webaudio_modem_tpu.ops import fec
from webaudio_modem_tpu.transports.fec_frame import (FrameDecoder,
                                                     FrameEncoder)


class TestConvolutionalCode:
    def test_all_zero_input_codes_to_zero(self):
        coded = fec.conv_encode_bits(np.zeros(32, np.uint8))
        assert not coded.any()

    def test_impulse_response_is_generator_pattern(self):
        # a single 1 emits the generator taps as it shifts through the
        # register (newest bit in the LSB, so tap i fires at step i)
        coded = fec.conv_encode_bits(np.asarray([1, 0, 0, 0, 0, 0, 0]))
        pairs = coded.reshape(-1, 2)[:7]
        g0 = [(0o171 >> i) & 1 for i in range(7)]
        g1 = [(0o133 >> i) & 1 for i in range(7)]
        assert pairs[:, 0].tolist() == g0
        assert pairs[:, 1].tolist() == g1

    def test_rate_is_half_plus_flush(self):
        n = 100
        coded = fec.conv_encode_bits(np.ones(n, np.uint8))
        assert len(coded) == 2 * (n + fec.K - 1)

    def test_clean_roundtrip_bytes(self):
        rng = np.random.RandomState(1)
        for size in (1, 17, 128, 500):
            data = bytes(rng.randint(0, 256, size, dtype=np.uint8))
            assert fec.decode_bytes(fec.encode_bytes(data), size) == data

    def test_corrects_random_bit_errors(self):
        rng = np.random.RandomState(2)
        data = bytes(rng.randint(0, 256, 100, dtype=np.uint8))
        bits = fec.bytes_to_bits(fec.encode_bytes(data))[:2 * 806]
        ok = 0
        for _ in range(10):
            noisy = bits.copy()
            noisy[rng.uniform(size=len(bits)) < 0.03] ^= 1
            dec = fec.bits_to_bytes(
                fec.viterbi_decode_bits(noisy, 800))[:100]
            ok += dec == data
        assert ok >= 9  # 3% random coded-bit errors: essentially always

    def test_soft_decision_beats_hard(self):
        # the memo's core motivation: soft values buy ~2 dB
        rng = np.random.RandomState(0)
        data = bytes(rng.randint(0, 256, 100, dtype=np.uint8))
        bits = fec.bytes_to_bits(fec.encode_bytes(data))[:2 * 806]
        tx = bits.astype(np.float64) * 2 - 1
        soft_ok = hard_ok = 0
        for _ in range(20):
            rx = tx + 0.65 * rng.standard_normal(len(tx))
            ds = fec.bits_to_bytes(fec.viterbi_decode_soft(rx, 800))[:100]
            dh = fec.bits_to_bytes(fec.viterbi_decode_bits(
                (rx > 0).astype(np.uint8), 800))[:100]
            soft_ok += ds == data
            hard_ok += dh == data
        assert soft_ok >= 18
        assert soft_ok > hard_ok

    def test_batched_decode(self):
        # channel batching is a leading axis, like every other kernel
        rng = np.random.RandomState(3)
        B = 32
        datas = [bytes(rng.randint(0, 256, 50, dtype=np.uint8))
                 for _ in range(B)]
        softs = np.stack([
            fec.bytes_to_bits(fec.encode_bytes(d))[:2 * 406]
            .astype(np.float32) * 2 - 1 for d in datas])
        decs = fec.viterbi_decode_soft(softs, 400)
        assert decs.shape == (B, 400)
        for b in range(B):
            assert fec.bits_to_bytes(decs[b])[:50] == datas[b]


class TestFrameCodec:
    def test_roundtrip_single_frame(self):
        payload = b"framed payload 123"
        frame = FrameEncoder.encode_frame(payload)
        assert len(frame) == FrameEncoder.coded_frame_length(len(payload))
        dec = FrameDecoder()
        assert dec.process(frame) == [payload]

    def test_empty_payload_frame(self):
        frame = FrameEncoder.encode_frame(b"")
        assert FrameDecoder().process(frame) == [b""]

    def test_streaming_byte_by_byte(self):
        payload = bytes(range(64))
        frame = FrameEncoder.encode_frame(payload)
        dec = FrameDecoder()
        got = []
        for i in range(len(frame)):
            got += dec.process(frame[i:i + 1])
        assert got == [payload]

    def test_multiple_frames_back_to_back(self):
        payloads = [b"one", b"two two", b"", b"four" * 20]
        stream = b"".join(FrameEncoder.encode_frame(p) for p in payloads)
        assert FrameDecoder().process(stream) == payloads

    def test_junk_prefix_resyncs(self):
        payload = b"after junk"
        stream = b"\x00\xff\x37" + FrameEncoder.encode_frame(payload)
        dec = FrameDecoder()
        assert dec.process(stream) == [payload]
        assert dec.headers_resynced >= 1

    def test_bit_errors_inside_frame_corrected(self):
        rng = np.random.RandomState(5)
        payload = bytes(rng.randint(0, 256, 120, dtype=np.uint8))
        frame = bytearray(FrameEncoder.encode_frame(payload))
        # flip ~1.5% of the coded BITS, spread out
        for i in rng.choice(len(frame) * 8, size=len(frame) // 8,
                            replace=False):
            frame[i // 8] ^= 1 << (i % 8)
        assert FrameDecoder().process(bytes(frame)) == [payload]

    def test_uncorrectable_body_reported_and_stream_recovers(self):
        errors = []
        dec = FrameDecoder(on_error=errors.append)
        good = FrameEncoder.encode_frame(b"good")
        bad = bytearray(FrameEncoder.encode_frame(b"bad frame here"))
        # destroy a burst in the body (beyond correction), header intact
        from webaudio_modem_tpu.transports.fec_frame import HEADER_CODED
        for i in range(HEADER_CODED + 2, HEADER_CODED + 14):
            bad[i] ^= 0xFF
        got = dec.process(bytes(bad) + good)
        assert got == [b"good"]
        assert dec.bodies_dropped == 1
        assert errors and "CRC" in errors[0]

    def test_reset_clears_partial_state(self):
        dec = FrameDecoder()
        frame = FrameEncoder.encode_frame(b"partial")
        dec.process(frame[:10])
        dec.reset()
        assert dec.pending() == 0
        assert dec.process(frame) == [b"partial"]


class TestFecOverModem:
    def test_fec_frames_over_fsk_audio(self):
        # end-to-end: FEC frame -> FSK audio -> demod -> FrameDecoder
        from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
        from webaudio_modem_tpu.models.fsk import FSKCore

        core = FSKCore(DEFAULT_FSK_CONFIG)
        payload = b"FEC over FSK audio!"
        frame = FrameEncoder.encode_frame(payload)
        sig = core.modulate_data(frame)
        received = core.demodulate_data(sig)
        assert FrameDecoder().process(received) == [payload]

    def test_fec_recovers_byte_corruption_raw_does_not(self):
        # the headline capability: with the same corrupted byte stream,
        # the raw payload is damaged but the FEC frame decodes exactly
        rng = np.random.RandomState(9)
        payload = bytes(rng.randint(0, 256, 200, dtype=np.uint8))
        frame = bytearray(FrameEncoder.encode_frame(payload))
        raw = bytearray(payload)
        # corrupt ~1% of bits in both streams
        for buf in (frame, raw):
            n = max(1, len(buf) * 8 // 100)
            for i in rng.choice(len(buf) * 8, size=n, replace=False):
                buf[i // 8] ^= 1 << (i % 8)
        assert bytes(raw) != payload           # raw stream is damaged
        assert FrameDecoder().process(bytes(frame)) == [payload]


class TestSoftStreamSurface:
    def test_soft_stream_matches_hard_bits(self):
        # the memo's SoftDecisionDemodulator surface: softs' sign IS
        # the hard bit stream
        from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                      FSKParams)
        from webaudio_modem_tpu.ops import fsk_demod, fsk_mod

        params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
        sig = np.asarray(fsk_mod.modulate(params, b"soft!"))
        out = fsk_demod.soft_stream(params, sig)
        bits, amps, softs = out.bits, out.amps, out.softs
        assert bits.shape == softs.shape == amps.shape
        derived = (params.polarity * softs > 0).astype(np.float32)
        np.testing.assert_array_equal(derived, bits)
        assert amps.min() >= 0


class TestSoftPhysicalLayer:
    """The memo's full receive flow (soft demod -> Viterbi -> framer)
    as a physical-layer mode: ops/soft_fsk."""

    def _params(self):
        from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                      FSKParams)
        return FSKParams.from_config(DEFAULT_FSK_CONFIG)

    def test_clean_roundtrip(self):
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        payload = b"soft physical layer"
        sig = soft_fsk.encode_frame_signal(params, payload)
        assert len(sig) == soft_fsk.frame_signal_length(params,
                                                        len(payload))
        assert soft_fsk.decode_frame_signal(params, sig) == payload

    def test_roundtrip_at_300_baud(self):
        from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
        from webaudio_modem_tpu.ops import soft_fsk

        params = FSKParams.from_config(FSKConfig(
            baud_rate=300, mark_frequency=1270, space_frequency=1070))
        payload = b"bell103"
        sig = soft_fsk.encode_frame_signal(params, payload)
        assert soft_fsk.decode_frame_signal(params, sig) == payload

    def test_silence_prefix(self):
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        payload = b"offset frame"
        sig = soft_fsk.encode_frame_signal(params, payload)
        padded = np.concatenate([np.zeros(777, np.float32), sig])
        assert soft_fsk.decode_frame_signal(params, padded) == payload

    def test_empty_payload(self):
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        sig = soft_fsk.encode_frame_signal(params, b"")
        assert soft_fsk.decode_frame_signal(params, sig) == b""

    def test_garbage_returns_none(self):
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        rng = np.random.RandomState(6)
        noise = rng.uniform(-0.5, 0.5, 20000).astype(np.float32)
        assert soft_fsk.decode_frame_signal(params, noise) is None

    def test_decodes_below_the_hard_modem_floor(self):
        """The headline: at 6 dB SNR the soft+FEC path decodes
        reliably while the hard UART modem has collapsed (measured:
        soft 8/8 vs hard 3/8 at this seed family; soft stays >=5/8
        down to 2 dB)."""
        from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
        from webaudio_modem_tpu.models.fsk import FSKCore
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        payload = b"soft wins at low SNR"

        def add_noise(sig, snr_db, rng):
            power = float(np.mean(np.asarray(sig, np.float64) ** 2))
            amp = np.sqrt(3 * power / (10 ** (snr_db / 10)))
            noise = amp * (rng.uniform(size=len(sig)) * 2 - 1)
            return (np.asarray(sig) + noise).astype(np.float32)

        rng = np.random.RandomState(106)
        soft_sig = soft_fsk.encode_frame_signal(params, payload)
        soft_ok = hard_ok = 0
        for _ in range(6):
            soft_ok += soft_fsk.decode_frame_signal(
                params, add_noise(soft_sig, 6, rng)) == payload
            core = FSKCore(DEFAULT_FSK_CONFIG)
            hard_sig = core.modulate_data(payload)
            hard_ok += core.demodulate_data(
                add_noise(hard_sig, 6, rng)) == payload
        assert soft_ok >= 5
        assert soft_ok > hard_ok

    def test_batched_farm_scale_soft_decode(self):
        from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                      FSKParams)
        from webaudio_modem_tpu.ops import soft_fsk

        params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
        B = 16
        payloads = [bytes([(i * 7 + 1) & 0xFF] * 12) for i in range(B)]
        sigs = np.stack([soft_fsk.encode_frame_signal(params, p)
                         for p in payloads])
        rng = np.random.RandomState(3)
        power = float(np.mean(sigs[0].astype(np.float64) ** 2))
        amp = np.sqrt(3 * power / 10 ** 0.8)  # 8 dB SNR
        noisy = (sigs + amp * (rng.uniform(size=sigs.shape) * 2 - 1)
                 ).astype(np.float32)
        noisy[5] = amp * (rng.uniform(size=noisy[5].shape) * 2 - 1)
        out = soft_fsk.decode_frames_batch(params, noisy, 12)
        assert out[5] is None                       # garbage channel
        good = sum(out[b] == payloads[b] for b in range(B) if b != 5)
        assert good >= B - 2                        # noisy but decodable


class TestDecoderResyncRobustness:
    def test_oversized_len_cap_resyncs(self):
        # a decoder configured with a small max_payload treats a header
        # advertising more as junk and keeps scanning
        from webaudio_modem_tpu.transports.fec_frame import (FrameDecoder,
                                                             FrameEncoder)

        big = FrameEncoder.encode_frame(b"x" * 64)
        good = FrameEncoder.encode_frame(b"ok")
        dec = FrameDecoder(max_payload=16)
        got = dec.process(big + good)
        assert got == [b"ok"]
        assert dec.headers_resynced >= 1

    def test_lossless_resync_finds_frame_inside_phantom_body(self):
        # corrupt-body resync must not discard the body span: a genuine
        # frame that starts inside it is still decoded
        from webaudio_modem_tpu.transports.fec_frame import (HEADER_CODED,
                                                             FrameDecoder,
                                                             FrameEncoder)

        bad = bytearray(FrameEncoder.encode_frame(b"A" * 40))
        inner = FrameEncoder.encode_frame(b"inner")
        # splice the genuine frame INTO the bad frame's body region,
        # then pad so the phantom body window fills and its CRC fails
        splice_at = HEADER_CODED + 8
        stream = bytes(bad[:splice_at]) + inner + b"\x00" * len(bad)
        dec = FrameDecoder()
        got = dec.process(stream)
        assert got == [b"inner"]


def test_soft_batch_short_stream_returns_none():
    # decode_frames_batch on a stream shorter than one coded header
    # span must return [None]*B, not crash indexing the soft stream
    from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(FSKConfig(baud_rate=1200))
    out = soft_fsk.decode_frames_batch(
        params, np.zeros((4, 2000), np.float32), 8)
    assert out == [None] * 4


def test_decoder_fuzz_never_crashes_and_recovers():
    # arbitrary junk between genuine frames: the decoder must never
    # raise, never deadlock the scan, and still decode every genuine
    # frame that is followed by enough stream to flush phantom windows
    rng = np.random.RandomState(11)
    dec = FrameDecoder(max_payload=256)
    decoded = []
    expected = []
    for i in range(12):
        junk = bytes(rng.randint(0, 256, rng.randint(0, 40),
                                 dtype=np.uint8))
        payload = bytes(rng.randint(0, 256, rng.randint(1, 64),
                                    dtype=np.uint8))
        expected.append(payload)
        decoded += dec.process(junk)
        decoded += dec.process(FrameEncoder.encode_frame(payload))
    # flush: enough trailing zeros to drain any phantom body window
    decoded += dec.process(b"\x00" * FrameEncoder.coded_frame_length(258))
    assert decoded == expected


class TestResyncSlideBound:
    def test_junk_flood_is_bounded_per_call_and_lossless(self):
        """A junk-heavy stream may not cost unbounded Viterbi decodes in
        one process() call (ADVICE r2): the per-call slide bound defers
        the scan, and continuing with process(b'') still finds a
        genuine frame after the junk — nothing is lost."""
        frame = FrameEncoder.encode_frame(b"after the flood")
        junk = bytes((i * 37 + 11) & 0xFF for i in range(600))
        dec = FrameDecoder(max_slides_per_call=128)
        out = dec.process(junk + frame)
        total = list(out)
        calls = 1
        while dec.scan_pending and calls < 100:
            total += dec.process(b"")
            calls += 1
        assert total == [b"after the flood"]
        # the flood took multiple bounded calls, not one unbounded one
        assert calls > 1
        assert dec.headers_resynced >= len(junk) - 1

    def test_default_bound_transparent_for_clean_streams(self):
        dec = FrameDecoder()
        out = dec.process(FrameEncoder.encode_frame(b"x") * 3)
        assert out == [b"x"] * 3
        assert not dec.scan_pending


class TestStreamingSoftDecode:
    """VERDICT r2 item 3: the soft-decision path must STREAM — the
    memo's receive flow driven by arbitrary chunks, frames spanning
    chunk boundaries (reference chunk contract, src/core.ts:99-102)."""

    def _params(self):
        from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                      FSKParams)
        return FSKParams.from_config(DEFAULT_FSK_CONFIG)

    def test_soft_stream_carry_is_bit_exact(self):
        """Chunked soft_stream with carried state == one whole call:
        the sliced BITS are exactly equal; the analog planes match to
        float tolerance (chunk splits move XLA fusion boundaries, and
        the test env compiles with --xla_allow_excess_precision —
        decoded-payload equality is the hard contract, CLAUDE.md)."""
        from webaudio_modem_tpu.models.config import FSKParams
        from webaudio_modem_tpu.ops import fsk_demod, fsk_mod

        params = self._params()
        sig = np.asarray(fsk_mod.modulate(params, b"carry me"))
        whole = fsk_demod.soft_stream(params, sig)
        rng = np.random.RandomState(3)
        cuts = np.sort(rng.choice(np.arange(1, len(sig)),
                                  size=6, replace=False))
        state, phase = None, 0
        parts = []
        for lo, hi in zip(np.r_[0, cuts], np.r_[cuts, len(sig)]):
            out = fsk_demod.soft_stream(params, sig[lo:hi], state, phase)
            state, phase = out.state, out.ds_phase
            parts.append((out.bits, out.amps, out.softs))
        np.testing.assert_array_equal(
            np.concatenate([p[0] for p in parts], axis=0), whole.bits)
        for i, name in ((1, "amps"), (2, "softs")):
            got = np.concatenate([p[i] for p in parts], axis=0)
            np.testing.assert_allclose(
                got, getattr(whole, name), rtol=1e-4, atol=1e-5,
                err_msg=name)

    def test_random_chunk_splits_equal_whole(self):
        """Decoded payloads from random splits == whole-signal decode
        (the soft-path mirror of the hard pipeline's split test)."""
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        payload = b"boundary-spanning FEC frame payload"
        sig = soft_fsk.encode_frame_signal(params, payload)
        assert soft_fsk.decode_frame_signal(params, sig) == payload
        rng = np.random.RandomState(17)
        for trial in range(4):
            n_cuts = rng.randint(1, 9)
            cuts = np.sort(rng.choice(np.arange(1, len(sig)),
                                      size=n_cuts, replace=False))
            chunks = [sig[lo:hi] for lo, hi in
                      zip(np.r_[0, cuts], np.r_[cuts, len(sig)])]
            assert soft_fsk.decode_frame_chunks(params, chunks) == \
                [payload], f"trial {trial} cuts {cuts}"

    def test_fixed_128_sample_quanta(self):
        """AudioWorklet-style 128-sample quanta: every frame boundary
        falls inside a chunk."""
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        payload = bytes(range(48))
        sig = soft_fsk.encode_frame_signal(params, payload)
        chunks = [sig[i:i + 128] for i in range(0, len(sig), 128)]
        assert soft_fsk.decode_frame_chunks(params, chunks) == [payload]

    def test_two_frames_in_one_feed_decode_in_order(self):
        """Regression: both frames buffered in ONE feed must decode in
        temporal order.  With ratio-descending candidate order the
        stronger SECOND frame decoded first and its scan-point advance
        consumed the first frame (found by driving the public API with
        a whole two-frame signal as a single chunk)."""
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        p1, p2 = b"first, weaker peak", b"second frame decodes too"
        sig = np.concatenate([
            soft_fsk.encode_frame_signal(params, p1),
            np.zeros(500, np.float32),
            soft_fsk.encode_frame_signal(params, p2)])
        assert soft_fsk.decode_frame_chunks(params, [sig]) == [p1, p2]

    def test_back_to_back_frames_with_silence_gap(self):
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        p1, p2 = b"first frame", b"second frame, longer payload"
        sig = np.concatenate([
            soft_fsk.encode_frame_signal(params, p1),
            np.zeros(997, np.float32),
            soft_fsk.encode_frame_signal(params, p2)])
        chunks = [sig[i:i + 777] for i in range(0, len(sig), 777)]
        assert soft_fsk.decode_frame_chunks(params, chunks) == [p1, p2]

    def test_incremental_decode_fires_as_frames_complete(self):
        """The first frame must decode BEFORE the second's samples are
        fed — streaming, not buffer-then-decode."""
        from webaudio_modem_tpu.ops import soft_fsk

        params = self._params()
        p1, p2 = b"early", b"late"
        s1 = soft_fsk.encode_frame_signal(params, p1)
        s2 = soft_fsk.encode_frame_signal(params, p2)
        dec = soft_fsk.SoftFrameDecoder(params)
        got1 = dec.feed(s1)
        assert got1 == [p1]
        got2 = dec.feed(s2)
        assert got2 == [p2]
        assert dec.frames_decoded == 2

    def test_noise_and_junk_prefix_chunked(self):
        """Chunked decode still works below the hard-UART floor, after
        a noise-only lead-in, with bounded memory."""
        from webaudio_modem_tpu.ops import soft_fsk
        from webaudio_modem_tpu.sim import awgn

        params = self._params()
        payload = b"noisy streaming frame"
        rng = np.random.RandomState(5)
        lead = awgn(np.zeros(4000, np.float32), 0.01, rng)
        sig = np.concatenate([
            lead, soft_fsk.encode_frame_signal(params, payload)])
        sig = awgn(sig, 0.02, rng)  # ~14 dB SNR on the frame
        dec = soft_fsk.SoftFrameDecoder(params)
        frames = []
        for i in range(0, len(sig), 1024):
            frames += dec.feed(sig[i:i + 1024])
        assert frames == [payload]
        # memory stays bounded by the trim window after consumption
        assert len(dec._bits) < 4 * params.sync_window + 10000


def test_conv_encode_batch_matches_scalar():
    # the windowed-parity batch encoder is bit-identical per row to
    # the scalar FSM encoder
    from webaudio_modem_tpu.ops import fec

    rng = np.random.RandomState(11)
    bits = rng.randint(0, 2, size=(16, 73)).astype(np.uint8)
    batch = fec.conv_encode_bits_batch(bits)
    for b in range(bits.shape[0]):
        np.testing.assert_array_equal(batch[b],
                                      fec.conv_encode_bits(bits[b]))


def test_encode_frames_batch_matches_single_and_decodes():
    # one-dispatch batched frame synthesis: float32-close to the
    # per-message encode and decode-exact through the batch decoder
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG, FSKParams
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    payloads = [bytes([0x10 * i + k for k in range(7)]) for i in range(5)]
    batch = np.asarray(soft_fsk.encode_frames_batch(params, payloads))
    singles = np.stack([soft_fsk.encode_frame_signal(params, p)
                        for p in payloads])
    assert batch.shape == singles.shape
    # int-exact vs f64 phase tables: same phases mod 2*pi, f32 rounding
    np.testing.assert_allclose(batch, singles, atol=1e-4)
    out = soft_fsk.decode_frames_batch(params, batch, 7)
    assert out == payloads


def test_encode_frames_batch_validates_input():
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG, FSKParams
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    with pytest.raises(ValueError):
        soft_fsk.encode_frames_batch(params, [])
    with pytest.raises(ValueError):
        soft_fsk.encode_frames_batch(params, [b"ab", b"abc"])


def test_decode_frames_batch_async_pipelines_to_same_payloads():
    # the pipelined form: N in-flight dispatches, finalized in order,
    # each batch byte-identical to the blocking call
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG, FSKParams
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    B = 3
    rng = np.random.RandomState(11)
    batches = []
    for k in range(3):
        payloads = [bytes([0x20 + 16 * k + i] * 8) for i in range(B)]
        sigs = np.stack([soft_fsk.encode_frame_signal(params, p)
                         for p in payloads])
        noisy = (sigs + 0.05 * rng.standard_normal(sigs.shape)
                 ).astype(np.float32)
        batches.append((noisy, payloads))

    pending = [soft_fsk.decode_frames_batch_async(params, noisy, 8)
               for noisy, _ in batches]
    for fin, (noisy, payloads) in zip(pending, batches):
        assert fin() == payloads
        assert fin() == soft_fsk.decode_frames_batch(params, noisy, 8)

    # short-stream guard returns a finalizer too
    short = soft_fsk.decode_frames_batch_async(
        params, np.zeros((2, 64), np.float32), 8)
    assert short() == [None, None]


def test_soft_batch_device_resident_input_matches_numpy():
    # decode_frames_batch accepts a device-resident jax array in place
    # (the DeviceFarmHub pattern) and returns identical payloads
    import jax.numpy as jnp

    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG, FSKParams
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    B = 4
    payloads = [bytes([0x41 + i] * 9) for i in range(B)]
    sigs = np.stack([soft_fsk.encode_frame_signal(params, p)
                     for p in payloads])
    rng = np.random.RandomState(7)
    noisy = (sigs + 0.05 * rng.standard_normal(sigs.shape)
             ).astype(np.float32)
    out_np = soft_fsk.decode_frames_batch(params, noisy, 9)
    out_dev = soft_fsk.decode_frames_batch(params, jnp.asarray(noisy), 9)
    assert out_np == out_dev
    assert out_np == payloads


class TestViterbiNormSchedule:
    """Differential pin of the grouped-normalization Viterbi against
    the original per-step-normalization form (kept behind
    ``per_step_norm=True``).

    Deferring the max-subtraction to once per 16 ACS steps preserves
    every path-metric comparison in exact arithmetic but can flip
    f32-borderline ones — the repo contract (CLAUDE.md) is therefore
    decoded-BYTE agreement at the CRC-gate level, asserted here across
    SNRs from clean through the decode cliff into pure noise."""

    @staticmethod
    def _frames(rng, n_frames, payload_len):
        payloads, planes = [], []
        for _ in range(n_frames):
            payload = bytes(rng.randint(0, 256, payload_len,
                                        dtype=np.uint8))
            body = fec.build_frame_body(payload)
            planes.append(fec.bytes_to_bits(body).astype(np.float64)
                          * 2 - 1)
            payloads.append(payload)
        return payloads, planes

    @staticmethod
    def _crc_gate(bits, payload_len):
        """bits [8*(pl+2)] -> payload bytes iff the CRC16 gate passes
        (exactly the soft path's acceptance rule)."""
        body = fec.bits_to_bytes(bits)
        payload = body[:payload_len]
        from webaudio_modem_tpu.utils.crc16 import CRC16
        if CRC16.calculate(payload) == ((body[payload_len] << 8)
                                        | body[payload_len + 1]):
            return payload
        return None

    def test_byte_agreement_at_crc_gate_across_snr(self):
        rng = np.random.RandomState(42)
        payload_len = 16
        n_bits = 8 * (payload_len + 2)
        payloads, planes = self._frames(rng, 24, payload_len)
        # sigma sweep: clean, pre-cliff, ON the decode cliff
        # (rate-1/2 K=7 soft decoding collapses around sigma ~0.9-1.1
        # for ±1 symbols), and past it (pure-noise regime)
        disagreements = 0
        checked = 0
        for sigma in (0.0, 0.5, 0.8, 1.0, 1.2, 2.0):
            tx = np.stack([fec.conv_encode_bits(
                ((p + 1) / 2).astype(np.uint8)).astype(np.float64) * 2 - 1
                for p in planes])
            rx = (tx + sigma * rng.standard_normal(tx.shape)) \
                .astype(np.float32)
            new = fec.viterbi_decode_soft(rx, n_bits)
            old = fec.viterbi_decode_soft(rx, n_bits,
                                          per_step_norm=True)
            for k in range(len(payloads)):
                pn = self._crc_gate(new[k], payload_len)
                po = self._crc_gate(old[k], payload_len)
                checked += 1
                if (pn is None) != (po is None):
                    # a borderline f32 flip turned a frame into a clean
                    # erasure in one form — allowed, but must be rare
                    disagreements += 1
                    continue
                # both gates pass (or both erase): payloads must agree
                assert pn == po, (
                    f"CRC-passing payloads diverge at sigma={sigma}")
                if pn is not None and sigma <= 0.5:
                    assert pn == payloads[k]
        assert checked == 24 * 6
        assert disagreements <= 3, (
            f"{disagreements}/{checked} frames flipped CRC-gate status "
            "between normalization schedules")

    def test_clean_and_moderate_noise_bit_identical(self):
        # away from f32-borderline ties the two schedules should be
        # outright bit-identical (same comparisons, same winners)
        rng = np.random.RandomState(7)
        payload_len = 32
        n_bits = 8 * (payload_len + 2)
        _, planes = self._frames(rng, 8, payload_len)
        tx = np.stack([fec.conv_encode_bits(
            ((p + 1) / 2).astype(np.uint8)).astype(np.float64) * 2 - 1
            for p in planes])
        for sigma in (0.0, 0.3):
            rx = (tx + sigma * rng.standard_normal(tx.shape)) \
                .astype(np.float32)
            new = fec.viterbi_decode_soft(rx, n_bits)
            old = fec.viterbi_decode_soft(rx, n_bits,
                                          per_step_norm=True)
            np.testing.assert_array_equal(new, old)

    def test_long_payload_grouped_form_roundtrips(self):
        # payload lengths driving many 16-step groups + a remainder
        # tail (the scan-of-groups restructuring's shape coverage)
        rng = np.random.RandomState(3)
        for size in (128, 255):
            data = bytes(rng.randint(0, 256, size, dtype=np.uint8))
            assert fec.decode_bytes(fec.encode_bytes(data), size) == data
