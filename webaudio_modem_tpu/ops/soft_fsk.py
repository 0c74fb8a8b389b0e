"""Soft-decision FSK + FEC physical path — the reference FEC memo's
full receive flow, implemented.

The memo (/root/reference/advanced-error-correction.md) prescribes a
receive pipeline that REPLACES hard UART byte framing:

    process(samples) -> SoftDecisionDemodulator -> FECDecoder
                     -> DataFrameFramer -> frames

with preamble correlation for synchronization (its 相関法, using soft
values for robustness) and explicit valid-length management in the
frame header.  Here:

  TX  ``encode_frame_signal``: payload -> [LEN+CRC | payload+CRC]
      convolutionally coded (rate 1/2 K=7, ops/fec.py) -> raw coded
      bits appended after the standard preamble+SFD pattern -> phase-
      continuous FSK (no start/stop bits — the FEC grid replaces UART).
  RX  ``decode_frame_signal``: the SAME sequential demod front end
      (ops/fsk_demod soft stream), pattern correlation on the sliced
      bits (the block-sum correlator) anchored at its PEAK, then the
      payload bit grid is KNOWN: per-bit LLRs are windowed sums of the
      analog discriminator — fully parallel, no state machine — fed to
      the soft Viterbi, header first (fixed length), then the body.

Because decisions integrate the analog soft values across each bit and
the Viterbi exploits them across the whole frame, this path decodes at
SNRs where the hard UART modem has already collapsed (see
tests/transports/test_fec.py::TestSoftPhysicalLayer).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from webaudio_modem_tpu.models.config import FSKParams
from webaudio_modem_tpu.ops import fec, fsk_demod, fsk_mod
from webaudio_modem_tpu.utils.crc16 import CRC16

HEADER_PLAIN = fec.FRAME_HEADER_PLAIN  # LEN(2) + CRC16(LEN)
HEADER_CODED_BITS = 2 * (8 * HEADER_PLAIN + fec.K - 1)


def _body_coded_bits(payload_len: int) -> int:
    return 2 * (8 * (payload_len + 2) + fec.K - 1)


def encode_frame_signal(params: FSKParams, payload: bytes) -> np.ndarray:
    """payload -> FSK signal carrying a coded frame (float32 [T])."""
    payload = bytes(payload)
    coded = np.concatenate([
        fec.conv_encode_bits(fec.bytes_to_bits(
            fec.build_frame_header(len(payload)))),
        fec.conv_encode_bits(fec.bytes_to_bits(
            fec.build_frame_body(payload)))])
    bits = np.concatenate([np.asarray(params.pattern_bits, np.int8),
                           coded.astype(np.int8)])
    return fsk_mod.modulate_bits(params, bits)


def frame_signal_length(params: FSKParams, payload_len: int) -> int:
    n_bits = (len(params.pattern_bits) + HEADER_CODED_BITS
              + _body_coded_bits(payload_len))
    return (n_bits * params.samples_per_bit
            + 2 * params.samples_per_bit
            + params.bits_per_byte * params.samples_per_bit)


def _bit_llrs(params: FSKParams, softs: np.ndarray, start: int,
              n_bits: int) -> Optional[np.ndarray]:
    """Windowed-sum LLRs for ``n_bits`` raw bits on the ds grid
    starting at soft-stream index ``start``."""
    ds = params.ds_samples_per_bit
    end = start + n_bits * ds
    if start < 0 or end > len(softs):
        return None
    win = softs[start:end].reshape(n_bits, ds)
    # polarity: positive discriminator = mark only for mark < space
    return np.float32(params.polarity) * win.sum(axis=1)


def decode_frame_signal(params: FSKParams, samples,
                        state=None) -> Optional[bytes]:
    """Full memo receive flow on one signal: sync -> soft FEC decode of
    the header -> soft FEC decode of the body -> CRC-checked payload.
    Returns None when no valid frame is found."""
    samples = np.asarray(samples, np.float32)
    bits, amps, softs = fsk_demod.soft_stream(params, samples)
    bits = bits[:, 0]
    softs = softs[:, 0].astype(np.float64)

    # 相関法: block-sum pattern correlation over the sliced bits
    ds = params.ds_samples_per_bit
    W = params.sync_window
    ext = jnp.concatenate(
        [jnp.zeros((W, 1), jnp.float32), jnp.asarray(bits)[:, None]], 0)
    ratios = np.asarray(fsk_demod._sync_ratios(params, ext))[:, 0]
    order = np.argsort(ratios)[::-1]
    threshold = params.config.sync_threshold

    for t_peak in order[:8]:            # a few best sync candidates
        if ratios[t_peak] <= threshold:
            break
        # The exact bit-grid origin relative to the correlation peak
        # depends on filter group delay (and the correlator's j==0
        # quirk), so it is searched rather than assumed: decode the
        # fixed-length header at every candidate offset in ONE batched
        # Viterbi call and let the header CRC select the right grid —
        # the memo's boundary-detection robustness, self-calibrating.
        offsets = list(range(int(t_peak) + 1 - ds - ds // 4,
                             int(t_peak) + 1 + ds // 4 + 1))
        cand = [(_bit_llrs(params, softs, off, HEADER_CODED_BITS), off)
                for off in offsets]
        cand = [(llr, off) for llr, off in cand if llr is not None]
        if not cand:
            continue
        stacked = np.stack([llr for llr, _ in cand])
        headers = fec.viterbi_decode_soft(stacked, 8 * HEADER_PLAIN)
        for k, (_, off) in enumerate(cand):
            header = fec.bits_to_bytes(headers[k])
            ln = (header[0] << 8) | header[1]
            crc = (header[2] << 8) | header[3]
            if CRC16.calculate(header[:2]) != crc:
                continue
            b_llr = _bit_llrs(params, softs,
                              off + HEADER_CODED_BITS * ds,
                              _body_coded_bits(ln))
            if b_llr is None:
                continue
            body_bits = fec.viterbi_decode_soft(b_llr, 8 * (ln + 2))
            body = fec.bits_to_bytes(body_bits)
            payload = body[:ln]
            if CRC16.calculate(payload) == \
                    ((body[ln] << 8) | body[ln + 1]):
                return payload
    return None


def decode_frames_batch(params: FSKParams, samples,
                        payload_len: int):
    """Farm-scale soft decode: [B, T] signals -> list of payloads
    (None per channel that failed).

    All channels must carry frames with the SAME payload length (the
    batched-modulation convention, fsk_mod.modulate_batch).  The whole
    batch costs TWO batched Viterbi calls: one over every
    (channel x grid-offset) header candidate, one over the bodies at
    each channel's CRC-selected grid.
    """
    samples = np.asarray(samples, np.float32)
    B = samples.shape[0]
    bits, amps, softs = fsk_demod.soft_stream(params, samples)
    softs = softs.astype(np.float64)                   # [n_ds, B]
    n_ds = softs.shape[0]

    ds = params.ds_samples_per_bit
    if n_ds < HEADER_CODED_BITS * ds:
        # stream too short to hold even one coded header span — the
        # candidate index windows below would run past the soft stream
        return [None] * B

    W = params.sync_window
    ext = jnp.concatenate(
        [jnp.zeros((W, B), jnp.float32), jnp.asarray(bits)], 0)
    ratios = np.asarray(fsk_demod._sync_ratios(params, ext))  # [n_ds, B]
    t_peak = ratios.argmax(axis=0)                     # [B]
    peak_ok = ratios[t_peak, np.arange(B)] > params.config.sync_threshold

    offsets = np.arange(-ds - ds // 4, ds // 4 + 1)    # [n_off]
    n_off = len(offsets)
    h_bits = HEADER_CODED_BITS
    starts = (t_peak[:, None] + 1 + offsets[None, :])  # [B, n_off]
    valid = (starts >= 0) & (starts + h_bits * ds <= n_ds) & \
        peak_ok[:, None]
    starts_c = np.clip(starts, 0, max(n_ds - h_bits * ds, 0))

    # header LLR windows for every (channel, offset) candidate.  The
    # ds-wide sums come from one float64 cumsum so the gather index
    # arrays are [B, n_off, h] instead of [B, n_off, h, ds] — the
    # explicit per-sample gather cost ~GBs of host memory at farm B.
    csum = np.concatenate(
        [np.zeros((1, B)), np.cumsum(softs, axis=0)], axis=0)
    pos = (starts_c[:, :, None]
           + (np.arange(h_bits) * ds)[None, None, :])  # [B, n_off, h]
    ch = np.arange(B)[:, None, None]
    h_llr = np.float32(params.polarity) * \
        (csum[pos + ds, ch] - csum[pos, ch])           # [B, n_off, h]
    headers = fec.viterbi_decode_soft(
        h_llr.reshape(B * n_off, h_bits),
        8 * HEADER_PLAIN).reshape(B, n_off, -1)

    # per channel: first offset whose header CRC validates AND whose
    # advertised length matches the batch convention
    body_bits = _body_coded_bits(payload_len)
    chosen = np.full(B, -1, np.int64)
    for b in range(B):
        for k in range(n_off):
            if not valid[b, k]:
                continue
            header = fec.bits_to_bytes(headers[b, k])
            ln = (header[0] << 8) | header[1]
            crc = (header[2] << 8) | header[3]
            if CRC16.calculate(header[:2]) != crc or ln != payload_len:
                continue
            if starts[b, k] + (h_bits + body_bits) * ds > n_ds:
                continue
            chosen[b] = k
            break

    ok = chosen >= 0
    results = [None] * B
    if not ok.any():
        return results
    sel = np.nonzero(ok)[0]
    b_starts = starts[sel, chosen[sel]] + h_bits * ds
    pos = (b_starts[:, None]
           + (np.arange(body_bits) * ds)[None, :])     # [k, body]
    b_llr = np.float32(params.polarity) * \
        (csum[pos + ds, sel[:, None]] - csum[pos, sel[:, None]])
    bodies = fec.viterbi_decode_soft(b_llr, 8 * (payload_len + 2))
    for i, b in enumerate(sel):
        body = fec.bits_to_bytes(bodies[i])
        payload = body[:payload_len]
        crc = (body[payload_len] << 8) | body[payload_len + 1]
        if CRC16.calculate(payload) == crc:
            results[b] = payload
    return results
