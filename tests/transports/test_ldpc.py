"""LDPC tests (the FEC memo's third algorithm family,
/root/reference/advanced-error-correction.md:162-165)."""

import numpy as np
import pytest

from webaudio_modem_tpu.ops.ldpc import LDPCCode, default_code


@pytest.fixture(scope="module")
def code():
    return default_code(n=120, wc=3, wr=6)   # small: k~62, fast tests


def _bpsk_llrs(codewords: np.ndarray, sigma: float,
               rng: np.random.RandomState) -> np.ndarray:
    tx = 1.0 - 2.0 * codewords.astype(np.float64)
    rx = tx + sigma * rng.standard_normal(tx.shape)
    return (2.0 * rx / sigma ** 2).astype(np.float32)


def test_construction_is_valid_and_deterministic(code):
    H = code.H
    assert (H.sum(axis=1) == code.wr).all()       # regular rows
    assert (H.sum(axis=0) == code.wc).all()       # regular columns
    # k = n - rank(H); Gallager bands are dependent so rank < m
    assert code.n - code.m <= code.k <= code.n - code.m + code.wc
    again = LDPCCode(n=120, wc=3, wr=6)
    np.testing.assert_array_equal(again.H, H)     # same seed search


def test_encode_satisfies_parity_checks(code):
    rng = np.random.RandomState(0)
    data = rng.randint(0, 2, size=(8, code.k))
    cw = np.asarray(code.encode_batch(data))
    assert cw.shape == (8, code.n)
    syndrome = (code.H.astype(np.int64) @ cw.T) % 2
    assert (syndrome == 0).all()
    # systematic recovery: data columns carry the data verbatim
    np.testing.assert_array_equal(
        cw[:, np.asarray(code._data_cols)], data)


def test_clean_and_noisy_decode(code):
    rng = np.random.RandomState(1)
    B = 16
    data = rng.randint(0, 2, size=(B, code.k))
    cw = np.asarray(code.encode_batch(data))
    # clean: huge LLRs, must be exact and ok
    llr = (1.0 - 2.0 * cw) * 20.0
    out, ok = code.decode_batch(llr.astype(np.float32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)
    # AWGN at a comfortable operating point for rate 1/2 (~4 dB Eb/N0)
    ebn0_db = 4.0
    rate = code.k / code.n
    sigma = float(np.sqrt(1.0 / (2 * rate * 10 ** (ebn0_db / 10))))
    out, ok = code.decode_batch(_bpsk_llrs(cw, sigma, rng))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)


def test_coding_gain_over_uncoded(code):
    # at an SNR where uncoded BPSK has visible bit errors, the decoder
    # returns every frame exactly
    rng = np.random.RandomState(2)
    B = 16
    data = rng.randint(0, 2, size=(B, code.k))
    cw = np.asarray(code.encode_batch(data))
    sigma = 0.7
    llrs = _bpsk_llrs(cw, sigma, rng)
    uncoded_bits = (llrs < 0).astype(np.int32)
    uncoded_errs = int((uncoded_bits != cw).sum())
    assert uncoded_errs > 20          # the channel is genuinely noisy
    out, ok = code.decode_batch(llrs)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)


def test_ok_flags_unconverged_garbage(code):
    rng = np.random.RandomState(3)
    llrs = rng.standard_normal((8, code.n)).astype(np.float32)
    _, ok = code.decode_batch(llrs)
    # random LLRs are (overwhelmingly) not near any codeword
    assert (~np.asarray(ok)).sum() >= 7


def test_mixed_batch_ok_mask(code):
    rng = np.random.RandomState(4)
    data = rng.randint(0, 2, size=(4, code.k))
    cw = np.asarray(code.encode_batch(data))
    llr = (1.0 - 2.0 * cw) * 10.0
    llr[2] = rng.standard_normal(code.n)          # one garbage channel
    out, ok = code.decode_batch(llr.astype(np.float32))
    ok = np.asarray(ok)
    assert ok[0] and ok[1] and ok[3] and not ok[2]
    np.testing.assert_array_equal(np.asarray(out)[[0, 1, 3]],
                                  data[[0, 1, 3]])


def test_default_648_code_end_to_end():
    code = default_code()                    # n=648, the advertised default
    assert code.n == 648 and code.k >= 324
    rng = np.random.RandomState(7)
    data = rng.randint(0, 2, size=(4, code.k))
    cw = np.asarray(code.encode_batch(data))
    assert ((code.H.astype(np.int64) @ cw.T) % 2 == 0).all()
    ebn0_db = 4.0
    rate = code.k / code.n
    sigma = float(np.sqrt(1.0 / (2 * rate * 10 ** (ebn0_db / 10))))
    out, ok = code.decode_batch(_bpsk_llrs(cw, sigma, rng))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), data)


def test_ldpc_over_fsk_audio(soft_grid_search):
    """The memo's soft-value requirement end-to-end for LDPC: FSK
    audio -> soft discriminator LLRs -> min-sum decode.  The bit-grid
    offset is self-selecting: LDPC's own syndrome check validates the
    grid, playing the role the header CRC plays for conv frames."""
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG, FSKParams

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    code = default_code(n=120, wc=3, wr=6)
    rng = np.random.RandomState(9)
    data = rng.randint(0, 2, size=(1, code.k))
    cw = np.asarray(code.encode_batch(data))[0]

    def attempt(llr):
        # discriminator sign: positive soft = mark = bit 1, so the
        # LDPC llr (positive = bit 0) is the negation
        out_bits, ok = code.decode_batch(-llr[None].astype(np.float32))
        return np.asarray(out_bits)[0] if bool(np.asarray(ok)[0]) else None

    decoded, _ = soft_grid_search(params, cw, 0.08, rng, attempt)
    assert decoded is not None, "no grid offset produced a codeword"
    np.testing.assert_array_equal(decoded, data[0])


def test_input_validation(code):
    with pytest.raises(ValueError):
        code.encode_batch(np.zeros((2, code.k + 1)))
    with pytest.raises(ValueError):
        code.decode_batch(np.zeros((2, code.n - 1), np.float32))
