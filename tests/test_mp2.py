"""MPEG-1 Audio Layer II codec tests (sources/mp2.py): header/frame
grammar (syncword, bitrate/rate tables, slot math, padding, CRC slot),
scalefactor table exactness and scfsi patterns, grouped-codeword
round-trips and the all-ones syncword-emulation guard, filterbank
properties (exact 1/128 gain, ~59 dB steady-state reconstruction),
rate-distortion behaviour across bitrates, stereo, silence, mutation
fuzz, and error paths."""

import numpy as np
import pytest

from scrapelect_spark.sources import mp2 as MP
from scrapelect_spark.sources.mp2 import (
    decode_mp2,
    encode_mp2,
    is_mp2,
    mp2_meta,
)

RATE = 32000


def snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    err = a - b
    return 10 * np.log10((a @ a) / max(err @ err, 1e-30))


def tone(n, f=440.0, amp=12000.0, rate=RATE):
    t = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * f * t / rate)).astype(
        np.int16
    )


# --- tables -----------------------------------------------------------


def test_scalefactor_table():
    assert MP.SCALEFACTORS[0] == 2.0
    for i, v in enumerate(MP.SCALEFACTORS):
        assert v == pytest.approx(2.0 * 2.0 ** (-i / 3.0), rel=1e-12)
    assert len(MP.SCALEFACTORS) == 63
    assert all(
        a > b for a, b in zip(MP.SCALEFACTORS, MP.SCALEFACTORS[1:])
    )


def test_bitrate_table():
    assert MP.BITRATES[1:] == (32, 48, 56, 64, 80, 96, 112, 128, 160,
                               192, 224, 256, 320, 384)


def test_alloc_layout():
    assert len(MP._NBAL) == 27
    assert MP._NBAL[:3] == (4, 4, 4)
    assert MP._NBAL[11] == 3 and MP._NBAL[23] == 2
    for sb, classes in enumerate(MP._ALLOC_CLASSES):
        assert len(classes) <= 1 << MP._NBAL[sb]
        assert classes[0] == 0


def test_codeword_widths_and_grouping():
    # grouped classes: 3^3=27<=2^5, 5^3=125<=2^7, 9^3=729<=2^10
    assert MP._CODEWORD[3] == (5, True)
    assert MP._CODEWORD[5] == (7, True)
    assert MP._CODEWORD[9] == (10, True)
    # ungrouped: L = 2^n - 1 in n bits (all-ones word never valid)
    for L, (bits, grouped) in MP._CODEWORD.items():
        if not grouped:
            assert L == (1 << bits) - 1


def test_scfsi_patterns_roundtrip():
    for a, b, c in [(3, 3, 3), (5, 5, 9), (1, 7, 7), (2, 4, 6)]:
        scfsi, tx = MP._scfsi_for(a, b, c)
        assert MP._SF_COUNT[scfsi] == len(tx)
        assert MP._SF_OF_SCFSI[scfsi](tx) == (a, b, c)


def test_quantizer_midtread_and_guard():
    for L in (3, 5, 9, 7, 15, 65535):
        q = MP._quantize(np.array([0.0]), L)
        assert ((2 * q[0] + 1) / L - 1.0) == pytest.approx(
            0.0, abs=1e-12
        )
        # extremes stay inside the code space
        q = MP._quantize(np.array([-1.0, 0.9999]), L)
        assert q.min() >= 0 and q.max() <= L - 1


# --- filterbank -------------------------------------------------------


def test_filterbank_delta_gain_exact():
    delta = np.zeros(4096)
    delta[2048] = 1.0
    S = MP._analysis(delta)
    y = MP._synthesis(S)
    assert y[2048] == pytest.approx(1.0, abs=2e-3)
    # echoes at least 55 dB down
    mask = np.ones(len(y), bool)
    mask[2048 - 3:2048 + 4] = False
    assert np.abs(y[mask]).max() < 10 ** (-55 / 20)


def test_filterbank_steady_state_reconstruction():
    rng = np.random.default_rng(0)
    x = np.concatenate([np.zeros(512), rng.standard_normal(4096)])
    y = MP._synthesis(MP._analysis(x))
    r = x[512:-512]
    e = y[512:len(x) - 512] - r
    assert 10 * np.log10((r @ r) / (e @ e)) >= 55.0


# --- header / meta ----------------------------------------------------


def test_header_and_meta():
    x = tone(5000)
    blob = encode_mp2(x, RATE, 96)
    assert is_mp2(blob)
    rate, nch, kbps, n_frames = mp2_meta(blob)
    assert (rate, nch, kbps) == (RATE, 1, 96)
    assert n_frames == -(-(5000 + 512) // 1152)
    assert len(blob) == n_frames * (144 * 96000 // RATE)


def test_all_rates_and_bitrates_header_roundtrip():
    x = tone(1200)
    for rate in (32000, 44100, 48000):
        for kbps in (32, 96, 384):
            m = mp2_meta(encode_mp2(x, rate, kbps))
            assert m[0] == rate and m[2] == kbps


def test_not_mp2_sniffs():
    assert not is_mp2(b"RIFF....")
    assert not is_mp2(b"\xff\xfa..")  # layer III
    with pytest.raises(ValueError):
        decode_mp2(b"\x00" * 16)
    with pytest.raises(ValueError):
        encode_mp2(tone(100), 22050)
    with pytest.raises(ValueError):
        encode_mp2(tone(100), RATE, 97)


# --- roundtrip quality ------------------------------------------------


def test_tone_roundtrip_quality():
    x = tone(RATE // 2)
    blob = encode_mp2(x, RATE, 96)
    y, rate = decode_mp2(blob)
    assert rate == RATE
    assert snr(x, y[: len(x)]) >= 45.0
    assert len(blob) * 4 < 2 * len(x)  # really compressed


def test_rate_distortion_monotone():
    rng = np.random.default_rng(1)
    n = RATE // 2
    w = rng.standard_normal(n)
    W = np.fft.rfft(w)
    f = np.fft.rfftfreq(n, 1 / RATE)
    W[f > RATE * 26.5 / 64] = 0  # keep energy inside sblimit=27
    x = np.fft.irfft(W, n)
    x = (x / np.abs(x).max() * 12000).astype(np.int16)
    snrs = [
        snr(x, decode_mp2(encode_mp2(x, RATE, k))[0][: len(x)])
        for k in (48, 96, 192, 384)
    ]
    assert all(b > a + 5 for a, b in zip(snrs, snrs[1:])), snrs
    assert snrs[-1] >= 45.0


def test_stereo_roundtrip_and_independence():
    left = tone(8000, 440.0)
    right = tone(8000, 1100.0, amp=7000)
    x = np.stack([left, right], axis=1)
    blob = encode_mp2(x, RATE, 192)
    y, rate = decode_mp2(blob)
    assert y.shape[1] == 2
    assert snr(left, y[: len(left), 0]) >= 45.0
    assert snr(right, y[: len(right), 1]) >= 45.0
    assert mp2_meta(blob)[1] == 2


def test_silence_roundtrip():
    x = np.zeros(4000, np.int16)
    y, rate = decode_mp2(encode_mp2(x, RATE, 96))
    assert np.abs(y.astype(np.int64)).max() <= 1


def test_deterministic_encode():
    x = tone(3000)
    assert encode_mp2(x, RATE, 96) == encode_mp2(x, RATE, 96)


def test_duration_formula():
    for n in (1, 1151, 1152, 5000, 11520):
        y, rate = decode_mp2(encode_mp2(tone(max(n, 1)), RATE, 96))
        n_frames = -(-(n + 512) // 1152)
        assert len(y) == n_frames * 1152 - 512


# --- foreign-feature frames -------------------------------------------


def test_crc_slot_is_written_and_skipped():
    x = tone(4000)
    plain = encode_mp2(x, RATE, 96, crc=False)
    prot = encode_mp2(x, RATE, 96, crc=True)
    assert len(plain) == len(prot)  # CRC eats payload, not framing
    assert plain[1] & 1 == 1 and prot[1] & 1 == 0
    assert prot[4:6] == b"\xff\xff"
    ya, _ = decode_mp2(plain)
    yb, _ = decode_mp2(prot)
    assert snr(x, yb[: len(x)]) >= 45.0
    # the 16 lost bits may shift one allocation step; both decode fine
    assert snr(ya[: len(x)], yb[: len(x)]) >= 35.0


def test_padding_bit_extends_frame():
    x = tone(1000)
    blob = bytearray(encode_mp2(x, RATE, 96))
    slots = 144 * 96000 // RATE
    assert len(blob) == 2 * slots  # two frames at this length
    # set padding on frame 0 and insert its extra slot byte
    blob[2] |= 0b10
    padded = bytes(blob[:slots]) + b"\x00" + bytes(blob[slots:])
    y, rate = decode_mp2(padded)
    assert snr(x, y[: len(x)]) >= 38.0  # short-signal frame boundary


def test_mid_stream_parameter_change_raises():
    a = encode_mp2(tone(1000), RATE, 96)
    b = encode_mp2(np.stack([tone(1000)] * 2, axis=1), RATE, 96)
    with pytest.raises(ValueError, match="parameter change"):
        decode_mp2(a + b)


def test_truncated_stream_raises():
    blob = encode_mp2(tone(5000), RATE, 96)
    with pytest.raises(ValueError):
        decode_mp2(blob[: len(blob) - 7])


def test_mutation_fuzz_never_hangs_or_segfaults():
    blob = bytearray(encode_mp2(tone(2500), RATE, 96))
    rng = np.random.default_rng(42)
    for _ in range(150):
        mut = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            y, rate = decode_mp2(bytes(mut))
            assert y.ndim in (1, 2)
        except (ValueError, IndexError):
            pass
