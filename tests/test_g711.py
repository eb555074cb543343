"""G.711 μ-law / A-law codec tests (sources/g711.py): full-range
bit-parity with CPython's C compander (audioop), WAV container
roundtrip (mono + stereo), and SNR of the lossy path."""

import numpy as np
import pytest

from scrapelect_spark.sources.adpcm import snr_db
from scrapelect_spark.sources.g711 import (
    decode_alaw,
    decode_ulaw,
    decode_wav_g711,
    encode_alaw,
    encode_ulaw,
    encode_wav_g711,
)

RATE = 8000


def sine(n, amp=0.3, hz=440):
    t = np.arange(n)
    return np.round(amp * 32767 * np.sin(2 * np.pi * hz * t / RATE)).astype(
        np.int16
    )


def test_full_range_parity_with_cpython_audioop():
    audioop = pytest.importorskip("audioop")  # removed in 3.13
    xs = np.arange(-32768, 32768, dtype=np.int16)
    pcm = xs.astype("<i2").tobytes()
    assert encode_ulaw(xs) == audioop.lin2ulaw(pcm, 2)
    assert encode_alaw(xs) == audioop.lin2alaw(pcm, 2)
    codes = bytes(range(256))
    assert decode_ulaw(codes).astype("<i2").tobytes() == audioop.ulaw2lin(
        codes, 2
    )
    assert decode_alaw(codes).astype("<i2").tobytes() == audioop.alaw2lin(
        codes, 2
    )


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_encode_decode_idempotent_on_decoded_values(law):
    """decode∘encode is identity on the codec's own output levels."""
    enc = encode_ulaw if law == "ulaw" else encode_alaw
    dec = decode_ulaw if law == "ulaw" else decode_alaw
    levels = dec(bytes(range(256)))
    assert np.array_equal(dec(enc(levels)), levels)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_wav_roundtrip_mono_and_stereo(law):
    x = sine(4000, amp=0.4)
    y, rate = decode_wav_g711(encode_wav_g711(x, RATE, law))
    assert rate == RATE and y.shape == (4000,)
    assert snr_db(x, y) >= 30.0  # log companding: ~35-38 dB on a sine
    st = np.stack([x, sine(4000, amp=0.2, hz=330)], axis=1)
    y2, _ = decode_wav_g711(encode_wav_g711(st, RATE, law))
    assert y2.shape == (4000, 2)
    assert snr_db(st[:, 0], y2[:, 0]) >= 30.0
    assert snr_db(st[:, 1], y2[:, 1]) >= 30.0


def test_compression_ratio_and_header():
    import struct

    x = sine(1000)
    blob = encode_wav_g711(x, RATE, "ulaw")
    i = blob.index(b"fmt ")
    tag, nch, rate, avg, align, bits = struct.unpack(
        "<HHIIHH", blob[i + 8 : i + 24]
    )
    assert (tag, nch, rate, align, bits) == (7, 1, RATE, 1, 8)
    d = blob.index(b"data")
    (dlen,) = struct.unpack("<I", blob[d + 4 : d + 8])
    assert dlen == 1000  # 1 byte/sample = 2:1 vs PCM16
    assert encode_wav_g711(x, RATE, "alaw")[i + 8 : i + 10] == b"\x06\x00"


def test_audio_features_g711_fallback(spark):
    """The audio_features operator reaches G.711 WAVs through the
    compressed-tag fallback chain (PCM → ADPCM → G.711)."""
    import pandas as pd

    from scrapelect_spark.operators.multimodal import audio_features

    x = sine(4000, amp=0.5)
    st = np.stack([x, x], axis=1)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "audio_id": ["u", "a2"],
                "bytes": [
                    encode_wav_g711(x, RATE, "ulaw"),
                    encode_wav_g711(st, RATE, "alaw"),
                ],
                "fmt": ["wav", "wav"],
            }
        )
    )
    rows = {r.audio_id: r for r in audio_features(df).collect()}
    assert rows["u"].decode_error is None
    assert rows["u"].duration_s == pytest.approx(4000 / RATE)
    assert rows["u"].rms == pytest.approx(0.5 / np.sqrt(2), rel=0.02)
    assert rows["a2"].decode_error is None
    assert rows["a2"].rms == pytest.approx(0.5 / np.sqrt(2), rel=0.02)


def test_rejects():
    with pytest.raises(ValueError, match="unknown G.711 law"):
        encode_wav_g711(sine(10), RATE, "mp3")
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav_g711(b"nope")
    from scrapelect_spark.sources.wav import encode_wav

    with pytest.raises(ValueError, match="not G.711"):
        decode_wav_g711(encode_wav(sine(100), RATE))  # PCM tag 1
