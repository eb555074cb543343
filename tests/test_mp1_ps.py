"""MPEG-1 Audio Layer I (sources/mp2.py Layer I half) and MPEG-1
program stream (sources/mpegps.py) tests: Layer I frame grammar
(4-byte slots, 4-bit allocation over all 32 subbands, one scalefactor
per active subband, (a+1)-bit codes with the all-ones guard),
rate-distortion and stereo behaviour, the layer-dispatching
decode_mpa, and the ISO 11172-1 pack/system/packet layer — SCR/PTS
marker-bit encoding, stuffing/STD tolerance, private_stream_2's
header-less packets, bomb guard, and byte-exact ES roundtrips."""

import numpy as np
import pytest

from scrapelect_spark.sources import mp2 as MP
from scrapelect_spark.sources.mp2 import (
    decode_mp1,
    decode_mp2,
    decode_mpa,
    encode_mp1,
    encode_mp2,
    is_mp1,
    is_mp2,
    mp1_meta,
)
from scrapelect_spark.sources.mpegps import (
    _scr_bytes,
    _ts_bytes,
    demux_ps,
    is_ps,
    mux_ps,
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


# --- Layer I grammar ---------------------------------------------------


def test_l1_bitrate_table_distinct_from_l2():
    assert MP.BITRATES_L1[1:] == (32, 64, 96, 128, 160, 192, 224, 256,
                                  288, 320, 352, 384, 416, 448)
    assert MP.BITRATES_L1 != MP.BITRATES


def test_l1_header_fields_and_meta():
    blob = encode_mp1(tone(2000), RATE, 192)
    assert is_mp1(blob)
    assert not is_mp2(blob)
    # layer field '11', ID=1, syncword
    assert blob[0] == 0xFF and (blob[1] & 0xFE) == 0xFE
    rate, nch, kbps, n_frames = mp1_meta(blob)
    assert (rate, nch, kbps) == (RATE, 1, 192)
    # ceil((2000 + 512) / 384) frames
    assert n_frames == -(-(2000 + 512) // 384)
    # frame size: 4 * (12 * 192000 / 32000) bytes
    assert len(blob) == n_frames * 4 * (12 * 192000 // RATE)


def test_l1_all_rates_and_bitrates_roundtrip_header():
    x = tone(500)
    for rate in (32000, 44100, 48000):
        for kbps in (32, 192, 448):
            m = mp1_meta(encode_mp1(x, rate, kbps))
            assert (m[0], m[2]) == (rate, kbps)


def test_l1_tone_roundtrip_quality():
    x = tone(9000)
    y, rate = decode_mp1(encode_mp1(x, RATE, 192))
    assert rate == RATE
    assert snr(x, y[: len(x)]) >= 50.0


def test_l1_rate_distortion_monotone():
    x = tone(6000, f=330.0)
    prev = -1.0
    for kbps in (32, 96, 192, 384):
        s = snr(x, decode_mp1(encode_mp1(x, RATE, kbps))[0][: len(x)])
        assert s > 25.0
        assert s >= prev - 1.0  # monotone up to a small tolerance
        prev = s


def test_l1_stereo_roundtrip_and_shape():
    x = tone(5000)
    xs = np.stack([x, (x // 3).astype(np.int16)], axis=1)
    y, rate = decode_mp1(encode_mp1(xs, RATE, 384))
    assert y.ndim == 2 and y.shape[1] == 2
    assert snr(xs.ravel(), y[: len(x)].ravel()) >= 45.0
    assert mp1_meta(encode_mp1(xs, RATE, 384))[1] == 2


def test_l1_silence_and_determinism():
    x = np.zeros(3000, dtype=np.int16)
    blob = encode_mp1(x, RATE, 96)
    y, _ = decode_mp1(blob)
    assert np.abs(y.astype(np.int64)).max() <= 1
    assert encode_mp1(x, RATE, 96) == blob


def test_l1_crc_slot_written_and_skipped():
    x = tone(4000)
    blob = encode_mp1(x, RATE, 192, crc=True)
    # protection_bit=0
    assert (blob[1] & 1) == 0
    y, _ = decode_mp1(blob)
    assert snr(x, y[: len(x)]) >= 45.0


def test_l1_error_paths():
    with pytest.raises(ValueError, match="sample rate"):
        encode_mp1(tone(100), 22050)
    with pytest.raises(ValueError, match="bitrate"):
        encode_mp1(tone(100), RATE, 48)  # Layer II rate, not Layer I
    with pytest.raises(ValueError):
        decode_mp1(b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated frame"):
        decode_mp1(encode_mp1(tone(2000), RATE, 192)[:-10])
    # Layer II stream fed to the Layer I decoder
    with pytest.raises(ValueError, match="not Layer I"):
        decode_mp1(encode_mp2(tone(2000), RATE, 96))


def test_decode_mpa_dispatch():
    x = tone(3000)
    y1, r1 = decode_mpa(encode_mp1(x, RATE, 192))
    y2, r2 = decode_mpa(encode_mp2(x, RATE, 96))
    assert r1 == r2 == RATE
    assert snr(x, y1[: len(x)]) >= 45.0
    assert snr(x, y2[: len(x)]) >= 40.0
    with pytest.raises(ValueError, match="not an MPEG-1"):
        decode_mpa(b"RIFF....")


def test_l1_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(11)
    blob = bytearray(encode_mp1(tone(3000), RATE, 192))
    for _ in range(200):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            decode_mp1(bytes(b))
        except ValueError:
            pass


# --- program stream: field encodings ------------------------------------


def test_scr_and_ts_marker_bits():
    for v in (0, 1, (1 << 33) - 1, 0x123456789 & ((1 << 33) - 1)):
        scr = _scr_bytes(v)
        assert scr[0] >> 4 == 0b0010
        assert scr[0] & 1 and scr[2] & 1 and scr[4] & 1  # markers
        ts = _ts_bytes(0b0010, v)
        assert ts[0] >> 4 == 0b0010
        assert ts[0] & 1 and ts[2] & 1 and ts[4] & 1
        # decode back through the demux helper
        from scrapelect_spark.sources.mpegps import _parse_ts

        assert _parse_ts(ts, 0) == v


def test_ps_sniff():
    ps = mux_ps({0xE0: b"x" * 10})
    assert is_ps(ps)
    assert not is_ps(b"\x00\x00\x01\xb3....")  # sequence header, not pack
    assert not is_ps(b"RIFF....")


# --- program stream: roundtrips -----------------------------------------


def test_ps_two_stream_byte_exact_roundtrip():
    v = bytes(range(256)) * 13  # arbitrary payload incl. 0x000001 runs
    a = b"\x00\x00\x01\xb9" * 50  # end-code bytes INSIDE a payload
    ps = mux_ps({0xE0: v, 0xC0: a}, payload_size=100)
    es, meta = demux_ps(ps)
    assert es[0xE0] == v
    assert es[0xC0] == a
    assert meta["pts"] == {0xE0: 0, 0xC0: 0}
    assert meta["mux_rate_bps"] >= 1_200_000
    assert meta["n_packets"] == -(-len(v) // 100) + -(-len(a) // 100)


def test_ps_private_stream_2_headerless():
    payload = b"opaque sidecar" * 40
    es, meta = demux_ps(mux_ps({0xBF: payload}, payload_size=64))
    assert es[0xBF] == payload
    assert 0xBF not in meta["pts"]  # no header → no PTS


def test_ps_stuffing_and_std_fields_tolerated():
    # hand-build one packet with stuffing + STD buffer + PTS
    payload = b"DATA" * 8
    pts = _ts_bytes(0b0010, 12345)
    header = b"\xff\xff\xff" + bytes((0b0100_0001, 0x20)) + pts
    pkt = (
        b"\x00\x00\x01\xba" + _scr_bytes(0) + b"\x80\x00\x01"
        + b"\x00\x00\x01\xe0"
        + (len(header) + len(payload)).to_bytes(2, "big")
        + header + payload
        + b"\x00\x00\x01\xb9"
    )
    es, meta = demux_ps(pkt)
    assert es[0xE0] == payload
    assert meta["pts"][0xE0] == 12345


def test_ps_pts_dts_form_parsed():
    payload = b"Z" * 10
    header = _ts_bytes(0b0011, 777) + _ts_bytes(0b0001, 555)
    pkt = (
        b"\x00\x00\x01\xba" + _scr_bytes(0) + b"\x80\x00\x01"
        + b"\x00\x00\x01\xc0"
        + (len(header) + len(payload)).to_bytes(2, "big")
        + header + payload
    )
    es, meta = demux_ps(pkt)
    assert es[0xC0] == payload
    assert meta["pts"][0xC0] == 777


def test_ps_truncated_tail():
    ps = mux_ps({0xE0: b"q" * 500}, payload_size=100)
    # end code removed: every whole packet still demuxes
    es, _ = demux_ps(ps[:-4])
    assert es[0xE0] == b"q" * 500
    # cut inside the last packet's payload: hard error
    with pytest.raises(ValueError, match="truncated packet payload"):
        demux_ps(ps[: len(ps) - 54])


def test_ps_malformed_inputs_raise():
    with pytest.raises(ValueError, match="no packs"):
        demux_ps(b"garbage with no start codes")
    # MPEG-2 pack header marker nibble ('01xx' top bits) rejected
    bad = b"\x00\x00\x01\xba" + b"\x44" + b"\x00" * 9
    with pytest.raises(ValueError, match="not an MPEG-1 pack"):
        demux_ps(bad)
    with pytest.raises(ValueError, match="invalid stream_id"):
        mux_ps({0x42: b"x"})
    with pytest.raises(ValueError, match="no streams"):
        mux_ps({})


def test_ps_bomb_guard():
    ps = mux_ps({0xE0: b"A" * 4096}, payload_size=256)
    with pytest.raises(ValueError, match="max_bytes"):
        demux_ps(ps, max_bytes=1024)


def test_ps_full_av_mux_decodes():
    """End-to-end: real MPEG-1 video ES + Layer I audio ES through the
    container, decoded from the demuxed bytes."""
    from scrapelect_spark.sources.mpeg1 import (
        decode_m1v_frames,
        encode_m1v,
    )

    base = np.indices((24, 32)).sum(0).astype(np.uint8) * 7
    frames = [
        np.stack([base + 10 * k, base[::-1], base], axis=-1)
        for k in range(4)
    ]
    v = encode_m1v(frames, gop_size=2)
    x = tone(4000)
    a = encode_mp1(x, RATE, 192)
    es, meta = demux_ps(mux_ps({0xE0: v, 0xC0: a}, payload_size=512))
    assert es[0xE0] == v and es[0xC0] == a
    decoded = list(decode_m1v_frames(es[0xE0]))
    assert len(decoded) == 4
    y, rate = decode_mpa(es[0xC0])
    assert rate == RATE and snr(x, y[: len(x)]) >= 45.0


def test_ps_deterministic():
    streams = {0xE0: b"v" * 999, 0xC0: b"a" * 333}
    assert mux_ps(streams) == mux_ps(streams)


def test_frame_sample_operator_routes_program_stream(spark):
    """frame_sample demuxes a program stream and samples its video
    elementary stream exactly like a bare .m1v."""
    import pandas as pd

    from scrapelect_spark.operators.multimodal import frame_sample
    from scrapelect_spark.sources.mpeg1 import encode_m1v
    from scrapelect_spark.sources.png import decode_png

    base = (np.indices((16, 16)).sum(0) * 6).astype(np.int64)
    frames = [
        np.stack(
            [np.minimum(base + 20 * k, 255), base, base[::-1]], axis=-1
        ).astype(np.uint8)
        for k in range(4)
    ]
    v = encode_m1v(frames, qscale=1)  # intra-only, near-transparent
    a = encode_mp1(tone(2000), RATE, 192)
    ps = mux_ps({0xE0: v, 0xC0: a}, payload_size=256)
    video = spark.createDataFrame(
        pd.DataFrame({"video_id": ["ps1"], "bytes": [ps]})
    )
    rows = frame_sample(video, every_n=2).collect()
    assert [r.frame_idx for r in rows] == [0, 2]
    assert all(r.decode_error is None for r in rows)
    for r in rows:
        got = decode_png(bytes(r.bytes)).astype(np.float64)
        want = frames[r.frame_idx].astype(np.float64)
        mse = ((got - want) ** 2).mean()
        assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) >= 30.0


def test_frame_sample_ps_without_video_errors(spark):
    import pandas as pd

    from scrapelect_spark.operators.multimodal import frame_sample

    ps = mux_ps({0xC0: b"audio only" * 30})
    video = spark.createDataFrame(
        pd.DataFrame({"video_id": ["ps2"], "bytes": [ps]})
    )
    rows = frame_sample(video).collect()
    assert len(rows) == 1
    assert "no video stream" in rows[0].decode_error
