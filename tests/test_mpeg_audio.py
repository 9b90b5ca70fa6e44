"""MPEG-1 Layer II codec: bit-exact pin surface (encoder's implied
dequantized subbands == decoder's, from the entropy-coded bytes alone),
round-trip SNR floors, corrupt-input contracts, interop with the
independent frame walker (operators/media.py:parse_mp3), and the
distributed decode-stats path. The sf0.01 DuckDB parity for the
registered ``audio_decode`` query runs via test_queries_oracle."""

import numpy as np
import pytest

from logparser_llm_spark.operators.media import (
    audio_decode_stats,
    decode_mpeg_audio,
    make_synth_mp2_audio,
    parse_mp3,
    synth_audio_corpus,
)
from logparser_llm_spark.operators.mpeg_audio import (
    DELAY,
    L1_SAMPLES_PER_FRAME,
    SAMPLES_PER_FRAME,
    _scfsi_of,
    analysis_subbands,
    decode_mp2,
    decode_mp2_subbands,
    encode_mp1,
    encode_mp2,
    synthesis_pcm,
)


def _mix(n, sr, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1870 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return np.clip(x, -0.95, 0.95)


def _snr(ref, out):
    return 10 * np.log10(np.sum(ref**2) / np.sum((ref - out) ** 2))


def test_filterbank_near_perfect_reconstruction():
    """Analysis→synthesis with NO quantization: the derived NPR
    prototype must reconstruct at better than 55 dB (measured ≈59)."""
    n = SAMPLES_PER_FRAME * 4
    x = _mix(n, 44100)
    y = synthesis_pcm(analysis_subbands(x))
    assert _snr(x[: n - DELAY], y[DELAY:n]) > 55.0


@pytest.mark.parametrize(
    "sr,br",
    [
        (44100, 192),  # table b
        (48000, 192),  # table a
        (32000, 96),   # table a low-rate
        (44100, 48),   # table c (8 subbands, grouped codes)
        (32000, 48),   # table d (12 subbands)
        (44100, 384),  # max rate
    ],
)
def test_pin_surface_bit_exact_mono(sr, br):
    n = SAMPLES_PER_FRAME * 3
    # keep tone energy inside the low 8 subbands so table c/d rates
    # still carry it
    t = np.arange(n) / sr
    x = 0.6 * np.sin(2 * np.pi * (5 * sr / 128.0) * t) + 0.1 * np.sin(
        2 * np.pi * (3 * sr / 128.0) * t
    )
    stream, dq = encode_mp2(x, sr, br, return_dequantized=True)
    sub, sr2, nch = decode_mp2_subbands(stream)
    assert (sr2, nch) == (sr, 1)
    assert sub.shape == dq.shape
    assert np.array_equal(sub, dq)  # bit-for-bit


def test_pin_surface_bit_exact_stereo():
    n = SAMPLES_PER_FRAME * 3
    x = _mix(n, 44100)
    xs = np.stack([x, np.roll(x, 100)], axis=1)
    stream, dq = encode_mp2(xs, 44100, 256, return_dequantized=True)
    sub, sr2, nch = decode_mp2_subbands(stream)
    assert (sr2, nch) == (44100, 2)
    assert np.array_equal(sub, dq)


def test_round_trip_snr_floors():
    n = SAMPLES_PER_FRAME * 4
    t = np.arange(n) / 44100.0
    tone = 0.7 * np.sin(2 * np.pi * 440 * t)
    pcm, sr = decode_mp2(encode_mp2(tone, 44100, 384))
    assert sr == 44100
    assert _snr(tone[: n - DELAY], pcm[DELAY:n, 0]) > 50.0
    mix = _mix(n, 44100)
    pcm, _ = decode_mp2(encode_mp2(mix, 44100, 192))
    assert _snr(mix[: n - DELAY], pcm[DELAY:n, 0]) > 20.0


def test_scfsi_patterns_all_four():
    assert _scfsi_of(5, 5, 5) == (2, [5])
    assert _scfsi_of(5, 5, 9) == (1, [5, 9])
    assert _scfsi_of(5, 9, 9) == (3, [5, 9])
    assert _scfsi_of(5, 9, 13) == (0, [5, 9, 13])


def test_scfsi_exercised_on_varying_signal():
    """A loudness ramp forces per-part scalefactor changes; the pin
    must survive every transmitted-scalefactor pattern the encoder
    actually picks."""
    n = SAMPLES_PER_FRAME * 2
    t = np.arange(n) / 44100.0
    env = np.linspace(0.01, 0.9, n)
    x = env * np.sin(2 * np.pi * 440 * t)
    stream, dq = encode_mp2(x, 44100, 192, return_dequantized=True)
    sub, *_ = decode_mp2_subbands(stream)
    assert np.array_equal(sub, dq)


@pytest.mark.parametrize("sr,br", [(44100, 192), (48000, 384), (32000, 96)])
def test_layer1_pin_surface_bit_exact(sr, br):
    n = L1_SAMPLES_PER_FRAME * 5
    x = _mix(n, sr)
    stream, dq = encode_mp1(x, sr, br, return_dequantized=True)
    sub, sr2, nch = decode_mp2_subbands(stream)
    assert (sr2, nch) == (sr, 1)
    assert sub.shape == dq.shape == (1, 60, 32)
    assert np.array_equal(sub, dq)


def test_layer1_stereo_round_trip():
    n = L1_SAMPLES_PER_FRAME * 6
    x = _mix(n, 44100)
    xs = np.stack([x, np.roll(x, 50)], axis=1)
    stream, dq = encode_mp1(xs, 44100, 384, return_dequantized=True)
    sub, _, nch = decode_mp2_subbands(stream)
    assert nch == 2
    assert np.array_equal(sub, dq)
    pcm, sr = decode_mp2(stream)
    assert sr == 44100
    assert _snr(xs[: n - DELAY, 0], pcm[DELAY:n, 0]) > 15.0


def test_layer1_frame_walker_interop():
    n = L1_SAMPLES_PER_FRAME * 3
    m = parse_mp3(encode_mp1(_mix(n, 44100), 44100, 256))
    assert (m["layer"], m["version"]) == (1, "MPEG1")
    assert m["n_frames"] == 3
    assert m["n_samples"] == n
    assert m["cbr"] and m["bitrate_kbps"] == 256


def test_layer1_corrupt_contracts():
    stream = encode_mp1(_mix(L1_SAMPLES_PER_FRAME, 44100), 44100, 192)
    with pytest.raises(ValueError):
        decode_mp2(stream[:-3])
    bad = bytearray(stream)
    bad[4] |= 0xF0  # first allocation nibble = forbidden code 15
    with pytest.raises(ValueError):
        decode_mp2(bytes(bad))


def test_mixed_layer_stream_rejected():
    s1 = encode_mp1(_mix(L1_SAMPLES_PER_FRAME, 44100), 44100, 192)
    s2 = encode_mp2(_mix(SAMPLES_PER_FRAME, 44100), 44100, 192)
    with pytest.raises(ValueError):
        decode_mp2_subbands(s1 + s2)


def test_corrupt_contracts():
    n = SAMPLES_PER_FRAME * 2
    stream = encode_mp2(_mix(n, 44100), 44100, 192)
    with pytest.raises(ValueError):
        decode_mp2(b"\x00\x01\x02")  # shorter than a header
    with pytest.raises(ValueError):
        decode_mp2(b"\x12\x34\x56\x78" * 8)  # no sync word
    with pytest.raises(ValueError):
        decode_mp2(stream[:100])  # truncated final frame
    with pytest.raises(ValueError):
        decode_mp2(stream[:-3])  # chopped tail
    bad = bytearray(stream)
    bad[2] = (bad[2] & 0x0F) | 0xF0  # bitrate index 15
    with pytest.raises(ValueError):
        decode_mp2(bytes(bad))
    l3 = bytearray(stream)
    l3[1] = (l3[1] & ~0b110) | 0b010  # layer III code
    with pytest.raises(NotImplementedError):
        decode_mp2(bytes(l3))


def test_encoder_argument_contracts():
    x = np.zeros(100)
    with pytest.raises(ValueError):
        encode_mp2(x, 22050)
    with pytest.raises(ValueError):
        encode_mp2(x, 44100, 111)
    with pytest.raises(ValueError):
        encode_mp2(x + 10.0, 44100)
    with pytest.raises(ValueError):
        encode_mp2(np.zeros((5, 3)), 44100)


def test_body_bitflip_cannot_silently_match_pin():
    """Flip one bit in the bit-allocation region: the decoder must
    either reject the stream or produce subbands that differ from the
    encoder's pin — a silent bit-exact match would mean the pin surface
    isn't actually reading those bits."""
    n = SAMPLES_PER_FRAME
    stream, dq = encode_mp2(_mix(n, 44100), 44100, 192, return_dequantized=True)
    bad = bytearray(stream)
    bad[4] ^= 0x80  # first body byte = first allocation nibble
    try:
        sub, *_ = decode_mp2_subbands(bytes(bad))
    except ValueError:
        return
    assert not np.array_equal(sub, dq)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 11, 35, 997, 12345])
def test_synth_corpus_closed_form_pin(doc_id):
    p = make_synth_mp2_audio(doc_id)
    sub, sr, nch = decode_mp2_subbands(p)
    assert sr == [44100, 48000, 32000][doc_id % 3]
    assert nch == 1
    assert sub.shape[1] * 32 == (2 + doc_id % 3) * SAMPLES_PER_FRAME
    energy = (sub**2).mean(axis=(0, 1))
    assert int(np.argmax(energy)) == 3 + doc_id % 12


@pytest.mark.parametrize("doc_id", [0, 1, 7, 35])
def test_frame_walker_interop(doc_id):
    """operators/media.py:parse_mp3 was written independently of (and
    before) this codec — it must walk our Layer II streams by header
    arithmetic alone."""
    p = make_synth_mp2_audio(doc_id)
    m = parse_mp3(p)
    assert m["layer"] == 2
    assert m["version"] == "MPEG1"
    assert m["n_frames"] == 2 + doc_id % 3
    assert m["sample_rate"] == [44100, 48000, 32000][doc_id % 3]
    assert m["cbr"] and m["bitrate_kbps"] == 192


def test_decode_mpeg_audio_strips_id3():
    p = make_synth_mp2_audio(3)
    ref, sr = decode_mpeg_audio(p)
    body = b"padding-bytes-here"
    tag = b"ID3\x04\x00\x00" + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    ) + body
    out, sr2 = decode_mpeg_audio(tag + p)
    assert sr2 == sr
    assert np.array_equal(out, ref)


def test_distributed_decode_stats_matches_closed_form(spark):
    ids = spark.range(0, 40).selectExpr("id as doc_id")
    rows = audio_decode_stats(
        synth_audio_corpus(ids, "doc_id", partitions=8), "doc_id", "audio"
    ).collect()
    assert len(rows) == 40
    for r in rows:
        i = r["doc_id"]
        assert r["sample_rate"] == [44100, 48000, 32000][i % 3]
        assert r["nch"] == 1
        assert r["n_samples"] == (2 + i % 3) * SAMPLES_PER_FRAME
        assert r["dominant_subband"] == 3 + i % 12
