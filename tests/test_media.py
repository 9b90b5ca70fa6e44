"""MP4 box-walker / MP3 frame-walker: round trips against the
closed-form synth metadata, corrupt-input contracts, distributed parity.
The sf0.01 oracle comparison runs via test_queries_oracle
(media_metadata has a full arithmetic DuckDB oracle)."""

import struct

import pytest

from logparser_llm_spark.operators.media import (
    decode_mp3_audio,
    decode_mp4_samples,
    make_synth_media,
    make_synth_mp3,
    make_synth_mp4,
    parse_mp3,
    parse_mp4,
)


@pytest.mark.parametrize("doc_id", [0, 2, 4, 6, 8, 10, 20, 100, 998])
def test_mp4_round_trip_matches_closed_form(doc_id):
    m = parse_mp4(make_synth_mp4(doc_id))
    assert m["major_brand"] == "isom"
    assert m["timescale"] == 1000
    assert m["duration_ms"] == 1500 + doc_id % 700
    assert len(m["tracks"]) == 1 + (doc_id % 4) // 2
    v = m["tracks"][0]
    assert (v["handler"], v["codec"]) == ("vide", "avc1")
    assert (v["width"], v["height"]) == (16 * (1 + doc_id % 8), 16 * (1 + doc_id % 6))
    assert v["n_samples"] == 10 + doc_id % 20
    assert v["duration_ms"] == m["duration_ms"]
    if len(m["tracks"]) == 2:
        a = m["tracks"][1]
        assert (a["handler"], a["codec"]) == ("soun", "mp4a")
        assert a["sample_rate"] == 44100 + ((doc_id // 2) % 2) * 3900
        assert (a["channels"], a["n_samples"]) == (2, 30 + doc_id % 25)


@pytest.mark.parametrize("doc_id", [1, 3, 5, 7, 9, 11, 15, 35, 101, 999])
def test_mp3_round_trip_matches_closed_form(doc_id):
    m = parse_mp3(make_synth_mp3(doc_id))
    n = 20 + doc_id % 40
    sr = [44100, 48000, 32000][doc_id % 3]
    assert m["n_frames"] == n
    assert m["sample_rate"] == sr
    assert m["n_samples"] == n * 1152
    assert m["duration_ms"] == n * 1152 * 1000 // sr
    assert (m["version"], m["layer"], m["channels"]) == ("MPEG1", 3, 2)
    if doc_id % 4 == 3:
        assert not m["cbr"]
        assert m["bitrate_kbps"] == (128 * ((n + 1) // 2) + 192 * (n // 2)) // n
    else:
        assert m["cbr"]
        assert m["bitrate_kbps"] == [128, 192, 256][doc_id % 3]
    assert m["has_id3v2"] == (doc_id % 5 == 0)
    assert not m["has_xing"]


def test_mp4_64bit_and_to_end_box_sizes():
    """size==1 (largesize) and size==0 (to-end) wrappers must walk."""
    base = make_synth_mp4(4)
    # re-wrap the trailing mdat as a largesize box
    assert base[-72:-68] == struct.pack(">I", 72) and base[-68:-64] == b"mdat"
    body = base[-64:]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    m = parse_mp4(base[:-72] + large)
    assert m["duration_ms"] == 1500 + 4 % 700
    to_end = struct.pack(">I", 0) + b"mdat" + body
    m2 = parse_mp4(base[:-72] + to_end)
    assert m2["tracks"][0]["n_samples"] == 10 + 4 % 20


def test_mp3_id3v1_trailer_is_skipped():
    payload = make_synth_mp3(7) + b"TAG" + b"\x00" * 125
    m = parse_mp3(payload)
    assert m["n_frames"] == 20 + 7 % 40


def test_mp3_xing_header_detected():
    """A first frame carrying 'Xing' right after the MPEG1-stereo side
    info (32 bytes) must set has_xing."""
    raw = bytearray(make_synth_mp3(1))
    raw[4 + 32 : 4 + 36] = b"Xing"
    m = parse_mp3(bytes(raw))
    assert m["has_xing"]


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"\x00\x00\x00\x04ftyp",            # size < header
        make_synth_mp4(0)[:40],              # truncated mid-moov
        struct.pack(">I", 9999) + b"moov" + b"x" * 20,  # size past end
        make_synth_mp4(0)[-64:],             # mdat only, no moov
    ],
)
def test_mp4_corrupt_raises_value_error(bad):
    with pytest.raises(ValueError):
        parse_mp4(bad)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"\xff\xfb",                         # bare sync, no full header
        b"hello world!",                     # no sync at all
        make_synth_mp3(1)[:-5],              # truncated final frame
        b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f",  # ID3 size past end
        b"\xff\xfb\xf0\x00" + b"\x00" * 500,  # bitrate index 15 (bad)
    ],
)
def test_mp3_corrupt_raises_value_error(bad):
    with pytest.raises(ValueError):
        parse_mp3(bad)


def test_mp3_truncated_tail_mode_stops_at_last_full_frame():
    m = parse_mp3(make_synth_mp3(1)[:-5], allow_truncated_tail=True)
    assert m["n_frames"] == (20 + 1 % 40) - 1


def test_codec_decode_stays_honestly_gated():
    with pytest.raises(NotImplementedError):
        decode_mp4_samples(make_synth_mp4(0))
    with pytest.raises(NotImplementedError):
        decode_mp3_audio(make_synth_mp3(1))


def test_media_metadata_distributed_row_level_parity(spark):
    """The distributed demux must equal the local parse for every row —
    same pattern as the image_features row-level oracle."""
    from logparser_llm_spark.operators.media import media_metadata, synth_media_corpus

    ids = spark.range(0, 60).selectExpr("id as doc_id")
    out = {
        r["doc_id"]: r
        for r in media_metadata(synth_media_corpus(ids, "doc_id"), "doc_id", "media").collect()
    }
    assert len(out) == 60
    for d in range(60):
        payload, container = make_synth_media(d)
        r = out[d]
        assert r["container"] == container
        if container == "mp4":
            m = parse_mp4(payload)
            assert r["duration_ms"] == m["duration_ms"]
            assert r["n_streams"] == len(m["tracks"])
            assert r["n_samples"] == sum(t["n_samples"] for t in m["tracks"])
        else:
            m = parse_mp3(payload)
            assert r["duration_ms"] == m["duration_ms"]
            assert r["n_samples"] == m["n_samples"]
            assert r["bitrate_kbps"] == m["bitrate_kbps"]
