"""Baseline JPEG codec (VERDICT r3 item 8): pure numpy Huffman+IDCT.

The round-trip alone cannot prove correctness (a symmetric bug — wrong
zigzag on both sides — would cancel), so the suite also pins analytic
facts: DCT orthonormality, the DC-only path's exact reconstruction of
uniform blocks, spec-derived zigzag endpoints, and corrupt/unsupported
input behavior.
"""

import numpy as np
import pytest

from logparser_llm_spark.operators.jpeg import (
    UnsupportedJpegError,
    ZIGZAG,
    dct_matrix,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 10),
            128 + 90 * np.cos(yy / 8),
            128 + 50 * np.sin((xx + yy) / 12),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_dct_matrix_is_orthonormal():
    C = dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)


def test_zigzag_is_the_spec_order():
    """Endpoints and the first anti-diagonals of T.81 Figure 5 — checked
    against values derivable by hand, independent of the generator."""
    assert len(ZIGZAG) == 64 and sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]


def test_uniform_image_roundtrips_exactly():
    """A uniform color is DC-only; 128 level-shifts to 0 → all
    coefficients 0 → bit-exact reconstruction through any quant table."""
    for sub in ("444", "420"):
        arr = np.full((16, 24, 3), 128, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(arr, sub))
        assert (out == arr).all(), sub


def test_smooth_image_psnr():
    img = _smooth(40, 56)
    assert _psnr(decode_jpeg(encode_jpeg(img, "444")), img) > 35
    assert _psnr(decode_jpeg(encode_jpeg(img, "420")), img) > 32


def test_odd_dimensions_crop_back():
    img = _smooth(37, 45)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, sub))
        assert out.shape == img.shape
        assert _psnr(out, img) > 30


def test_restart_interval_decode_is_identical():
    """RSTn markers change the byte stream but not the pixels: decode
    with DRI must equal the no-DRI decode bit for bit."""
    img = _smooth(48, 64)
    base = decode_jpeg(encode_jpeg(img, "444"))
    for ri in (1, 2, 5):
        assert (decode_jpeg(encode_jpeg(img, "444", restart_interval=ri)) == base).all()
    assert _psnr(decode_jpeg(encode_jpeg(img, "420", restart_interval=3)), img) > 32


def test_corrupt_stream_raises_valueerror():
    p = encode_jpeg(_smooth(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg(p[: len(p) // 2])  # truncated mid-entropy
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + p[2:])  # missing SOI
    # flip the SOF marker to SOF9 (arithmetic) → Unsupported, not corrupt
    # (r5: SOF2 progressive now decodes natively, so it left this test)
    sof_at = p.index(b"\xff\xc0")
    arith = p[:sof_at] + b"\xff\xc9" + p[sof_at + 2 :]
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(arith)
    # a baseline SEQUENTIAL scan header under an SOF2 frame is corrupt
    # for progressive (Se=63 in a DC band) → plain ValueError
    prog = p[:sof_at] + b"\xff\xc2" + p[sof_at + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(prog)


def test_truncated_marker_bodies_raise_valueerror():
    """ADVICE r4: segment BODIES shorter than their fixed headers must
    raise ValueError (the documented corrupt contract), not struct.error
    (truncated SOF/DRI) or IndexError (empty SOS)."""
    soi = b"\xff\xd8"
    with pytest.raises(ValueError, match="truncated SOF"):
        decode_jpeg(soi + b"\xff\xc0\x00\x03\x08")  # 1-byte SOF body
    with pytest.raises(ValueError, match="truncated DRI"):
        decode_jpeg(soi + b"\xff\xdd\x00\x03\x00")  # 1-byte DRI body
    sof1 = b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="truncated SOS"):
        decode_jpeg(soi + sof1 + b"\xff\xda\x00\x02")  # empty SOS body
    sof3 = (
        b"\xff\xc0\x00\x11\x08\x00\x08\x00\x08\x03"
        b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    with pytest.raises(ValueError, match="truncated SOS component"):
        decode_jpeg(soi + sof3 + b"\xff\xda\x00\x04\x03\x01")  # ns=3, 2-byte body
    # review r5: ns=0 must be the contract ValueError, not IndexError
    with pytest.raises(ValueError, match="zero components"):
        decode_jpeg(soi + sof1 + b"\xff\xda\x00\x06\x00\x00\x3f\x00")


def test_non_interleaved_scan_is_unsupported_not_garbage():
    """Review r4: a baseline JPEG whose components arrive in separate
    scans (ns < frame components) must raise UnsupportedJpegError (→ PIL
    fallback), never silently decode only the Y scan as grayscale."""
    p = encode_jpeg(_smooth(16, 16))
    sos_at = p.index(b"\xff\xda")
    # rewrite the 3-component SOS (len 12) as a 1-component SOS (len 8)
    one_comp = b"\xff\xda" + b"\x00\x08" + bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    mutated = p[:sos_at] + one_comp + p[sos_at + 14 :]
    with pytest.raises(UnsupportedJpegError, match="non-interleaved"):
        decode_jpeg(mutated)


def test_grayscale_single_component():
    """Hand-assemble a 1-component scan by re-using the encoder's luma
    machinery: encode RGB gray, then decode must be near-gray."""
    img = np.repeat(_smooth(24, 24)[:, :, :1], 3, axis=2)
    out = decode_jpeg(encode_jpeg(img, "444"))
    assert _psnr(out, img) > 35
    # channels nearly equal (chroma ≈ 128 everywhere)
    assert np.abs(out.astype(int) - out[:, :, :1].astype(int)).max() <= 3


def test_decode_image_dispatches_jpeg_natively():
    from logparser_llm_spark.operators.multimodal import decode_image

    img = _smooth(24, 32)
    arr, fmt = decode_image(encode_jpeg(img))
    assert fmt == "jpeg"
    assert _psnr(arr, img) > 35


# ---- progressive mode (SOF2, r5) ------------------------------------------


def _rand(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_progressive_decode_equals_baseline_decode():
    """The load-bearing cross-mode check: progressive and baseline
    encodings carry the SAME quantized coefficients through different
    entropy paths, so their decodes must agree BIT FOR BIT. A symmetric
    encoder/decoder bug in the progressive path cannot survive this —
    the baseline decoder is pinned by the analytic tests above."""
    from logparser_llm_spark.operators.jpeg import encode_jpeg_progressive

    for hw in ((16, 16), (40, 56), (37, 45), (8, 8), (24, 17)):
        img = _rand(*hw)
        for sub in ("444", "420"):
            base = decode_jpeg(encode_jpeg(img, sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, sub))
            assert np.array_equal(base, prog), (hw, sub)


def test_progressive_uniform_and_smooth():
    from logparser_llm_spark.operators.jpeg import encode_jpeg_progressive

    uni = np.full((32, 32, 3), 137, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(uni)), decode_jpeg(encode_jpeg(uni))
    )
    img = _smooth(40, 56)
    assert _psnr(decode_jpeg(encode_jpeg_progressive(img, "420")), img) > 32


def test_progressive_eobrun_spans_blocks():
    """A mostly-flat image makes whole blocks AC-empty → multi-block EOB
    runs (EOBn symbols, n > 0) on the wire; decode must still be
    bit-identical to baseline. (The flat progressive AC table exists
    precisely because Annex K has no EOBn symbols.)"""
    from logparser_llm_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((64, 64, 3), 90, dtype=np.uint8)
    img[30:34, 30:34] = 200  # one busy patch amid many empty blocks
    payload = encode_jpeg_progressive(img)
    assert np.array_equal(decode_jpeg(payload), decode_jpeg(encode_jpeg(img)))


def test_progressive_truncated_raises_valueerror():
    from logparser_llm_spark.operators.jpeg import encode_jpeg_progressive

    p = encode_jpeg_progressive(_rand(24, 24))
    with pytest.raises(ValueError):
        decode_jpeg(p[: len(p) * 2 // 3])
    with pytest.raises(ValueError, match="missing EOI"):
        decode_jpeg(p[:-2])  # EOI stripped


def test_progressive_through_decode_image_dispatch():
    """multimodal.decode_image must decode progressive JPEG natively now
    (no PIL in the container — r4 routed these to NotImplementedError)."""
    from logparser_llm_spark.operators.jpeg import encode_jpeg_progressive
    from logparser_llm_spark.operators.multimodal import decode_image

    img = _rand(20, 28)
    arr, fmt = decode_image(encode_jpeg_progressive(img))
    assert fmt == "jpeg"
    assert np.array_equal(arr, decode_jpeg(encode_jpeg(img)))
