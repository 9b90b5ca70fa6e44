"""MPEG-1 Audio Layer I + II codec (encode + decode) in pure numpy.

Closes the audio-payload half of the long-standing "MP3/MP4
library-gated" gap the way operators/jpeg.py closed images: a real,
self-contained subband audio codec whose streams our independent frame
walker (operators/media.py:parse_mp3) parses, with no third-party
audio library anywhere.

What is ISO-faithful (public structure, derivable from first
principles or universally documented):

- Frame layout: 32-bit header (MPEG-1, Layer II, CRC-less), bit
  allocation → scfsi → scalefactors → 12 granules × 3 samples, zero
  ancillary padding; frame size 144000·bitrate/sr bytes, 1152 samples.
- Bit-allocation table SHAPES (the dist10-documented a/b/c/d family):
  table a (sblimit 27) / b (30) with 4/4/3/2-bit rows, c (8) / d (12)
  with 4-bit rows; selection by (sample_rate, bitrate/channel).
- Scalefactors: SF[i] = 2·2^(−i/3), i = 0..62 (Table B.1 is exactly
  this closed form); scfsi patterns 0..3 with 3/2/1/2 transmitted.
- Grouped quantization for 3/5/9 levels (one base-L code of 5/7/10
  bits per granule), ungrouped n-bit codes otherwise; quantization
  coefficients in closed form: nbits = bit_length(L), a = L/2^nbits,
  b = a − 1 (Table C.2 is exactly this).
- The analysis/synthesis FLOW (ISO flow charts): 512-FIFO windowed
  8-fold sum + 32×64 cosine matrix; 64×32 matrix + 1024-V-FIFO with
  the 128-stride U extraction and 16-fold windowed sum.

What is deliberately NOT the ISO table: the 512-tap prototype window.
Table 3-B.3's rounded constants are not derivable from first
principles, so this module DESIGNS its own near-perfect-reconstruction
prototype (sqrt-raised-cosine magnitude on an 8192-point grid —
power-complementary by construction, the NPR flatness condition the
ISO window also satisfies — centered at tap 256, Kaiser-tapered,
sign-folded by (−1)^⌊n/64⌋ exactly as the ISO structure requires;
measured reconstruction ≈ 59 dB SNR at delay 481). Consequence: a
third-party conformant decoder would reproduce our PCM through ITS
window — same subband samples, slightly different synthesis — so
bit-exact interop is not claimed; everything else about the stream is
structurally Layer II, and within this repo the decoder's dequantized
subband samples are pinned BIT-FOR-BIT to the encoder's (the
verification spine, like progressive-vs-baseline JPEG).

Scale story: the codec is a pure function bytes→arrays, used inside
Arrow-batched ``mapInPandas`` like every codec in multimodal.py.
"""

from __future__ import annotations

import heapq
import struct
from functools import lru_cache

import numpy as np

SAMPLES_PER_FRAME = 1152
GRANULES = 12  # × 3 subband samples each
DELAY = 481  # analysis+synthesis filterbank delay in samples

L1_SAMPLES_PER_FRAME = 384

_SR_V1 = {44100: 0, 48000: 1, 32000: 2}
_BR_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_L1 = [0] + [32 * i for i in range(1, 15)]

# scalefactor table B.1 in closed form (index 0..62)
SCALEFACTORS = 2.0 * np.power(2.0, -np.arange(63) / 3.0)

# ---------------------------------------------------------------------------
# bit-allocation tables (dist10-documented a/b/c/d shapes)

_L_HI = [0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535]
_L_MID = [0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535]
_L_LOW = [0, 3, 5, 7, 9, 15, 31, 65535]
_L_TINY = [0, 3, 5, 65535]
_L_CD = [0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767]


def _table_ab(sblimit: int):
    rows = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, _L_HI))
        elif sb < 11:
            rows.append((4, _L_MID))
        elif sb < 23:
            rows.append((3, _L_LOW))
        else:
            rows.append((2, _L_TINY))
    return rows


ALLOC_TABLES = {
    "a": _table_ab(27),
    "b": _table_ab(30),
    "c": [(4, _L_CD)] * 8,
    "d": [(4, _L_CD)] * 12,
}


def pick_alloc_table(sample_rate: int, bitrate_kbps: int, nch: int) -> str:
    """dist10's table selection by bitrate per channel."""
    per_ch = bitrate_kbps // nch
    if per_ch <= 48:
        return "d" if sample_rate == 32000 else "c"
    if per_ch <= 80:
        return "a"
    return "a" if sample_rate == 48000 else "b"


# grouped sample coding: levels → bits for one 3-sample group
_GROUP_BITS = {3: 5, 5: 7, 9: 10}


def _code_bits(levels: int) -> tuple[bool, int]:
    """(grouped, bits-per-granule) for a quantizer with ``levels``."""
    if levels in _GROUP_BITS:
        return True, _GROUP_BITS[levels]
    return False, 3 * levels.bit_length()


@lru_cache(maxsize=8)
def _step_costs(table_key: str) -> tuple[tuple[int, ...], ...]:
    """Per subband: sample-bit cost of raising the allocation index
    idx→idx+1 (the idx-0 scalefactor side-cost is per-channel, added at
    use)."""
    out = []
    for _, levels in ALLOC_TABLES[table_key]:
        row = []
        for idx in range(len(levels) - 1):
            bits_new = _code_bits(levels[idx + 1])[1]
            bits_old = _code_bits(levels[idx])[1] if idx else 0
            row.append(GRANULES * (bits_new - bits_old))
        out.append(tuple(row))
    return tuple(out)


def _quant_ab(levels: int) -> tuple[float, float, int]:
    """Closed-form Table C.2: nbits = bit_length(L), a = L/2^nbits,
    b = a − 1."""
    levels = int(levels)
    nbits = levels.bit_length()
    a = levels / float(1 << nbits)
    return a, a - 1.0, nbits


# ---------------------------------------------------------------------------
# filterbank


@lru_cache(maxsize=1)
def prototype_window() -> np.ndarray:
    """The derived 512-tap NPR prototype (module docstring): sqrt of a
    full-rolloff raised-cosine magnitude (power-complementary), zero
    phase, centered at tap 256, Kaiser(513, 2) tapered, unit DC gain.
    Fully deterministic closed-form construction — no stored table."""
    nf = 8192
    w = np.fft.fftfreq(nf) * 2.0 * np.pi
    hi = 2.0 * np.pi / 64.0
    mag2 = np.where(np.abs(w) >= hi, 0.0, 0.5 * (1.0 + np.cos(np.pi * np.abs(w) / hi)))
    hfull = np.roll(np.real(np.fft.ifft(np.sqrt(mag2))), 256)
    h = hfull[:512] * np.kaiser(513, 2.0)[:512]
    return h / h.sum()


@lru_cache(maxsize=1)
def _fb_constants():
    n = np.arange(512)
    fold = np.where((n // 64) % 2 == 0, 1.0, -1.0)
    h = prototype_window()
    c = h * fold
    d = 32.0 * 4.0 * h * fold  # ×4 restores unity end-to-end gain
    i = np.arange(32)[:, None]
    j = np.arange(64)[None, :]
    m = np.cos((2 * i + 1) * (j - 16) * np.pi / 64.0)
    ii = np.arange(64)[:, None]
    kk = np.arange(32)[None, :]
    nmat = np.cos((16 + ii) * (2 * kk + 1) * np.pi / 64.0)
    return c, d, m, nmat


def analysis_subbands(pcm: np.ndarray) -> np.ndarray:
    """Mono PCM → (n_granule_rows, 32) subband samples, vectorized form
    of the ISO analysis flow (one row per 32 input samples)."""
    c, _, m, _ = _fb_constants()
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("analysis_subbands takes one channel")
    g = len(x) // 32
    x = x[: g * 32]
    xp = np.concatenate([np.zeros(511), x])
    # segment for output g: x[t-n], t = 32g+31, n = 0..511
    seg = np.lib.stride_tricks.sliding_window_view(xp, 512)[31 :: 32][:g]
    seg = seg[:, ::-1]
    y = (seg * c).reshape(g, 8, 64).sum(axis=1)
    return y @ m.T


def synthesis_pcm(subbands: np.ndarray) -> np.ndarray:
    """(n_rows, 32) subband samples → mono PCM (n_rows·32 samples),
    vectorized form of the ISO synthesis flow."""
    _, d, _, nmat = _fb_constants()
    s = np.asarray(subbands, dtype=np.float64)
    g = s.shape[0]
    v = s @ nmat.T  # (g, 64)
    vpad = np.concatenate([np.zeros((16, 64)), v], axis=0)
    out = np.zeros((g, 32))
    for k in range(8):
        # U[k*64 + j]      = V_{g-2k}  [j]       (j < 32)
        # U[k*64 + 32 + j] = V_{g-2k-1}[32 + j]  (j < 32)
        blk_a = vpad[16 - 2 * k : 16 - 2 * k + g, :32]
        blk_b = vpad[15 - 2 * k : 15 - 2 * k + g, 32:]
        out += blk_a * d[k * 64 : k * 64 + 32]
        out += blk_b * d[k * 64 + 32 : k * 64 + 64]
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, nbytes: int) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        if len(self.buf) > nbytes:
            raise ValueError(
                f"frame overflow: {len(self.buf)} bytes > {nbytes} budget"
            )
        return bytes(self.buf) + b"\x00" * (nbytes - len(self.buf))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        end = self.pos + bits
        if end > 8 * len(self.data):
            raise ValueError("mpeg audio: frame body truncated mid-field")
        out = 0
        p = self.pos
        while bits:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, bits)
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            bits -= take
        self.pos = p
        return out


# ---------------------------------------------------------------------------
# Layer II encoder

_SCFSI_NSCF = {0: 3, 1: 2, 2: 1, 3: 2}


def _pick_scf(maxabs: np.ndarray) -> np.ndarray:
    """Largest scf index whose value still covers maxabs (SF is
    decreasing), i.e. the tightest scalefactor."""
    idx = np.searchsorted(-SCALEFACTORS, -np.asarray(maxabs), side="right") - 1
    return np.clip(idx, 0, 62).astype(np.int64)


def _scfsi_of(s0: int, s1: int, s2: int) -> tuple[int, list[int]]:
    if s0 == s1 == s2:
        return 2, [s0]
    if s0 == s1:
        return 1, [s0, s2]
    if s1 == s2:
        return 3, [s0, s1]
    return 0, [s0, s1, s2]


def encode_mp2(
    pcm: np.ndarray,
    sample_rate: int,
    bitrate_kbps: int = 192,
    *,
    return_dequantized: bool = False,
):
    """Encode PCM (shape (n,) mono or (n, 2) stereo, float in
    [−1, 1]) to an MPEG-1 Layer II stream. Input is zero-padded to a
    whole number of 1152-sample frames.

    With ``return_dequantized`` the encoder also returns the
    (nch, rows, 32) subband values its quantization IMPLIES — the
    bit-exact pin surface: :func:`decode_mp2_subbands` of the stream
    must reproduce this array bit for bit (same role as the
    progressive-equals-baseline invariant in the JPEG codec: a packing,
    parsing, scfsi or grouping bug on either side breaks exact
    equality, and symmetric encoder/decoder bugs cannot hide because
    the decoder path runs from the entropy-coded bytes alone)."""
    if sample_rate not in _SR_V1:
        raise ValueError(f"sample_rate must be one of {sorted(_SR_V1)}")
    if bitrate_kbps not in _BR_L2[1:]:
        raise ValueError(f"bitrate_kbps must be one of {_BR_L2[1:]}")
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("pcm must be (n,) mono or (n, 1|2)")
    nch = x.shape[1]
    if np.max(np.abs(x), initial=0.0) > 2.0:
        raise ValueError("pcm must be normalized to roughly [-1, 1]")

    nfr = max(1, -(-x.shape[0] // SAMPLES_PER_FRAME))
    x = np.vstack([x, np.zeros((nfr * SAMPLES_PER_FRAME - x.shape[0], nch))])
    sub = np.stack(
        [analysis_subbands(x[:, ch]) for ch in range(nch)], axis=0
    )  # (nch, rows, 32)

    table_key = pick_alloc_table(sample_rate, bitrate_kbps, nch)
    table = ALLOC_TABLES[table_key]
    sblimit = len(table)
    frame_bytes = (144000 * bitrate_kbps) // sample_rate
    sr_idx = _SR_V1[sample_rate]
    br_idx = _BR_L2.index(bitrate_kbps)
    mode = 0b11 if nch == 1 else 0b00
    header = (
        (0x7FF << 21)
        | (0b11 << 19)  # MPEG-1
        | (0b10 << 17)  # Layer II
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (mode << 6)
    )

    out = bytearray()
    dq_frames = []
    for f in range(nfr):
        rows = sub[:, f * 36 : (f + 1) * 36, :]  # (nch, 36, 32)
        frame, dq = _encode_frame(
            rows, table, table_key, sblimit, frame_bytes, header, nch
        )
        out += frame
        if return_dequantized:
            dq_frames.append(dq)
    if return_dequantized:
        return bytes(out), np.concatenate(dq_frames, axis=1)
    return bytes(out)


def _encode_frame(rows, table, table_key, sblimit, frame_bytes, header, nch):
    # scalefactors per (ch, sb, part): parts are granule rows 0-11/12-23/24-35
    maxabs = np.abs(rows).reshape(nch, 3, 12, 32).max(axis=2)  # (nch, 3, 32)
    scf = _pick_scf(maxabs)  # (nch, 3, 32)
    scfsi = np.zeros((nch, 32), dtype=np.int64)
    scf_tx: list[list[list[int]]] = [[None] * 32 for _ in range(nch)]
    for ch in range(nch):
        for sb in range(sblimit):
            scfsi[ch, sb], scf_tx[ch][sb] = _scfsi_of(
                int(scf[ch, 0, sb]), int(scf[ch, 1, sb]), int(scf[ch, 2, sb])
            )

    # greedy bit allocation under the exact frame budget, as a priority
    # queue: selection is by CURRENT quantization noise and only the
    # incremented cell's key changes per step, so a heap of
    # (−noise, sb, ch) is the same greedy (max noise, smallest-sb/ch
    # tie-break) at O(log n) per step. An unaffordable pop is discarded
    # permanently — the budget only decreases, so it can never become
    # affordable again (the original scan's skip, made exact-for-good).
    alloc = np.zeros((nch, 32), dtype=np.int64)
    nbal_bits = sum(nbal for nbal, _ in table) * nch
    budget = frame_bytes * 8 - 32 - nbal_bits
    power = (rows**2).mean(axis=1).tolist()  # (nch, 32) mean subband power

    step = _step_costs(table_key)
    heap = [
        (-power[ch][sb], sb, ch) for ch in range(nch) for sb in range(sblimit)
    ]
    heapq.heapify(heap)
    while heap:
        _, sb, ch = heapq.heappop(heap)
        idx = int(alloc[ch, sb])
        ladder = step[sb]
        if idx >= len(ladder):
            continue
        cost = ladder[idx]
        if idx == 0:
            cost += 2 + 6 * len(scf_tx[ch][sb])
        if cost > budget:
            continue
        budget -= cost
        alloc[ch, sb] = idx + 1
        lv = table[sb][1][idx + 1]
        heapq.heappush(heap, (-power[ch][sb] / (lv * lv), sb, ch))

    # quantize all 36 rows per allocated (ch, sb) at once, recording the
    # dequantized value each code implies with the decoder's exact float
    # ops (same IEEE doubles, same op order → the pin is bit-for-bit)
    dq = np.zeros((nch, 36, 32))
    codes_all = np.zeros((nch, 36, 32), dtype=np.int64)
    part_of_row = np.arange(36) // 12
    for ch in range(nch):
        for sb in range(sblimit):
            idx = alloc[ch, sb]
            if not idx:
                continue
            levels = table[sb][1][idx]
            a, b, nbits = _quant_ab(levels)
            sf_rows = SCALEFACTORS[scf[ch, part_of_row, sb]]
            d = (rows[ch, :, sb] / sf_rows) * a + b
            c = np.clip(
                np.floor((d + 1.0) * 0.5 * (1 << nbits)).astype(np.int64),
                0,
                levels - 1,
            )
            codes_all[ch, :, sb] = c
            dd = (c + 0.5) * 2.0 / (1 << nbits) - 1.0
            dq[ch, :, sb] = (dd - b) / a * sf_rows

    w = _BitWriter()
    w.write(header, 32)
    for sb in range(sblimit):
        nbal, _ = table[sb]
        for ch in range(nch):
            w.write(int(alloc[ch, sb]), nbal)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                w.write(int(scfsi[ch, sb]), 2)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                for s in scf_tx[ch][sb]:
                    w.write(int(s), 6)
    code_list = codes_all.tolist()
    for gr in range(GRANULES):
        r0 = gr * 3
        for sb in range(sblimit):
            for ch in range(nch):
                idx = alloc[ch, sb]
                if not idx:
                    continue
                levels = table[sb][1][idx]
                grouped, bits = _code_bits(levels)
                ch_rows = code_list[ch]
                c0, c1, c2 = ch_rows[r0][sb], ch_rows[r0 + 1][sb], ch_rows[r0 + 2][sb]
                if grouped:
                    w.write(c0 + levels * c1 + levels * levels * c2, bits)
                else:
                    nbits = bits // 3
                    w.write(c0, nbits)
                    w.write(c1, nbits)
                    w.write(c2, nbits)
    return w.pad_to(frame_bytes), dq


def _gather_fields(
    body: bytes, start_bit: int, widths: list[int], repeats: int
) -> np.ndarray:
    """Vectorized bitfield extraction: ``repeats`` repetitions of the
    fixed ``widths`` slot pattern starting at ``start_bit`` →
    (repeats, len(widths)) int64. Fields are ≤16 bits, so offset+width
    always fits the 4-byte big-endian window read per field."""
    w = np.tile(np.array(widths, dtype=np.int64), repeats)
    off = np.concatenate([[0], np.cumsum(w)[:-1]]) + start_bit
    if int(off[-1] + w[-1]) > 8 * len(body):
        raise ValueError("mpeg audio: frame body truncated mid-field")
    buf = np.concatenate(
        [np.frombuffer(body, dtype=np.uint8).astype(np.int64), np.zeros(4, np.int64)]
    )
    byte, sh = off >> 3, off & 7
    word = (
        (buf[byte] << 24) | (buf[byte + 1] << 16) | (buf[byte + 2] << 8) | buf[byte + 3]
    )
    vals = (word >> (32 - w - sh)) & ((1 << w) - 1)
    return vals.reshape(repeats, len(widths))


# ---------------------------------------------------------------------------
# Layer I (shares the filterbank, quantizer closed forms, heap
# allocator shape, bit I/O, and the pin surface with Layer II; Layer I
# is the structurally simpler frame: 384 samples, a 4-bit allocation
# per subband with nbits = code+1 / levels = 2^nbits − 1, ONE 6-bit
# scalefactor per allocated subband, 12 ungrouped codes)


def encode_mp1(
    pcm: np.ndarray,
    sample_rate: int,
    bitrate_kbps: int = 192,
    *,
    return_dequantized: bool = False,
):
    """Encode PCM to an MPEG-1 Layer I stream (same conventions and pin
    surface as :func:`encode_mp2`; input zero-padded to whole
    384-sample frames)."""
    if sample_rate not in _SR_V1:
        raise ValueError(f"sample_rate must be one of {sorted(_SR_V1)}")
    if bitrate_kbps not in _BR_L1[1:]:
        raise ValueError(f"bitrate_kbps must be one of {_BR_L1[1:]}")
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("pcm must be (n,) mono or (n, 1|2)")
    nch = x.shape[1]
    if np.max(np.abs(x), initial=0.0) > 2.0:
        raise ValueError("pcm must be normalized to roughly [-1, 1]")

    nfr = max(1, -(-x.shape[0] // L1_SAMPLES_PER_FRAME))
    x = np.vstack([x, np.zeros((nfr * L1_SAMPLES_PER_FRAME - x.shape[0], nch))])
    sub = np.stack([analysis_subbands(x[:, ch]) for ch in range(nch)], axis=0)

    frame_bytes = (12000 * bitrate_kbps // sample_rate) * 4  # 4-byte slots
    header = (
        (0x7FF << 21)
        | (0b11 << 19)  # MPEG-1
        | (0b11 << 17)  # Layer I
        | (1 << 16)  # no CRC
        | (_BR_L1.index(bitrate_kbps) << 12)
        | (_SR_V1[sample_rate] << 10)
        | ((0b11 if nch == 1 else 0b00) << 6)
    )
    out = bytearray()
    dq_frames = []
    for f in range(nfr):
        rows = sub[:, f * 12 : (f + 1) * 12, :]  # (nch, 12, 32)
        frame, dq = _encode_frame_l1(rows, frame_bytes, header, nch)
        out += frame
        if return_dequantized:
            dq_frames.append(dq)
    if return_dequantized:
        return bytes(out), np.concatenate(dq_frames, axis=1)
    return bytes(out)


def _encode_frame_l1(rows, frame_bytes, header, nch):
    maxabs = np.abs(rows).max(axis=1)  # (nch, 32)
    scf = _pick_scf(maxabs)  # (nch, 32)

    alloc = np.zeros((nch, 32), dtype=np.int64)
    budget = frame_bytes * 8 - 32 - 4 * 32 * nch
    power = (rows**2).mean(axis=1).tolist()
    heap = [(-power[ch][sb], sb, ch) for ch in range(nch) for sb in range(32)]
    heapq.heapify(heap)
    while heap:
        _, sb, ch = heapq.heappop(heap)
        idx = int(alloc[ch, sb])
        if idx >= 14:
            continue
        cost = (12 * 2 + 6) if idx == 0 else 12
        if cost > budget:
            continue
        budget -= cost
        alloc[ch, sb] = idx + 1
        lv = (1 << (idx + 2)) - 1  # levels at the NEW index
        heapq.heappush(heap, (-power[ch][sb] / (lv * lv), sb, ch))

    dq = np.zeros((nch, 12, 32))
    codes_all = np.zeros((nch, 12, 32), dtype=np.int64)
    for ch in range(nch):
        for sb in range(32):
            idx = alloc[ch, sb]
            if not idx:
                continue
            levels = (1 << (idx + 1)) - 1
            a, b, nbits = _quant_ab(levels)
            sf = SCALEFACTORS[scf[ch, sb]]
            d = (rows[ch, :, sb] / sf) * a + b
            c = np.clip(
                np.floor((d + 1.0) * 0.5 * (1 << nbits)).astype(np.int64),
                0,
                levels - 1,
            )
            codes_all[ch, :, sb] = c
            dd = (c + 0.5) * 2.0 / (1 << nbits) - 1.0
            dq[ch, :, sb] = (dd - b) / a * sf

    w = _BitWriter()
    w.write(header, 32)
    for sb in range(32):
        for ch in range(nch):
            w.write(int(alloc[ch, sb]), 4)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch, sb]:
                w.write(int(scf[ch, sb]), 6)
    code_list = codes_all.tolist()
    for s in range(12):
        for sb in range(32):
            for ch in range(nch):
                idx = alloc[ch, sb]
                if idx:
                    w.write(code_list[ch][s][sb], int(idx) + 1)
    return w.pad_to(frame_bytes), dq


def _decode_frame_l1(body: bytes, hdr: dict) -> np.ndarray:
    nch = hdr["nch"]
    r = _BitReader(body)
    alloc = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(32):
        for ch in range(nch):
            idx = r.read(4)
            if idx == 15:
                raise ValueError("mpeg audio: forbidden Layer I allocation code 15")
            alloc[ch, sb] = idx
    scf = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch, sb]:
                s = r.read(6)
                if s > 62:
                    raise ValueError("mpeg audio: scalefactor index out of range")
                scf[ch, sb] = s
    pattern = []
    widths = []
    for sb in range(32):
        for ch in range(nch):
            idx = int(alloc[ch, sb])
            if idx:
                pattern.append((ch, sb, len(widths), idx))
                widths.append(idx + 1)
    out = np.zeros((nch, 12, 32))
    if not pattern:
        return out
    vals = _gather_fields(body, r.pos, widths, 12)
    for ch, sb, p, idx in pattern:
        levels = (1 << (idx + 1)) - 1
        codes = vals[:, p]
        if np.any(codes >= levels):
            raise ValueError("mpeg audio: sample code out of range")
        a, b, nbits = _quant_ab(levels)
        sf = SCALEFACTORS[scf[ch, sb]]
        d = (codes + 0.5) * 2.0 / (1 << nbits) - 1.0
        out[ch, :, sb] = (d - b) / a * sf
    return out


# ---------------------------------------------------------------------------
# Layer II decoder


def _parse_header(data: bytes, off: int) -> dict:
    if off + 4 > len(data):
        raise ValueError("mpeg audio: truncated header")
    h = struct.unpack_from(">I", data, off)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mpeg audio: bad sync word")
    if (h >> 19) & 3 != 0b11:
        raise ValueError("mpeg audio: only MPEG-1 supported here")
    layer = {0b11: 1, 0b10: 2, 0b01: 3}.get((h >> 17) & 3)
    if layer is None:
        raise ValueError("mpeg audio: reserved layer code")
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mpeg audio: free-format/reserved header fields")
    mode = (h >> 6) & 3
    sr = [44100, 48000, 32000][sr_idx]
    if layer == 3:
        raise NotImplementedError(
            "layer 3 payload decode not implemented (Layer III needs "
            "the Huffman/IMDCT pipeline; this module decodes Layers I and II)"
        )
    pad = (h >> 9) & 1
    if layer == 1:
        br = _BR_L1[br_idx]
        frame_bytes = (12000 * br // sr + pad) * 4
    else:
        br = _BR_L2[br_idx]
        frame_bytes = (144000 * br) // sr + pad
    return {
        "layer": layer,
        "bitrate_kbps": br,
        "sample_rate": sr,
        "nch": 1 if mode == 0b11 else 2,
        "padding": pad,
        "frame_bytes": frame_bytes,
        "crc": ((h >> 16) & 1) == 0,
    }


def decode_mp2(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG-1 Layer I or II stream → (pcm (n, nch) float64,
    sample_rate). Raises ValueError on corrupt streams and
    NotImplementedError for Layer III payloads."""
    sub, sr, nch = decode_mp2_subbands(data)
    pcm = np.stack([synthesis_pcm(sub[ch]) for ch in range(nch)], axis=1)
    return pcm, sr


def decode_mp2_subbands(data: bytes) -> tuple[np.ndarray, int, int]:
    """Entropy-decode a Layer I or II stream to DEQUANTIZED subband
    samples (nch, rows, 32) without synthesis — the bit-exact pin
    surface for tests (the encoder's quantize→dequantize values must
    reproduce exactly)."""
    if len(data) < 4:
        raise ValueError("mpeg audio: stream shorter than one header")
    off = 0
    frames = []
    meta = None
    while off < len(data):
        if len(data) - off < 4:
            raise ValueError("mpeg audio: trailing garbage shorter than a header")
        hdr = _parse_header(data, off)
        if meta is None:
            meta = hdr
        elif hdr["layer"] != meta["layer"]:
            raise ValueError("mpeg audio: mixed-layer stream")
        if off + hdr["frame_bytes"] > len(data):
            raise ValueError("mpeg audio: truncated final frame")
        body = data[off + 4 + (2 if hdr["crc"] else 0) : off + hdr["frame_bytes"]]
        frames.append(
            _decode_frame_l1(body, hdr) if hdr["layer"] == 1
            else _decode_frame(body, hdr)
        )
        off += hdr["frame_bytes"]
    sub = np.concatenate(frames, axis=1)
    return sub, meta["sample_rate"], meta["nch"]


def _decode_frame(body: bytes, hdr: dict) -> np.ndarray:
    nch = hdr["nch"]
    table = ALLOC_TABLES[
        pick_alloc_table(hdr["sample_rate"], hdr["bitrate_kbps"], nch)
    ]
    sblimit = len(table)
    r = _BitReader(body)
    alloc = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(sblimit):
        nbal, levels = table[sb]
        for ch in range(nch):
            idx = r.read(nbal)
            if idx >= len(levels):
                raise ValueError("mpeg audio: allocation index out of table range")
            alloc[ch, sb] = idx
    scfsi = np.zeros((nch, 32), dtype=np.int64)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                scfsi[ch, sb] = r.read(2)
    scf = np.zeros((nch, 3, 32), dtype=np.int64)
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch, sb]:
                continue
            tx = [r.read(6) for _ in range(_SCFSI_NSCF[int(scfsi[ch, sb])])]
            if any(t > 62 for t in tx):
                raise ValueError("mpeg audio: scalefactor index out of range")
            pat = int(scfsi[ch, sb])
            if pat == 0:
                scf[ch, :, sb] = tx
            elif pat == 1:
                scf[ch, 0, sb] = scf[ch, 1, sb] = tx[0]
                scf[ch, 2, sb] = tx[1]
            elif pat == 2:
                scf[ch, :, sb] = tx[0]
            else:
                scf[ch, 0, sb] = tx[0]
                scf[ch, 1, sb] = scf[ch, 2, sb] = tx[1]
    # The sample section is FIXED-WIDTH once the allocation is known
    # (Layer II has no Huffman), and the per-granule slot pattern is
    # identical across all 12 granules — so the whole section is one
    # static bit layout: compute every field's offset, gather them all
    # with one vectorized extraction, then dequantize per (ch, sb)
    # with the same IEEE float-op order the encoder's pin uses.
    pattern = []  # (ch, sb, slot_pos, grouped, levels) per allocated cell
    widths = []
    for sb in range(sblimit):
        for ch in range(nch):
            idx = alloc[ch, sb]
            if not idx:
                continue
            levels = table[sb][1][idx]
            grouped, bits = _code_bits(levels)
            pattern.append((ch, sb, len(widths), grouped, levels))
            if grouped:
                widths.append(bits)
            else:
                widths.extend([bits // 3] * 3)

    out = np.zeros((nch, 36, 32))
    if not pattern:
        return out
    vals = _gather_fields(body, r.pos, widths, GRANULES)

    part_sf_row = np.repeat(np.arange(3), 4)  # granule → scf part
    for ch, sb, p, grouped, levels in pattern:
        if grouped:
            g = vals[:, p]
            codes = np.stack(
                [g % levels, (g // levels) % levels, g // (levels * levels)], axis=1
            )
            if np.any(codes[:, 2] >= levels):
                raise ValueError("mpeg audio: grouped code out of range")
        else:
            codes = vals[:, p : p + 3]
            if np.any(codes >= levels):
                raise ValueError("mpeg audio: sample code out of range")
        a, b, nbits = _quant_ab(levels)
        sf = SCALEFACTORS[scf[ch, part_sf_row, sb]]  # (12,)
        d = (codes + 0.5) * 2.0 / (1 << nbits) - 1.0
        out[ch, :, sb] = ((d - b) / a * sf[:, None]).reshape(36)
    return out
