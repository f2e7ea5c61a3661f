"""Multimodal column plumbing (north-star extension; BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode step runs as Arrow-batched ``mapInPandas`` — the
only correct place for per-record Python in this engine — with the
schema, partitioning, UDF signature and batch shape all real.

Decode paths, from most to least real:
- ``decode_bmp``/``encode_bmp`` — a REAL, dependency-free 24-bit BMP
  codec (full header/stride/row-order handling), driven end-to-end by
  the ``mm_image_decode_real`` operator whose DuckDB oracle predicts
  the decoded dims/size/pixel-checksum arithmetically;
- ``decode_image_real`` — arbitrary formats via PIL, import-gated
  (this container ships no image libraries);
- ``fake_decode_dims`` — the deterministic stub the original
  ``mm_image_decode_stub`` gate row verifies.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

try:  # real codec, absent in this container — import-gated by design
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, magic string, "
    "width int, height int, channels int"
)


def fake_decode_dims(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image dimension decode:
    width  = n_bytes % 640 + 1
    height = (n_bytes * 7) % 480 + 1
    channels = 3
    (pure arithmetic on the byte length — reproducible in ANSI SQL)."""
    n = len(data)
    return n % 640 + 1, (n * 7) % 480 + 1, 3


def decode_image_real(data: bytes) -> tuple[int, int, int]:  # pragma: no cover
    """Real decode path: requires an image library at deploy time."""
    if Image is None:
        raise NotImplementedError(
            "image decode requires PIL/pillow on the executors; "
            "this environment ships none (stub: fake_decode_dims)"
        )
    import io

    with Image.open(io.BytesIO(data)) as im:
        return im.width, im.height, len(im.getbands())


def _magic(data: bytes) -> str:
    """Cheap content sniff on leading bytes (jpeg/png/else)."""
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "bin"


# --- real BMP codec (dependency-free) ----------------------------------------
#
# One image format decoded FOR REAL, no optional library: 24-bit
# uncompressed BI_RGB BMP (Windows BITMAPINFOHEADER), the simplest
# spec-complete raster format — 14-byte file header, 40-byte info
# header, bottom-up BGR rows padded to 4-byte stride (top-down when
# height is negative). encode_bmp exists so tests and the
# mm_image_decode_real operator can synthesize valid files in-process;
# decode_bmp is the production parse path.

BMP_HEADER_BYTES = 54  # 14 (file header) + 40 (BITMAPINFOHEADER)


def bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB, rows top-down → 24-bit BI_RGB BMP bytes
    (stored bottom-up with stride padding, per spec)."""
    h, w, _ = pixels.shape
    stride = bmp_row_stride(w)
    img_size = stride * h
    file_header = struct.pack("<2sIHHI", b"BM", BMP_HEADER_BYTES + img_size, 0, 0, BMP_HEADER_BYTES)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP → (width, height, channels,
    (h, w, 3) uint8 RGB rows top-down). Handles bottom-up (h > 0) and
    top-down (h < 0) files and row stride padding; rejects anything
    outside the supported spec subset loudly rather than mis-decoding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})")
    top_down = h < 0
    ah = abs(h)
    stride = bmp_row_stride(w)
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * ah, offset=pixel_offset)
    rows = raw.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        rows = rows[::-1]  # stored bottom-up → return top-down
    return w, ah, 3, np.ascontiguousarray(rows)


# deterministic per-document test image: dims and pixel values are pure
# doc_id/x/y arithmetic so the DuckDB oracle predicts the DECODED
# output (dims, file size, pixel checksum) without parsing bytes — any
# stride/row-order/BGR mistake in encode_bmp/decode_bmp breaks the match
CHECKSUM_MOD = 2147483647


def synth_pixels(doc_id: int) -> np.ndarray:
    w = doc_id % 16 + 1
    h = (doc_id * 3) % 16 + 1
    y, x = np.mgrid[0:h, 0:w]
    r = (doc_id + x * 7 + y * 13) % 256
    g = (doc_id * 5 + x * 3 + y) % 256
    b = (doc_id * 2 + x + y * 11) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def pixel_checksum(pixels: np.ndarray) -> int:
    """Position-weighted checksum over RGB values — asymmetric in x/y
    so transposes and row-order flips change it."""
    h, w, _ = pixels.shape
    y, x = np.mgrid[0:h, 0:w]
    px = pixels.astype(np.int64)
    v = (px[:, :, 0] + px[:, :, 1] * 256 + px[:, :, 2] * 65536) * (y * w + x + 1)
    return int(v.sum()) % CHECKSUM_MOD


REAL_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, n_bytes int, pix_checksum bigint"
)


def decode_real_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_image_decode_real: synthesize a valid
    BMP per doc_id, then REALLY parse it back (full header + stride +
    row-order handling) and report decoded metadata. Per-image work is
    bounded (≤ 16×16 px); memory is one Arrow batch."""
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "channels": [], "n_bytes": [], "pix_checksum": []}
        for doc_id in pdf["doc_id"]:
            data = encode_bmp(synth_pixels(int(doc_id)))
            w, h, c, pixels = decode_bmp(data)
            out["doc_id"].append(int(doc_id))
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["n_bytes"].append(len(data))
            out["pix_checksum"].append(pixel_checksum(pixels))
        yield pd.DataFrame(out)


# --- real WAV codec (dependency-free) ----------------------------------------
#
# The audio counterpart of the BMP codec: 16-bit PCM RIFF/WAVE, the
# simplest spec-complete audio container. encode_wav writes the
# canonical 44-byte header + interleaved little-endian samples;
# decode_wav walks the chunk list properly (fmt before data, unknown
# chunks skipped with even padding per RIFF) rather than assuming the
# 44-byte layout, and rejects non-PCM/non-16-bit files loudly.

WAV_HEADER_BYTES = 44


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 interleaved PCM → RIFF/WAVE bytes."""
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse 16-bit PCM WAV → (sample_rate, channels, n_samples,
    (n, channels) int16 samples). Real chunk walk: tolerates extra
    chunks (LIST/fact/...) before data, enforces RIFF even-padding."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
            break  # fmt is required to precede data per spec
        pos += 8 + csize + (csize & 1)  # chunks pad to even length
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16 or block_align != ch * 2:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(pcm, dtype="<i2")[: len(pcm) // (ch * 2) * ch]
    return sample_rate, ch, len(samples) // ch, samples.reshape(-1, ch)


def synth_samples(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic per-document PCM clip: length, channel count,
    rate, and every sample are pure doc_id/i/c arithmetic (the WAV
    analogue of synth_pixels)."""
    n = doc_id % 256 + 16
    ch = doc_id % 2 + 1
    rate = 8000 + (doc_id % 4) * 4000
    i, c = np.mgrid[0:n, 0:ch]
    vals = (doc_id * 31 + i * 7 + c * 13) % 65536 - 32768
    return vals.astype(np.int16), rate


def pcm_checksum(samples: np.ndarray) -> int:
    """Position-weighted checksum over unsigned sample values —
    sensitive to channel deinterleave and sample-order mistakes."""
    n, ch = samples.shape
    i, c = np.mgrid[0:n, 0:ch]
    v = (samples.astype(np.int64) + 32768) * (i * ch + c + 1)
    return int(v.sum()) % CHECKSUM_MOD


AUDIO_DECODE_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, n_samples int, "
    "n_bytes int, pcm_checksum bigint"
)


def decode_audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_audio_decode_real: synthesize a valid
    WAV per doc_id, REALLY parse it back (chunk walk + PCM reshape)
    and report decoded metadata."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "sample_rate", "channels", "n_samples", "n_bytes", "pcm_checksum")}
        for doc_id in pdf["doc_id"]:
            samples, rate = synth_samples(int(doc_id))
            data = encode_wav(samples, rate)
            drate, dch, dn, decoded = decode_wav(data)
            out["doc_id"].append(int(doc_id))
            out["sample_rate"].append(drate)
            out["channels"].append(dch)
            out["n_samples"].append(dn)
            out["n_bytes"].append(len(data))
            out["pcm_checksum"].append(pcm_checksum(decoded))
        yield pd.DataFrame(out)


def decode_stored_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_image_decode_file: parse STORED BMP
    bytes (a binary column that came from binaryFile or parquet — no
    in-UDF synthesis) and report decoded metadata. The production
    decode path: what reaches this UDF is whatever storage held."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "width", "height", "channels", "n_bytes", "pix_checksum")}
        for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
            data = bytes(data)
            w, h, c, pixels = decode_bmp(data)
            out["doc_id"].append(int(doc_id))
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["n_bytes"].append(len(data))
            out["pix_checksum"].append(pixel_checksum(pixels))
        yield pd.DataFrame(out)


def decode_stored_audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_audio_decode_file: chunk-walk STORED
    WAV bytes from a binary column and report decoded metadata."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "sample_rate", "channels", "n_samples", "n_bytes", "pcm_checksum")}
        for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
            data = bytes(data)
            rate, ch, n, samples = decode_wav(data)
            out["doc_id"].append(int(doc_id))
            out["sample_rate"].append(rate)
            out["channels"].append(ch)
            out["n_samples"].append(n)
            out["n_bytes"].append(len(data))
            out["pcm_checksum"].append(pcm_checksum(samples))
        yield pd.DataFrame(out)


def decode_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, content: bytes) → image metadata.
    One output row per input row, vectorized per Arrow batch; executors
    never hold more than one batch (spark.sql.execution.arrow
    maxRecordsPerBatch bounds memory at any scale)."""
    for pdf in batches:
        content = pdf["content"]
        dims = content.map(fake_decode_dims)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": content.map(len).astype("int32"),
                "sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                "magic": content.map(_magic),
                "width": dims.map(lambda t: t[0]).astype("int32"),
                "height": dims.map(lambda t: t[1]).astype("int32"),
                "channels": dims.map(lambda t: t[2]).astype("int32"),
            }
        )


# --- resize transform (decode -> transform -> re-encode) ---------------------
#
# The first TRANSFORM stage of the multimodal pipeline: nearest-
# neighbor downsample to a fixed thumbnail, implemented on the real
# BMP codec (decode_bmp -> index-map resize -> encode_bmp -> decode_bmp
# round-trip of the RESULT). The index map is pure integer arithmetic
# (src_row = i*h // DST, src_col = j*w // DST), so the DuckDB oracle
# predicts the resized pixel checksum from the same formulas without
# touching bytes — a wrong axis, a rounding drift, or a re-encode bug
# all break the value hash.

RESIZE_DST = 8  # thumbnail edge (pixels)

RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int,"
    " n_bytes int, pix_checksum bigint"
)


def resize_nearest(pixels: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Nearest-neighbor resample via floor index maps (top-left
    convention: src index = dst index * src_extent // dst_extent)."""
    h, w, _ = pixels.shape
    ys = (np.arange(dst_h) * h) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    return np.ascontiguousarray(pixels[ys][:, xs])


def resize_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_image_resize_real: synth BMP -> real
    decode -> nearest-neighbor resize -> real re-encode -> real decode
    of the thumbnail; reports source dims, thumbnail dims/file size,
    and the thumbnail's pixel checksum. Per-image work bounded
    (<= 16x16 src, 8x8 dst); memory is one Arrow batch."""
    for pdf in batches:
        out = {
            "doc_id": [], "src_w": [], "src_h": [], "dst_w": [],
            "dst_h": [], "n_bytes": [], "pix_checksum": [],
        }
        for doc_id in pdf["doc_id"]:
            sw, sh, _, pixels = decode_bmp(encode_bmp(synth_pixels(int(doc_id))))
            thumb_bytes = encode_bmp(resize_nearest(pixels, RESIZE_DST, RESIZE_DST))
            dw, dh, _, thumb = decode_bmp(thumb_bytes)
            out["doc_id"].append(int(doc_id))
            out["src_w"].append(sw)
            out["src_h"].append(sh)
            out["dst_w"].append(dw)
            out["dst_h"].append(dh)
            out["n_bytes"].append(len(thumb_bytes))
            out["pix_checksum"].append(pixel_checksum(thumb))
        yield pd.DataFrame(out)


# --- MV01 video container: real header/stride walk + frame sampling ---------
#
# A minimal multi-frame container in the spirit of the BMP/WAV codecs
# above: dependency-free, byte-real, and fully predictable so the
# DuckDB oracle can verify every sampled frame arithmetically.
#
#   magic 4s b'MV01' | u8 n_frames | u8 width | u8 height
#   then n_frames grayscale planes of width*height bytes each
#
# decode_video REALLY walks the layout (magic check, exact-length
# check, per-frame stride); sampling keeps every FRAME_STRIDE-th frame
# — the "sample 1 fps from a video" shape of a multimodal ingest
# pipeline, where decoding every frame would be decode-bound waste.

VIDEO_MAGIC = b"MV01"
FRAME_STRIDE = 2  # keep frames 0, 2, 4, ...


def synth_video(doc_id: int) -> tuple[np.ndarray, int, int, int]:
    """Deterministic per-document clip: (frames[n, h, w], n, w, h),
    every pixel pure doc_id/frame/position arithmetic."""
    n = doc_id % 6 + 4
    w = doc_id % 8 + 4
    h = (doc_id * 3) % 8 + 4
    f, i, j = np.mgrid[0:n, 0:h, 0:w]
    frames = ((doc_id * 11 + f * 17 + i * w + j) % 251).astype(np.uint8)
    return frames, n, w, h


def encode_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return struct.pack("<4sBBB", VIDEO_MAGIC, n, w, h) + frames.astype(np.uint8).tobytes()


def decode_video(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse MV01 bytes → (n_frames, w, h, frames[n, h, w]). Rejects
    bad magic and truncated/oversized payloads loudly."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not an MV01 container: bad magic")
    n, w, h = struct.unpack_from("<BBB", data, 4)
    body = data[7:]
    if len(body) != n * w * h:
        raise ValueError(f"MV01 length mismatch: {len(body)} != {n}*{w}*{h}")
    frames = np.frombuffer(body, dtype=np.uint8).reshape(n, h, w)
    return n, w, h, frames


def frame_checksum(frame: np.ndarray) -> int:
    """Position-weighted checksum over one grayscale plane — sensitive
    to row-order and stride mistakes (same design as pcm_checksum)."""
    h, w = frame.shape
    i, j = np.mgrid[0:h, 0:w]
    v = frame.astype(np.int64) * (i * w + j + 1)
    return int(v.sum()) % CHECKSUM_MOD


VIDEO_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, width int, height int, "
    "frame_checksum bigint"
)


def sample_video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for mm_video_frame_sample: synthesize a valid
    MV01 container per doc_id, REALLY parse it back (magic + stride
    walk), keep every FRAME_STRIDE-th frame, and report per-sampled-
    frame checksums."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "frame_idx", "n_frames", "width", "height", "frame_checksum")}
        for doc_id in pdf["doc_id"]:
            frames, _n, _w, _h = synth_video(int(doc_id))
            n, w, h, decoded = decode_video(encode_video(frames))
            for f in range(0, n, FRAME_STRIDE):
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(f)
                out["n_frames"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["frame_checksum"].append(frame_checksum(decoded[f]))
        yield pd.DataFrame(out)


# --- perceptual hash (dHash) --------------------------------------------------

# Difference hash over the DECODED pixels: nearest-neighbor resample to
# a 9x8 integer-luma grid, one bit per horizontal neighbor comparison.
# Integer-only arithmetic (grid indices (i*w)//9, luma 299R+587G+114B,
# strict >) so the DuckDB oracle reproduces every bit from the
# generator formulas — any codec defect flips hash bits.

DHASH_COLS = 9  # sampled columns -> 8 comparisons per row
DHASH_ROWS = 8


def dhash_bits(pixels: np.ndarray) -> tuple[int, int]:
    """(hi, lo) 32-bit halves of the 64-bit dHash; bit k = j*8+i set
    when luma[gx(i+1), gy(j)] > luma[gx(i), gy(j)]."""
    h, w, _ = pixels.shape
    px = pixels.astype(np.int64)
    luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    gx = [(i * w) // DHASH_COLS for i in range(DHASH_COLS)]
    gy = [(j * h) // DHASH_ROWS for j in range(DHASH_ROWS)]
    hi = lo = 0
    for j in range(DHASH_ROWS):
        for i in range(DHASH_COLS - 1):
            if luma[gy[j], gx[i + 1]] > luma[gy[j], gx[i]]:
                k = j * 8 + i
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return hi, lo


DHASH_SCHEMA = "doc_id bigint, width int, height int, hash_hi bigint, hash_lo bigint"


def dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: synthesize a valid BMP per doc_id, REALLY
    decode it (header/stride/row-order), then dHash the decoded
    pixels. Per-image work bounded (<= 16x16 px grid reads)."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            data = encode_bmp(synth_pixels(int(doc_id)))
            w, h, _, pixels = decode_bmp(data)
            hi, lo = dhash_bits(pixels)
            out.append((int(doc_id), w, h, hi, lo))
        yield pd.DataFrame(
            out, columns=["doc_id", "width", "height", "hash_hi", "hash_lo"]
        )


# --- audio energy fingerprint -------------------------------------------------

# The WAV analogue of dHash: mono-mix the DECODED PCM (unsigned sum
# across channels), split into 16 equal frames ((i*16)//n indexing),
# per-frame energy = sum of squared mono values, one bit per
# consecutive-frame energy comparison → a 15-bit fingerprint. Integer
# arithmetic end to end so the oracle re-derives every bit from the
# synth_samples formulas.

AFP_FRAMES = 16


def audio_fingerprint(samples: np.ndarray) -> int:
    """15-bit energy-profile fingerprint of an (n, ch) int16 clip."""
    n = samples.shape[0]
    mono = (samples.astype(np.int64) + 32768).sum(axis=1)
    frame = (np.arange(n) * AFP_FRAMES) // n
    energy = np.bincount(frame, weights=(mono * mono).astype(np.float64), minlength=AFP_FRAMES)
    energy = energy.astype(np.int64)  # exact: values < 2^53
    fp = 0
    for k in range(AFP_FRAMES - 1):
        if energy[k + 1] > energy[k]:
            fp |= 1 << k
    return fp


AFP_SCHEMA = "doc_id bigint, n_samples int, channels int, fingerprint int"


def audio_fingerprint_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: synthesize a valid WAV per doc_id, REALLY
    chunk-walk it back, then fingerprint the decoded PCM."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            samples, rate = synth_samples(int(doc_id))
            _, ch, n, dec = decode_wav(encode_wav(samples, rate))
            out.append((int(doc_id), n, ch, audio_fingerprint(dec)))
        yield pd.DataFrame(out, columns=["doc_id", "n_samples", "channels", "fingerprint"])


# --- shot-boundary detection ----------------------------------------------------

# The video analogue of the dHash/fingerprint gates: SAD (sum of
# absolute per-pixel differences) between CONSECUTIVE DECODED frames,
# a cut declared where mean |Δ| per pixel exceeds the threshold.
# synth_video pixels advance by +17 (mod 251) per frame, so each
# pixel's true diff is 17 except at the mod wraparound where it is
# 234 — integer arithmetic end to end, so the oracle re-derives every
# SAD from the generator formulas and any frame-walk defect (stride,
# off-by-one frame, plane order) changes the verdict.

SHOT_SAD_THRESHOLD = 20  # mean |Δluma| per pixel that declares a cut

SHOT_SCHEMA = "doc_id bigint, n_frames int, n_boundaries bigint, first_boundary int"


def shot_boundary_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: synthesize a valid MV01 clip per doc_id,
    REALLY parse it back, then SAD-compare every consecutive decoded
    frame pair. Frames never leave the UDF — one verdict row per doc."""
    for pdf in batches:
        doc_ids, nf, nb, fb = [], [], [], []
        for doc_id in pdf["doc_id"]:
            frames, _n, _w, _h = synth_video(int(doc_id))
            n, w, h, decoded = decode_video(encode_video(frames))
            d = np.abs(decoded[1:].astype(np.int64) - decoded[:-1].astype(np.int64))
            sad = d.reshape(n - 1, -1).sum(axis=1)
            cut = sad > SHOT_SAD_THRESHOLD * w * h
            idx = np.nonzero(cut)[0]
            doc_ids.append(int(doc_id))
            nf.append(n)
            nb.append(int(cut.sum()))
            fb.append(int(idx[0]) + 1 if idx.size else None)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_frames": pd.Series(nf, dtype="int32"),
                "n_boundaries": pd.Series(nb, dtype="int64"),
                "first_boundary": pd.Series(fb, dtype="Int32"),
            }
        )
