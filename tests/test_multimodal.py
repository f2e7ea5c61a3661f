"""BMP codec unit tests: the dependency-free real decode path must
round-trip spec-compliant files, honor stride padding and both row
orders, and reject unsupported variants loudly."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_s3_spark.multimodal.codecs import (
    BMP_HEADER_BYTES,
    bmp_row_stride,
    decode_bmp,
    encode_bmp,
    pixel_checksum,
    synth_pixels,
)


def test_bmp_roundtrip_all_strides():
    """Widths 1..8 cover every stride-padding remainder (w*3 mod 4)."""
    rng = np.random.default_rng(7)
    for w in range(1, 9):
        for h in (1, 3, 5):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            data = encode_bmp(px)
            assert len(data) == BMP_HEADER_BYTES + bmp_row_stride(w) * h
            dw, dh, dc, out = decode_bmp(data)
            assert (dw, dh, dc) == (w, h, 3)
            assert np.array_equal(out, px), (w, h)


def test_bmp_known_bytes():
    """A 2x1 image against hand-computed bytes: pixel rows are BGR with
    the row padded to 8 bytes; header fields little-endian per spec."""
    px = np.array([[[255, 0, 0], [0, 128, 64]]], dtype=np.uint8)  # red, teal-ish
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 2)[0] == 54 + 8  # file size
    assert struct.unpack_from("<I", data, 10)[0] == 54  # pixel offset
    assert struct.unpack_from("<ii", data, 18) == (2, 1)  # w, h
    assert struct.unpack_from("<H", data, 28)[0] == 24  # bpp
    # BGR: red -> 00 00 FF, (0,128,64) -> 40 80 00, then 2 pad bytes
    assert data[54:62] == bytes([0, 0, 255, 64, 128, 0, 0, 0])


def test_bmp_top_down_negative_height():
    """Decoder must handle top-down files (negative height), which the
    encoder never emits — build one by hand from an encoded file."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse the stored row order
    stride = bmp_row_stride(3)
    struct.pack_into("<i", data, 22, -2)
    rows = bytes(data[54:])
    data[54:] = rows[stride:] + rows[:stride]
    dw, dh, _, out = decode_bmp(bytes(data))
    assert (dw, dh) == (3, 2)
    assert np.array_equal(out, px)


def test_bmp_rejects_unsupported():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG" + bytes(data[3:]))
    bad_bpp = bytearray(data)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(data)
    struct.pack_into("<I", bad_comp, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad_comp))


def test_wav_roundtrip_mono_and_stereo():
    from kinesis_s3_spark.multimodal.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    for ch in (1, 2):
        for n in (1, 17, 256):
            samples = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
            data = encode_wav(samples, 44100)
            assert len(data) == 44 + n * ch * 2
            rate, dch, dn, out = decode_wav(data)
            assert (rate, dch, dn) == (44100, ch, n)
            assert np.array_equal(out, samples)


def test_wav_chunk_walk_skips_extra_chunks():
    """Real WAVs often carry LIST/fact chunks before data — the parser
    must walk past them (with RIFF even-padding), not assume a 44-byte
    layout."""
    from kinesis_s3_spark.multimodal.codecs import decode_wav, encode_wav

    samples = np.array([[100], [-200], [300]], dtype=np.int16)
    data = encode_wav(samples, 8000)
    # splice an odd-sized junk chunk between fmt and data
    head, tail = data[:36], data[36:]
    junk = struct.pack("<4sI", b"LIST", 5) + b"junk!" + b"\x00"  # padded to even
    rate, ch, n, out = decode_wav(head + junk + tail)
    assert (rate, ch, n) == (8000, 1, 3)
    assert np.array_equal(out, samples)


def test_wav_rejects_unsupported():
    from kinesis_s3_spark.multimodal.codecs import decode_wav, encode_wav

    data = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"OggS" + bytes(data[4:]))
    bad_fmt = bytearray(data)
    struct.pack_into("<H", bad_fmt, 20, 3)  # IEEE float format
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_fmt))


def test_checksum_is_order_sensitive():
    """The oracle-verified checksum must change under the decode
    defects it exists to catch (row flip, channel swap, transpose)."""
    px = synth_pixels(12345)
    base = pixel_checksum(px)
    assert pixel_checksum(px[::-1]) != base  # row-order flip
    assert pixel_checksum(px[:, :, ::-1]) != base  # RGB<->BGR
    assert pixel_checksum(np.ascontiguousarray(px.transpose(1, 0, 2))) != base


# --- binary ingestion edge (sources/binary.py) -------------------------------


def test_binary_files_roundtrip_and_idempotent_fixture(spark, tmp_path, monkeypatch):
    """foreachPartition fixture write → binaryFile scan → stored-bytes
    decode recovers exactly what encode_bmp wrote; a second call reuses
    the marker-guarded fixture instead of rewriting."""
    import os

    from kinesis_s3_spark.multimodal import codecs
    from kinesis_s3_spark.sources import binary as binmod

    monkeypatch.setattr(
        binmod.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    sf_dir = "/root/testdata/sf0.001"
    path = binmod.write_image_fixture_files(spark, sf_dir)
    marker = os.path.join(path, binmod.FIXTURE_MARKER)
    mtime = os.path.getmtime(marker)
    assert binmod.write_image_fixture_files(spark, sf_dir) == path
    assert os.path.getmtime(marker) == mtime  # not rewritten

    files = binmod.with_doc_id_from_filename(
        binmod.read_binary_files(spark, path, glob="*.bmp")
    )
    row = files.filter("doc_id = 7").select("content").collect()[0]
    w, h, c, pixels = codecs.decode_bmp(bytes(row["content"]))
    expect = codecs.synth_pixels(7)
    assert (w, h, c) == (expect.shape[1], expect.shape[0], 3)
    assert (pixels == expect).all()


def test_le_uint32_header_reads(spark):
    """The JVM-side little-endian header read matches struct.unpack on
    real BMP bytes (width at offset 19, height at 23, 1-based)."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.multimodal.codecs import encode_bmp, synth_pixels
    from kinesis_s3_spark.sources.binary import le_uint32

    data = encode_bmp(synth_pixels(123))
    w_expect, h_expect = struct.unpack_from("<ii", data, 18)
    df = spark.createDataFrame([(bytearray(data),)], "content binary")
    got = df.select(
        le_uint32(F.col("content"), 19).alias("w"),
        le_uint32(F.col("content"), 23).alias("h"),
    ).collect()[0]
    assert (got["w"], got["h"]) == (w_expect, h_expect)


def test_stored_decode_catches_corruption(spark, tmp_path, monkeypatch):
    """Corrupting one stored file must fail the decode loudly — the
    exact defect class the storage-backed gate exists to catch."""
    import glob
    import os

    import pytest as _pytest

    from kinesis_s3_spark.multimodal.codecs import (
        REAL_DECODE_SCHEMA,
        decode_stored_image_batches,
    )
    from kinesis_s3_spark.sources import binary as binmod

    monkeypatch.setattr(binmod.tempfile, "gettempdir", lambda: str(tmp_path))
    path = binmod.write_image_fixture_files(spark, "/root/testdata/sf0.001")
    victim = sorted(glob.glob(os.path.join(path, "*.bmp")))[0]
    with open(victim, "r+b") as fh:
        fh.write(b"XX")  # clobber the 'BM' magic

    binary = binmod.with_doc_id_from_filename(
        binmod.read_binary_files(spark, path, glob="*.bmp")
    ).select("doc_id", "content")
    with _pytest.raises(Exception, match="BMP"):
        binary.mapInPandas(
            decode_stored_image_batches, schema=REAL_DECODE_SCHEMA
        ).collect()


def test_audio_parquet_fixture_roundtrip(spark, tmp_path, monkeypatch):
    """Binary parquet column: Spark-written WAV bytes read back and
    chunk-walked equal the synthesized source samples."""
    from kinesis_s3_spark.multimodal import codecs
    from kinesis_s3_spark.sources import binary as binmod

    monkeypatch.setattr(binmod.tempfile, "gettempdir", lambda: str(tmp_path))
    path = binmod.write_audio_fixture_parquet(spark, "/root/testdata/sf0.001")
    row = spark.read.parquet(path).filter("doc_id = 11").collect()[0]
    rate, ch, n, samples = codecs.decode_wav(bytes(row["content"]))
    want, want_rate = codecs.synth_samples(11)
    assert (rate, ch, n) == (want_rate, want.shape[1], want.shape[0])
    assert (samples == want).all()


def test_resize_nearest_index_map():
    """Thumbnail pixel (i, j) must be source pixel (i*h//8, j*w//8) —
    down- AND up-sampling cases, exact equality against direct
    indexing of the synthesized source."""
    import numpy as np

    from kinesis_s3_spark.multimodal.codecs import (
        RESIZE_DST,
        resize_nearest,
        synth_pixels,
    )

    for doc_id in (0, 3, 7, 15, 16, 123):  # dims from 1x1 up to 16x16
        src = synth_pixels(doc_id)
        h, w, _ = src.shape
        thumb = resize_nearest(src, RESIZE_DST, RESIZE_DST)
        assert thumb.shape == (RESIZE_DST, RESIZE_DST, 3)
        for i in range(RESIZE_DST):
            for j in range(RESIZE_DST):
                assert (thumb[i, j] == src[(i * h) // RESIZE_DST, (j * w) // RESIZE_DST]).all()


def test_resize_survives_reencode_roundtrip():
    """The re-encoded thumbnail must decode back to the same pixels
    (the operator checksums the ROUND-TRIPPED thumbnail)."""
    import numpy as np

    from kinesis_s3_spark.multimodal.codecs import (
        RESIZE_DST,
        decode_bmp,
        encode_bmp,
        resize_nearest,
        synth_pixels,
    )

    thumb = resize_nearest(synth_pixels(42), RESIZE_DST, RESIZE_DST)
    w, h, c, back = decode_bmp(encode_bmp(thumb))
    assert (w, h, c) == (RESIZE_DST, RESIZE_DST, 3)
    assert np.array_equal(back, thumb)


def test_video_codec_roundtrip_and_errors():
    """MV01 container: encode→decode round-trips frames exactly;
    corrupt magic and truncated payloads are rejected loudly."""
    import numpy as np
    import pytest

    from kinesis_s3_spark.multimodal.codecs import (
        decode_video,
        encode_video,
        synth_video,
    )

    frames, n, w, h = synth_video(123)
    data = encode_video(frames)
    dn, dw, dh, decoded = decode_video(data)
    assert (dn, dw, dh) == (n, w, h)
    assert np.array_equal(decoded, frames)
    with pytest.raises(ValueError, match="magic"):
        decode_video(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="length"):
        decode_video(data[:-1])


def test_video_sampling_stride(spark):
    """Sampled frame indices are exactly 0, 2, 4, ... per clip."""
    import __spark_entry__ as entrymod

    from tests.conftest import SF_SMOKE

    rows = entrymod.queries()["mm_video_frame_sample"](spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        idxs = sorted(r["frame_idx"] for r in rs)
        n = rs[0]["n_frames"]
        assert idxs == list(range(0, n, 2)), (doc_id, idxs, n)


def test_dhash_perceptual_properties():
    """dHash is invariant under uniform brightness shift (neighbor
    comparisons unchanged) and sensitive to horizontal flips; the
    encode→decode round trip is hash-transparent."""
    import numpy as np

    from kinesis_s3_spark.multimodal.codecs import (
        decode_bmp,
        dhash_bits,
        encode_bmp,
        synth_pixels,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 200, size=(12, 14, 3)).astype(np.uint8)
    base = dhash_bits(px)
    assert base == dhash_bits(np.clip(px.astype(np.int16) + 30, 0, 255).astype(np.uint8))
    flipped = px[:, ::-1, :]
    assert base != dhash_bits(flipped)
    # codec transparency: hashing decoded bytes == hashing the source
    for doc_id in (3, 57, 123):
        src = synth_pixels(doc_id)
        _, _, _, dec = decode_bmp(encode_bmp(src))
        assert dhash_bits(src) == dhash_bits(dec)


def test_audio_fingerprint_properties():
    """The energy-profile fingerprint depends only on per-frame
    energy (exactly invariant to reordering WITHIN a frame), is
    sensitive to time reversal, and the decode round trip is
    transparent."""
    import numpy as np

    from kinesis_s3_spark.multimodal.codecs import (
        audio_fingerprint,
        decode_wav,
        encode_wav,
        synth_samples,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-20000, 20000, size=(200, 2)).astype(np.int16)
    base = audio_fingerprint(s)
    # frames are (i*16)//200 — shuffle rows inside each frame: the
    # per-frame energy SUM is order-free, so the fingerprint is exact
    shuf = s.copy()
    frame = (np.arange(200) * 16) // 200
    for k in range(16):
        idx = np.where(frame == k)[0]
        shuf[idx] = shuf[rng.permutation(idx)]
    assert audio_fingerprint(shuf) == base
    assert audio_fingerprint(s[::-1].copy()) != base
    for doc_id in (5, 44, 200):
        samples, rate = synth_samples(doc_id)
        _, _, _, dec = decode_wav(encode_wav(samples, rate))
        assert audio_fingerprint(samples) == audio_fingerprint(dec)


def test_shot_boundary_matches_direct_numpy():
    """The closed-form wraparound count in the oracle and the decode
    path must both equal a direct per-pixel numpy SAD for a spread of
    doc_ids (covering every (n, w, h) residue combination)."""
    from kinesis_s3_spark.multimodal.codecs import (
        SHOT_SAD_THRESHOLD,
        decode_video,
        encode_video,
        shot_boundary_batches,
        synth_video,
    )
    import pandas as pd

    doc_ids = list(range(48))  # lcm(6, 8) covers all dims residues
    [out] = list(shot_boundary_batches(iter([pd.DataFrame({"doc_id": doc_ids})])))
    for row in out.itertuples(index=False):
        frames, _n, _w, _h = synth_video(int(row.doc_id))
        n, w, h, dec = decode_video(encode_video(frames))
        sad = (
            np.abs(dec[1:].astype(np.int64) - dec[:-1].astype(np.int64))
            .reshape(n - 1, -1)
            .sum(axis=1)
        )
        cut = sad > SHOT_SAD_THRESHOLD * w * h
        assert row.n_frames == n
        assert row.n_boundaries == int(cut.sum())
        idx = np.nonzero(cut)[0]
        if idx.size:
            assert row.first_boundary == int(idx[0]) + 1
        else:
            assert pd.isna(row.first_boundary)


def test_shot_boundary_detects_planted_cut():
    """A genuinely discontinuous clip (second half re-synthesized from
    a different doc) must flag exactly the splice point — the detector
    is judging content, not frame position."""
    from kinesis_s3_spark.multimodal.codecs import (
        SHOT_SAD_THRESHOLD,
        decode_video,
        encode_video,
        synth_video,
    )

    a, _, _, _ = synth_video(24)   # doc 24: smooth +17 clip, no wrap cuts
    b, _, _, _ = synth_video(104)  # same (w, h) residues: 104%8==24%8, (104*3)%8==(24*3)%8
    assert a.shape[1:] == b.shape[1:]
    # the doc-constant shift (104-24)*11 = 880 ≡ 127 (mod 251) makes
    # the splice-pair mean |Δ| ≈ 125 >> threshold, while every
    # within-half pair keeps the smooth +17 relation
    spliced = np.concatenate([a[:3], b[:3]], axis=0)
    n, w, h, dec = decode_video(encode_video(spliced))
    sad = (
        np.abs(dec[1:].astype(np.int64) - dec[:-1].astype(np.int64))
        .reshape(n - 1, -1)
        .sum(axis=1)
    )
    cut = sad > SHOT_SAD_THRESHOLD * w * h
    assert cut[2] and not cut[0] and not cut[1] and not cut[3] and not cut[4]
