"""Property-based tests (hypothesis) for the pure scalar core — the
reference's spec tests cover fixed fixtures (SURVEY §5); properties
cover the input space."""

from __future__ import annotations

import re
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_s3_spark.functions.paths import base_filename, decorate_directory_with_time

TS = st.datetimes(
    min_value=datetime(1970, 1, 1), max_value=datetime(2100, 1, 1)
).map(lambda d: d.replace(tzinfo=timezone.utc))


@settings(max_examples=200, deadline=None)
@given(t=TS)
def test_decorate_known_tokens_roundtrip(t):
    # {yyyy} is calendar year; {YYYY} is week-based year (Java 'Y'
    # semantics) — tested separately below
    out = decorate_directory_with_time("a/{yyyy}/{MM}/{dd}/{HH}/{mm}/{ss}/z", t)
    assert out == t.strftime("a/%Y/%m/%d/%H/%M/%S/z")


@settings(max_examples=200, deadline=None)
@given(t=TS)
def test_week_based_year_token(t):
    """{YYYY} follows ISO week-based year (diverges from calendar year
    around Dec 29 - Jan 3, matching Java DateTimeFormatter 'Y')."""
    out = decorate_directory_with_time("{YYYY}", t)
    assert out == str(t.isocalendar()[0])


@settings(max_examples=200, deadline=None)
@given(
    t=TS,
    literal=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=12
    ),
)
def test_decorate_never_leaves_braces(t, literal):
    """Any template fully resolves: no braces survive, unknown tokens
    degrade to their literal text (DynamicPath.scala:55-58 contract)."""
    out = decorate_directory_with_time("p/{" + literal + "}/s", t)
    assert "{" not in out and "}" not in out


@settings(max_examples=100, deadline=None)
@given(t=TS, first=st.integers(0, 10**9), last=st.integers(0, 10**9))
def test_base_filename_shape(t, first, last):
    """Name always ends yyyy-MM-dd-HHmmss-first-last and never doubles
    slashes (KinesisS3Emitter.scala:226-244 contract)."""
    out = base_filename(t, str(first), str(last), output_directory="out//dir")
    assert re.search(rf"\d{{4}}-\d{{2}}-\d{{2}}-\d{{6}}-{first}-{last}$", out)
    assert "//" not in out


# --- codec round-trip properties ---------------------------------------------

import numpy as np


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    """decode(encode(px)) == px for ANY dims (every stride remainder)
    and pixel content."""
    from kinesis_s3_spark.multimodal.codecs import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dw, dh, dc, out = decode_bmp(encode_bmp(px))
    assert (dw, dh, dc) == (w, h, 3)
    assert np.array_equal(out, px)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=300),
    ch=st.integers(min_value=1, max_value=2),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    from kinesis_s3_spark.multimodal.codecs import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    drate, dch, dn, out = decode_wav(encode_wav(s, rate))
    assert (drate, dch, dn) == (rate, ch, n)
    assert np.array_equal(out, s)


def test_incremental_merge_equals_recompute_any_cutoff(spark):
    """The MV merge invariant at a DIFFERENT cutoff than the gated
    query's: state(<c) ⊕ delta(≥c) == full recompute for any c."""
    from pyspark.sql import functions as F

    from kinesis_s3_spark.operators import etl
    from kinesis_s3_spark.sources.tables import load_table

    orig = etl._MV_CUTOFF
    try:
        etl._MV_CUTOFF = "2024-01-07 12:00:00"
        merged = {
            (r["event_type"], r["day"]): (r["n_events"], round(r["sum_value"], 6))
            for r in etl.etl_incremental_agg_merge(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
    finally:
        etl._MV_CUTOFF = orig
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    full = {
        (r["event_type"], r["day"]): (r["n"], round(r["s"], 6))
        for r in e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("double").cast("decimal(38,12)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert merged == full
