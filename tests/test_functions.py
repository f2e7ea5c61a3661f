"""Scalar-core unit tests, porting the reference's pure-function specs
1:1 (SURVEY §5): DynamicPathSpec, CommonSpec (partitioning + tstamp),
KinesisS3EmitterSpec (filenames)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kinesis_s3_spark.functions.paths import base_filename, decorate_directory_with_time
from kinesis_s3_spark.functions.schema_key import row_type_col
from kinesis_s3_spark.functions.timestamps import collector_tstamp_col

# Instant.ofEpochMilli(100000L) — the DynamicPathSpec fixture time
T = datetime.fromtimestamp(100, tz=timezone.utc)


class TestDynamicPath:
    """DynamicPathSpec.scala:20-53, case for case."""

    def test_one_time_pattern(self):
        assert decorate_directory_with_time("something/{YYYY}/bar.gz", T) == "something/1970/bar.gz"

    def test_multiple_time_patterns(self):
        # {mm} is MINUTES in the Java pattern language (epoch+100 s → 01)
        assert (
            decorate_directory_with_time("something/{YYYY}/{mm}dy={dd}/bar.gz", T)
            == "something/1970/01dy=01/bar.gz"
        )

    def test_invalid_time_format_keeps_literal(self):
        # invalid pattern {foo} degrades to the literal text without braces
        assert (
            decorate_directory_with_time("something/{YYYY}/{mm}dy={dd}/{foo}/bar.gz", T)
            == "something/1970/01dy=01/foo/bar.gz"
        )

    def test_no_format(self):
        assert decorate_directory_with_time("bar.gz", T) == "bar.gz"

    def test_slash_normalization(self):
        assert decorate_directory_with_time("a//b///{YYYY}//c", T) == "a/b/1970/c"


class TestBaseFilename:
    """KinesisS3EmitterSpec.scala:28-66 naming scheme."""

    def test_full_name(self):
        t = datetime(2021, 3, 2, 12, 30, 45, tzinfo=timezone.utc)
        assert (
            base_filename(
                t,
                "firstSeq",
                "lastSeq",
                output_directory="outputDirectory",
                date_format="{YYYY}/{MM}/{dd}",
                filename_prefix="fileNamePrefix",
                partition="com.acme.example/jsonschema-1",
            )
            == "outputDirectory/2021/03/02/fileNamePrefix-com.acme.example/jsonschema-1-2021-03-02-123045-firstSeq-lastSeq"
        )

    def test_minimal_name(self):
        t = datetime(2021, 3, 2, 12, 30, 45, tzinfo=timezone.utc)
        assert base_filename(t, "a", "b") == "2021-03-02-123045-a-b"

    def test_prefix_no_partition(self):
        t = datetime(2021, 3, 2, 0, 0, 0, tzinfo=timezone.utc)
        assert base_filename(t, "1", "2", filename_prefix="pre") == "pre-2021-03-02-000000-1-2"


class TestRowType:
    """CommonSpec.scala:29-69 partition semantics: same-model schemas
    group together; non-SDJ / non-JSON degrade to unpartitioned;
    failed records become reading_error."""

    FIXTURE = [
        # (payload, expected row_type) — mirrors the CommonSpec mixed batch
        ('{"schema":"iglu:com.acme1/example1/jsonschema/2-0-1","data":{}}', "com.acme1.example1/jsonschema-2"),
        ('{"schema":"iglu:com.acme1/example1/jsonschema/2-0-0","data":{}}', "com.acme1.example1/jsonschema-2"),
        ('{"schema":"iglu:com.acme1/example2/jsonschema/2-0-1","data":{"nested":{"a":[1,2]}}}', "com.acme1.example2/jsonschema-2"),
        ('{"schema":"iglu:com.acme2/example1/jsonschema/1-0-0","data":null}', "com.acme2.example1/jsonschema-1"),
        ('{"data":{"no":"schema"}}', "unpartitioned"),
        ("not json at all", "unpartitioned"),
        ('{"schema":"not-an-iglu-uri","data":{}}', "unpartitioned"),
        # r12: the single-regex + split parse must keep every group
        # semantic of the former four-group extraction —
        # dashed/underscored names, dotted vendors, multi-digit models,
        # and the malformed-version rejections
        ('{"schema":"iglu:com.snplow.mini/my-name_x/jsonschema/12-3-45","data":{}}', "com.snplow.mini.my-name_x/jsonschema-12"),
        ('{"schema":"iglu:a/b/c/1-0-0","data":{}}', "a.b/c-1"),
        ('{"schema":"iglu:com.acme/ex/jsonschema/1-0","data":{}}', "unpartitioned"),
        ('{"schema":"iglu:com.acme/ex/jsonschema/x-0-0","data":{}}', "unpartitioned"),
        ('{"schema":"iglu:com.acme/ex/jsonschema/1-0-0/extra","data":{}}', "unpartitioned"),
    ]

    def test_partition_by_type(self, spark):
        df = spark.createDataFrame([(v,) for v, _ in self.FIXTURE], "value string")
        got = df.select(row_type_col(F.col("value")).alias("rt")).collect()
        assert [r["rt"] for r in got] == [exp for _, exp in self.FIXTURE]

    def test_reading_error_branch(self, spark):
        df = spark.createDataFrame([("x", True), ("y", False)], "value string, failed boolean")
        got = df.select(row_type_col(F.col("value"), F.col("failed")).alias("rt")).collect()
        assert got[0]["rt"] == "reading_error"
        assert got[1]["rt"] == "unpartitioned"


class TestCollectorTstamp:
    """CommonSpec.scala:71-77 / Common.scala:88-96: TSV field index 3,
    space-separated UTC timestamp; unparseable → NULL (the Left)."""

    def test_parse_ok(self, spark):
        line = "app\tpc\t0\t2021-10-04 12:00:01\tmore"
        df = spark.createDataFrame([(line,)], "value string")
        got = df.select(collector_tstamp_col(F.col("value")).alias("t")).collect()[0]["t"]
        assert got == datetime(2021, 10, 4, 12, 0, 1)

    def test_parse_failures(self, spark):
        rows = [("app\tpc\t0\tgarbage\tmore",), ("tooshort",)]
        df = spark.createDataFrame(rows, "value string")
        got = df.select(collector_tstamp_col(F.col("value")).alias("t")).collect()
        assert all(r["t"] is None for r in got)


class TestPiiMask:
    """text_pii_mask: injected spans must all be detected, and the
    masked text must carry no residual PII-shaped substrings."""

    def test_all_spans_detected_and_masked(self, spark):
        from kinesis_s3_spark.operators.text import text_pii_mask

        rows = text_pii_mask(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            assert r["n_emails"] >= 1
            assert r["n_phones"] >= 1
            assert r["n_ips"] >= 1

    def test_mask_is_idempotent(self, spark):
        # masking literal PII strings directly (unit-level, no table)
        from pyspark.sql import functions as F

        from kinesis_s3_spark.operators.text import _PII_EMAIL, _PII_IP, _PII_PHONE

        df = spark.createDataFrame(
            [("mail a.b+c@test-x.io call +44-201-555-0199 ip 10.0.255.7 end",)],
            "s string",
        )
        masked = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("s"), _PII_EMAIL, "<EMAIL>"),
                _PII_PHONE, "<PHONE>"),
            _PII_IP, "<IP>")
        got = df.select(masked.alias("m")).collect()[0]["m"]
        assert got == "mail <EMAIL> call <PHONE> ip <IP> end"
        assert "@" not in got and "10.0" not in got


def test_lambda_suite_matches_numpy(spark):
    """Higher-order results cross-checked element-wise against numpy
    over the raw arrays (filter/exists/forall counts exactly; decimal
    folds within rounding)."""
    import numpy as np

    from kinesis_s3_spark.operators.scalar import fn_lambda_suite
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r for r in fn_lambda_suite(spark, sf).collect()}
    raw = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    assert len(got) == len(raw)
    for r in raw:
        e = np.array(r["embedding"], dtype=np.float64)
        g = got[r["vec_id"]]
        assert g["n_pos"] == int((e > 0).sum())
        assert g["any_big"] == bool((np.abs(e) > 2.0).any())
        assert g["all_small"] == bool((np.abs(e) <= 10.0).all())
        assert abs(g["ss"] - float(e @ e)) < 1e-5
        assert abs(g["top3_sum"] - float(np.sort(e)[::-1][:3].sum())) < 1e-5
        assert abs(g["rev_dot"] - float(e @ e[::-1])) < 1e-5


def test_try_suite_null_exactly_on_unsalvageable_rows(spark):
    """try_* returns NULL exactly where the input is unsalvageable —
    never an exception, never a NULL on a parseable row."""
    from kinesis_s3_spark.operators.scalar import fn_try_suite
    from kinesis_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["event_id"]: r for r in fn_try_suite(spark, sf).collect()}
    raw = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    assert len(got) == len(raw)
    for r in raw:
        g = got[r["event_id"]]
        # mixed_int parses exactly the even-id (numeric-string) rows
        if r["event_id"] % 2 == 0:
            assert g["mixed_int"] == r["event_id"]
        else:
            assert g["mixed_int"] is None
        # safe division nulls exactly the zero-denominator rows
        import math

        den = int(math.floor(r["value"])) % 3
        if den == 0:
            assert g["safe_div"] is None
        else:
            assert g["safe_div"] is not None
        # split index 2 hits iff 'i' splits the type into >= 2 parts
        parts = r["event_type"].split("i")
        assert (g["part2"] is not None) == (len(parts) >= 2)
        # JSON props never parse as INT; words never as DOUBLE
        assert g["props_int"] is None and g["type_dbl"] is None
