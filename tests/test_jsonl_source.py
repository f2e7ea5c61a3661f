"""JSONL corpus source: schema'd read, corrupt-line capture, bad-row
envelope parity, and batch/streaming symmetry."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from kinesis_s3_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
    split_good_bad,
)

GOOD_LINES = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "book", "n_chars": 5},
]
BAD_LINES = ['{"doc_id": broken', "not json at all"]


def _write_corpus(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    lines = [json.dumps(g) for g in GOOD_LINES] + BAD_LINES
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_and_split(spark, tmp_path):
    df = read_jsonl(spark, _write_corpus(tmp_path))
    good, bad = split_good_bad(df)
    grows = {r["doc_id"]: r.asDict() for r in good.collect()}
    assert set(grows) == {1, 2}
    assert grows[1]["text"] == "alpha beta"
    assert CORRUPT_COL not in good.columns
    assert good.schema.fieldNames() == DOCUMENTS_JSONL_SCHEMA.fieldNames()

    brows = bad.collect()
    assert len(brows) == len(BAD_LINES)
    env = json.loads(brows[0]["bad_row"])
    assert env["schema"].startswith("iglu:com.snowplowanalytics")
    assert env["data"]["failure"]["errors"] == ["jsonl: malformed line"]
    import base64

    payloads = {
        base64.b64decode(json.loads(r["bad_row"])["data"]["payload"]).decode()
        for r in brows
    }
    assert payloads == set(BAD_LINES)


def test_streaming_read_matches_batch(spark, tmp_path):
    """The streaming variant must produce the same rows through the
    same good/bad split (file-watch tail of a corpus directory)."""
    path = _write_corpus(tmp_path)
    stream = read_jsonl(spark, path, streaming=True)
    assert stream.isStreaming
    good, bad = split_good_bad(stream)
    q = (
        good.withColumn("is_good", F.lit(True))
        .writeStream.format("memory")
        .queryName("jsonl_good")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT doc_id FROM jsonl_good").collect()
    assert {r["doc_id"] for r in rows} == {1, 2}


def test_csv_corpus_read_and_split(spark, tmp_path):
    from kinesis_s3_spark.sources.jsonl import read_csv_corpus

    p = tmp_path / "csv_corpus"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "1,alpha beta,en,web,10\n"
        "2,gamma,de,book,5\n"
        "3,bad row with,too few\n"  # arity mismatch -> corrupt
    )
    df = read_csv_corpus(spark, str(p))
    # CSV corrupt capture requires caching the parsed frame before a
    # corrupt-only projection (Spark QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = df.cache()
    good, bad = split_good_bad(df)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    brows = bad.collect()
    assert len(brows) == 1
    env = json.loads(brows[0]["bad_row"])
    import base64

    assert base64.b64decode(env["data"]["payload"]).decode().startswith("3,bad row")
