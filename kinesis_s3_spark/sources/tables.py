"""Parquet table loaders for the driver-generated testdata layout.

One parquet file per table under ``<sf_dir>/<name>.parquet`` (see
TESTDATA.md). Loading stays fully declarative — ``spark.read.parquet``
— so Catalyst gets column pruning + predicate pushdown for free at any
scale; at 100 TB each "file" is a directory of many splittable parquet
parts and nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast in any realistic deployment
# (region/nation are bounded by geography; at TPC-H-like scaling,
# supplier/part/customer grow with SF and must NOT be assumed tiny).
BROADCAST_SAFE = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark
        # rejects by default; read nanos as long and floor to micros
        # (driver data is µs-aligned, so this is lossless — matches what
        # DuckDB exposes as TIMESTAMP).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # build a TIMESTAMP_NTZ (not timestamp_micros → LTZ): NTZ
            # arithmetic is session-timezone-free, matching how DuckDB
            # and the other parquet tables treat these naive timestamps
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register each as a temp view so the same
    queries run through either the DataFrame API or spark.sql."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
