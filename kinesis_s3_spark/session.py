"""SparkSession factory with defaults tuned for both local testing and
large-cluster execution.

The reference has no session concept (one hard-wired JVM pipeline,
S3Loader.scala:35-69); here the session IS the engine runtime, and the
scale knobs that matter at 100 TB are set declaratively so Catalyst/AQE
can do the physical planning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale-out behavior, overridable per call:
# - AQE on: runtime shuffle-partition coalescing + skew-join splitting
#   replaces hand-tuned partition counts when data is skewed.
# - Arrow on: every pandas_udf / mapInPandas crosses the JVM<->Python
#   boundary in columnar batches instead of pickled rows.
# - shuffle.partitions: a *starting* number; AQE coalesces down. On a
#   real cluster this should be ~2-3x total cores; tests override to a
#   small value.
_SCALE_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # split-size FLOOR: maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, totalBytes/defaultParallelism)). The 4 MiB
    # default is an HDFS-era open-latency model; on NVMe/object storage
    # with vectorized parquet it forces a 10 MB table into 3 splits and
    # idles 29 of 32 cores (measured: q1's scan). 256 KiB keeps small
    # inputs parallel; at 100 TB files dwarf either floor, so the knob
    # only matters exactly where it helps.
    "spark.sql.files.openCostInBytes": str(256 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # InferFiltersFromGenerate adds `size(arr) > 0` below every
    # explode(arr). When arr is a COMPUTED array (n-gram shingles,
    # LSH buckets — this engine's bread and butter), CollapseProject
    # then inlines the whole construction into that filter, so every
    # row evaluates the array pipeline twice and the sub-expressions
    # (tokenize split) once PER LAMBDA REFERENCE: measured 14.5 s →
    # 0.5 s on the 5-gram explode at sf0.1 (28×; curation_decontaminate
    # 11.3 → 2.3 s). explode() already skips empty arrays, so the
    # inferred filter only ever helps when it reaches a scan/join
    # boundary over a STORED array column — none of our tables store
    # arrays except embeddings, which is never size-filtered.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "kinesis-s3-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_SCALE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
