"""Streaming materialized-view maintenance on the loader path — the
streaming twin of operators/etl.py:etl_incremental_agg_merge.

The batch query proves the algebra (state ⊕ delta == recompute); this
module runs it continuously: a parquet-backed aggregate state that each
micro-batch folds into with one O(|delta| + |state|) merge, so "what is
in my archive, per key" is always one read away instead of an
O(|history|) scan. Unlike the driver-held sketch accumulators
(streaming/cms.py, streaming/histogram.py — bounded cells), the state
here is a real table with unbounded key cardinality, so it lives in
parquet and is merged BY SPARK, never collected.

Durability protocol (same replay-safety contract as the sketch
accumulators, scaled up):

- state versions are immutable directories ``state_v<N>``; a pointer
  file ``mv_meta.json`` (atomic tmp+``os.replace``) names the current
  version and the last applied batch id;
- ``update(batch_df, batch_id)`` skips batch ids at or below the last
  applied one, so restart re-delivery never double-counts;
- a crash between writing ``state_v<N+1>`` and swinging the pointer
  leaves the pointer on v<N>: the next update simply rebuilds v<N+1>
  from v<N> + the redelivered batch. Old versions are pruned after the
  pointer moves.

At 100 TB the same code holds: the merge is a key-partitioned
aggregate (shuffle on the view key only), the state write is one
parquet dir per version (partition it by a key prefix when the view
itself is huge), and nothing is driver-sized.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

META_FILE = "mv_meta.json"


class ParquetMaterializedView:
    """Incrementally-maintained (key → n_records, total_bytes) view.

    ``key_col``: expression deriving the view key from the loader's
    ``value`` column (default: the whole-archive single bucket). Plugs
    into ``run_loader(accumulators=(mv,))``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_col: Column | None = None,
        key_name: str = "view_key",
    ) -> None:
        os.makedirs(state_dir, exist_ok=True)
        self.spark = spark
        self.dir = state_dir
        self.key_col = key_col if key_col is not None else F.lit("all")
        self.key_name = key_name
        self._meta_path = os.path.join(state_dir, META_FILE)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as fh:
                meta = json.load(fh)
            self.version = int(meta["version"])
            self.last_batch_id = int(meta["last_batch_id"])
        else:
            self.version = 0
            self.last_batch_id = -1

    # -- state io ------------------------------------------------------------

    def _state_path(self, version: int) -> str:
        return os.path.join(self.dir, f"state_v{version}")

    def read(self) -> DataFrame:
        """The current view (empty frame with the right schema before
        the first applied batch)."""
        if self.version == 0:
            return self.spark.createDataFrame(
                [], f"{self.key_name} string, n_records bigint, total_bytes bigint"
            )
        return self.spark.read.parquet(self._state_path(self.version))

    def _delta(self, batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                self.key_col.cast("string").alias(self.key_name),
                F.octet_length(F.col("value").cast("string")).alias("nb"),
            )
            .groupBy(self.key_name)
            .agg(
                F.count("*").cast("long").alias("n_records"),
                F.sum("nb").cast("long").alias("total_bytes"),
            )
        )

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch into the view. Mergeable-aggregate
        algebra only (counts and sums add), one shuffle on the key."""
        if batch_id <= self.last_batch_id:
            return
        merged = (
            self.read()
            .unionByName(self._delta(batch_df))
            .groupBy(self.key_name)
            .agg(
                F.sum("n_records").cast("long").alias("n_records"),
                F.sum("total_bytes").cast("long").alias("total_bytes"),
            )
        )
        next_version = self.version + 1
        merged.write.mode("overwrite").parquet(self._state_path(next_version))
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": next_version, "last_batch_id": batch_id}, fh)
        os.replace(tmp, self._meta_path)
        prev, self.version, self.last_batch_id = self.version, next_version, batch_id
        if prev > 0:  # pointer has moved; prior version is garbage
            shutil.rmtree(self._state_path(prev), ignore_errors=True)
