"""Streaming record-size histogram on the loader path — the second
loader-maintained sketch after streaming/cms.py, and the streaming
twin of operators/sketches.py's histogram quantile estimator.

What it answers for an operator of the reference's job: "what is the
p50/p99 record size flowing through the loader?" — the number that
sizes the byte-limit buffer (O4) and predicts object roll cadence.
A full sort per micro-batch is absurd for that; a fixed-bin count
histogram is mergeable by addition, so the stream maintains it
incrementally with ≤ B rows collected per batch.

Fixed ABSOLUTE bins (64 × 64 B, overflow clamped into the top bin)
rather than the batch operator's observed-range bins: a stream cannot
two-pass for min/max, and fixed bins are what make slices mergeable
across batches and restarts. Same replay-safe persisted-state design
as CountMinAccumulator (atomic tmp+rename next to the checkpoint,
monotonic batch-id skip for re-deliveries).

Quantile read-off mirrors the batch operator: right edge of the bin
holding rank ceil(q·n) — one-sided error ≤ one bin width (64 B).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIST_BINS = 64
BIN_WIDTH = 64  # bytes per bin; range [0, 4096), overflow -> top bin

STATE_FILE = "size_histogram.json"


def size_bins(batch_df: DataFrame) -> DataFrame:
    """(value) frame → (bin, cnt) record-size histogram cells. The
    per-batch aggregation is distributed and map-side combined — at
    most HIST_BINS rows cross the shuffle regardless of batch size."""
    return (
        batch_df.select(
            F.least(
                # octet_length: this is a record-SIZE (bytes) histogram —
                # F.length counts characters and undercounts multi-byte
                # UTF-8 payloads (ADVICE r5)
                (F.octet_length(F.col("value").cast("string")) / BIN_WIDTH).cast("int"),
                F.lit(HIST_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


class SizeHistogramAccumulator:
    """Cross-batch record-size histogram with persisted, replay-safe
    state. ``update(batch_df, batch_id)`` is wired into run_loader's
    foreachBatch after emit; ``bins`` maps bin → count and equals the
    one-pass histogram over every applied batch's payloads."""

    def __init__(self, state_dir: str) -> None:
        os.makedirs(state_dir, exist_ok=True)
        self._path = os.path.join(state_dir, STATE_FILE)
        self.bins: dict[int, int] = {}
        self.last_batch_id = -1
        if os.path.exists(self._path):
            with open(self._path) as fh:
                data = json.load(fh)
            self.last_batch_id = data["last_batch_id"]
            self.bins = {int(b): int(c) for b, c in data["bins"]}

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch's record sizes into the histogram.
        Batches at or below the last applied id are replays — skipped,
        so restart re-delivery never double-counts."""
        if batch_id <= self.last_batch_id:
            return
        for row in size_bins(batch_df).collect():  # ≤ HIST_BINS rows
            b = int(row["bin"])
            self.bins[b] = self.bins.get(b, 0) + int(row["cnt"])
        self.last_batch_id = batch_id
        self._save()

    def _save(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "last_batch_id": self.last_batch_id,
                    "bins": [[b, c] for b, c in sorted(self.bins.items())],
                },
                fh,
            )
        os.replace(tmp, self._path)

    def psi_against(self, ref_bins: dict[int, int]) -> float:
        """Population Stability Index of THIS histogram against a
        reference histogram over the same fixed bins (e.g. yesterday's
        persisted accumulator) — the streaming form of
        events_drift_psi, possible precisely because the bins are
        fixed/absolute rather than observed-range. Laplace-smoothed
        over the union of occupied bins; > 0.2 is the conventional
        alert threshold for record-size mix shift (a producer change,
        a new payload schema)."""
        import math as _math

        bins = sorted(set(self.bins) | set(ref_bins))
        n_cur = sum(self.bins.values())
        n_ref = sum(ref_bins.values())
        if n_cur == 0 or n_ref == 0:
            return 0.0
        psi = 0.0
        k = len(bins)
        for b in bins:
            p_cur = (self.bins.get(b, 0) + 1) / (n_cur + k)
            p_ref = (ref_bins.get(b, 0) + 1) / (n_ref + k)
            psi += (p_cur - p_ref) * _math.log(p_cur / p_ref)
        return psi

    def quantile(self, q: float) -> int:
        """Estimated q-quantile of record size in bytes: right edge of
        the bin holding rank ceil(q·n). Guarantee (same as the batch
        operator): estimate ∈ [true, true + BIN_WIDTH] for in-range
        sizes."""
        n = sum(self.bins.values())
        if n == 0:
            return 0
        target = math.ceil(q * n)
        cum = 0
        for b in sorted(self.bins):
            cum += self.bins[b]
            if cum >= target:
                return (b + 1) * BIN_WIDTH
        return HIST_BINS * BIN_WIDTH
