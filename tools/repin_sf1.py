"""Re-pin every headline query's sf1 baseline from a warm 3-run probe
(VERDICT r7 task #7): several pins were single observations, whose
noise produced ratchet flags with no regression behind them. One
session, per-query 1 warm + 3 measured runs over the 10× corpus —
the SAME protocol (and the same suite-neighbour pressure) the bench's
sf1 ratchet measures under, so limits are protocol-consistent instead
of quiet-box-optimistic.

Writes medians + spreads into tools/bench_baseline.json's sf1 map and
records the old pins under repin_r8_sf1_probes. SKIP_SF1 queries are
skipped here exactly as in the bench.

Run:  python tools/repin_sf1.py [--dry]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from kinesis_s3_spark.session import get_spark

BASELINE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def main() -> None:
    dry = "--dry" in sys.argv
    spark = get_spark("repin-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not bench.ensure_scale10(spark):
        raise SystemExit("sf1 pass disabled (SPARK_GRAFT_BENCH_SF1=0)")
    q = entrymod.queries()
    probes: dict[str, dict] = {}
    for name in bench.HEADLINE:
        if name in bench.SKIP_SF1:
            continue
        fn = q[name]

        def one() -> float:
            t0 = time.time()
            fn(spark, bench.SF1_DIR).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        one()  # warm
        runs = [one() for _ in range(3)]
        probes[name] = {
            "median": round(statistics.median(runs), 3),
            "spread": round(max(runs) - min(runs), 3),
        }
        print(json.dumps({name: probes[name]}), flush=True)

    if dry:
        return
    with open(BASELINE) as fh:
        base = json.load(fh)
    old = base.get("sf1", {})
    base["repin_r8_sf1_probes"] = {
        "reason": (
            "every sf1 pin re-derived from a warm 3-run probe pass in ONE "
            "session (per-query 1 warm + 3 measured over /tmp/scale10) — "
            "protocol-consistent with the bench's in-suite sf1 ratchet, "
            "replacing the single-observation pins VERDICT r7 task #7 "
            "flagged; old medians kept here for provenance"
        ),
        "old_medians": {k: v.get("median") for k, v in sorted(old.items())},
    }
    base["sf1"] = {k: probes[k] for k in sorted(probes)}
    base["sf1_source"] = (
        "warm 3-run probe pass (tools/repin_sf1.py, r8): per-query median + "
        "spread measured in one session over /tmp/scale10 — the same warm "
        "single-session protocol the bench's sf1 ratchet runs under"
    )
    with open(BASELINE, "w") as fh:
        json.dump(base, fh, indent=1)
    print(f"re-pinned {len(probes)} sf1 baselines")


if __name__ == "__main__":
    main()
