"""Interleaved single-session A/B: old (worktree-pinned) vs new (tree)
implementations of operator functions, ABAB warm rounds in ONE
SparkSession so host-window drift hits both arms equally — the
measurement protocol for boxes whose scan-bound control swings >2x
between adjacent probe sessions (session-4 finding: q1 sf1 read 2.47 s
and 8.34 s minutes apart with no local process to blame).

Usage:
  python tools/ab_interleaved.py SF_DIR name1,name2 [rounds] [old_events_path]
Compares functions by name from kinesis_s3_spark.operators.events
against the same file at old_events_path (default the session worktree).
"""
import importlib.util
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from kinesis_s3_spark.session import get_spark  # noqa: E402

SF = sys.argv[1]
NAMES = sys.argv[2].split(",")
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
OLD_PATH = sys.argv[4] if len(sys.argv) > 4 else "/tmp/wt_s4_before/kinesis_s3_spark/operators/events.py"

from kinesis_s3_spark.operators import events as new_mod  # noqa: E402

import kinesis_s3_spark.operators.registry as reg  # noqa: E402

_orig_query = reg.query
reg.query = lambda name, oracle=None: (lambda fn: fn)  # allow re-registration
try:
    spec = importlib.util.spec_from_file_location("events_old", OLD_PATH)
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)
finally:
    reg.query = _orig_query

spark = get_spark("ab")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402  (ships the package zip)
entrymod._ship_package(spark)

def timed(fn):
    t0 = time.time()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

for name in NAMES:
    old_fn = getattr(old_mod, name)
    new_fn = getattr(new_mod, name)
    # warmup both once
    timed(old_fn); timed(new_fn)
    olds, news = [], []
    for _ in range(ROUNDS):
        olds.append(timed(old_fn))
        news.append(timed(new_fn))
    print(
        f"{name}: old median {statistics.median(olds)} {olds} | "
        f"new median {statistics.median(news)} {news}",
        flush=True,
    )
