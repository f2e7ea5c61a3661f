"""Cross-ROUND bench ratchet (VERDICT r8 next #2).

The r8 pin re-seed (commit c25832c) made tools/bench_baseline.json a
WITHIN-round regression gate: pins carry the current session's warm
medians, so a slow plan that lands and is then re-pinned next round
would never be flagged again. This tool restores the long-horizon
check the old minimum-ever pins provided — without their rotating
false-flag mechanism — by comparing per-query warm medians ACROSS
rounds after dividing out suite drift:

    ratio(q)  = median_r(n)(q) / median_r(n-1)(q)
    drift     = median over all common q of ratio(q)   (environment)
    flag q if ratio(q) / drift > 1.5  AND  the absolute drift-adjusted
    slowdown exceeds 0.2 s (sub-second jitter on local[32] otherwise
    churns the flag set — same floor philosophy as bench.flag_regressions)

History lives in ``tools/bench_rounds.json``: {"r8": {query: sec}}.
Protocol (documented, manual-once-per-round by design — bench.py runs
many times per round while iterating, and only the committed
round-final detail should enter history):

  at the START of round n, snapshot the committed round-(n-1) detail:
      python tools/cross_round_check.py --snapshot-prev
  (reads BENCH_DETAIL.json — the previous round's committed final run —
  and appends it under the highest BENCH_r*.json round number.)

bench.py then calls :func:`cross_round_regressions` on every run and
records the result in BENCH_DETAIL.json and the final stdout line, so
the driver's BENCH_r{n} artifact carries a machine-checked
``cross_round_regressions`` field.

Ad-hoc comparison of two detail files:
    python tools/cross_round_check.py old_detail.json new_detail.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY_PATH = os.path.join(REPO, "tools", "bench_rounds.json")
ALERT_RATIO = 1.5
ABS_FLOOR_SEC = 0.2


def cross_round_regressions(
    cur: dict[str, float],
    prev: dict[str, float],
    alert: float = ALERT_RATIO,
    floor: float = ABS_FLOOR_SEC,
) -> tuple[dict[str, dict], float]:
    """Pure (injection-testable, like bench.flag_regressions): returns
    (flags, cross-round drift). A query flags when its round-over-round
    ratio exceeds ``alert`` AFTER dividing out the suite-median ratio,
    and the drift-adjusted slowdown exceeds ``floor`` seconds."""
    ratios = {
        q: cur[q] / prev[q] for q in cur if q in prev and prev[q] > 0
    }
    if not ratios:
        return {}, 1.0
    drift = statistics.median(ratios.values())
    norm = max(drift, 1.0)  # a faster box never excuses absolute slowness
    flags: dict[str, dict] = {}
    for q, r in ratios.items():
        adj = cur[q] / norm
        if r / norm > alert and adj - prev[q] > floor:
            flags[q] = {
                "sec": cur[q],
                "prev_sec": prev[q],
                "ratio": round(r, 3),
                "drift_adj_ratio": round(r / norm, 3),
            }
    return flags, round(drift, 4)


def load_history() -> dict[str, dict[str, float]]:
    try:
        with open(HISTORY_PATH) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}


def latest_round(history: dict[str, dict[str, float]]) -> str | None:
    rounds = sorted(history, key=lambda k: int(k.lstrip("r")))
    return rounds[-1] if rounds else None


def prev_round_medians() -> tuple[str | None, dict[str, float]]:
    """The (round_label, medians) pair bench.py compares against."""
    history = load_history()
    label = latest_round(history)
    return label, history.get(label, {}) if label else {}


def _driver_round() -> int:
    """Highest BENCH_r*.json round number in the repo root — the last
    COMPLETED round (the driver writes its artifact at round end)."""
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(ns) if ns else 0


def snapshot_prev() -> None:
    """Append the committed BENCH_DETAIL.json (the previous round's
    final run) to history under that round's number. Idempotent: an
    existing entry for that round is left untouched."""
    n = _driver_round()
    if n == 0:
        print("no BENCH_r*.json artifacts; nothing to snapshot")
        return
    label = f"r{n}"
    history = load_history()
    if label in history:
        print(f"{label} already in history ({len(history[label])} queries); not overwritten")
        return
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    history[label] = detail["warm_median_sec"]
    with open(HISTORY_PATH, "w") as fh:
        json.dump(history, fh, indent=1, sort_keys=True)
    print(f"snapshotted {label}: {len(history[label])} queries -> {HISTORY_PATH}")


def main() -> None:
    if "--snapshot-prev" in sys.argv:
        snapshot_prev()
        return
    if len(sys.argv) == 3:
        with open(sys.argv[1]) as fh:
            prev = json.load(fh)["warm_median_sec"]
        with open(sys.argv[2]) as fh:
            cur = json.load(fh)["warm_median_sec"]
        label = sys.argv[1]
    else:
        label, prev = prev_round_medians()
        if not prev:
            print("no history; run --snapshot-prev first")
            return
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            cur = json.load(fh)["warm_median_sec"]
    flags, drift = cross_round_regressions(cur, prev)
    print(
        json.dumps(
            {
                "vs_round": label,
                "cross_round_drift": drift,
                "n_compared": len([q for q in cur if q in prev]),
                "cross_round_regressions": flags,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
