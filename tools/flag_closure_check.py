"""Bench flag-closure gate (VERDICT r9 next #3).

Round 9 shipped with 5 sf0.1 + 6 sf1 + 1 cross-round flags open: the
driver's FINAL bench ran after the builder's last triage commit, so the
committed BENCH_DETAIL.json carried flags nobody had probed. This tool
makes that state loud instead of silent:

- every flag in the three BENCH_DETAIL flag sections
  (``regressions_vs_baseline``, ``sf1_regressions_vs_baseline``,
  ``cross_round_regressions``) must have a provenance string in
  ``tools/bench_provenance.json`` (probe evidence per the solo-probe
  protocol in the verify recipe — isolated probe, scan-bound control,
  worktree-at-pin-commit comparison when it reproduces);
- the check runs against the *committed* detail (``git show
  HEAD:BENCH_DETAIL.json``): fresh flags from a run that has not been
  committed yet are mid-iteration state, not a shipped artifact, so
  they do not fail the gate here — but bench.py also evaluates its own
  fresh output and reports ``untriaged_flags`` + a nonzero exit so a
  final bench with new, unprobed flags is visible in the artifact
  itself.

Usage:
    python tools/flag_closure_check.py            # check committed detail
    python tools/flag_closure_check.py --worktree # check working-tree file
Exit 0 = every committed flag carries provenance; exit 1 otherwise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROVENANCE_PATH = os.path.join(REPO, "tools", "bench_provenance.json")

# BENCH_DETAIL flag section -> provenance-file section
SECTIONS = {
    "regressions_vs_baseline": "warm",
    "sf1_regressions_vs_baseline": "sf1",
    "cross_round_regressions": "cross_round",
    "loader_regression": "loader",
}

# Provenance entries are keyed by query PLUS the baseline the flag was
# raised against (ADVICE r10): a name-only key let a stale entry from a
# previous round silently "close" a NEW, unrelated regression of the
# same query — bench.py copied the old string into the fresh flag and
# exited 0. Each entry is {"note": str, <key_field>: float}; it covers
# a flag only when the recorded value equals the flag's own.
KEY_FIELD = {
    "warm": "baseline_sec",
    "sf1": "baseline_sec",
    "cross_round": "prev_sec",
    "loader": "baseline_rows_per_sec",
}


def load_provenance() -> dict[str, dict[str, dict]]:
    try:
        with open(PROVENANCE_PATH) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def covering_note(provenance: dict, prov_key: str, q: str, flag_entry: dict) -> str | None:
    """The provenance note covering this flag, or None. Requires an
    object entry whose key field matches the flag's value — legacy
    string entries never cover (they carry no regime key)."""
    entry = (provenance.get(prov_key) or {}).get(q)
    if not isinstance(entry, dict):
        return None
    field = KEY_FIELD[prov_key]
    want = flag_entry.get(field) if isinstance(flag_entry, dict) else None
    have = entry.get(field)
    if want is None or have is None:
        return None
    try:
        if abs(float(want) - float(have)) > 1e-9:
            return None
    except (TypeError, ValueError):
        return None
    return entry.get("note")


def untriaged_flags(detail: dict, provenance: dict | None = None) -> list[str]:
    """Pure: flags present in ``detail`` without a matching provenance
    entry. Returns ``["<section>:<query>"]`` labels, empty when closed."""
    prov = load_provenance() if provenance is None else provenance
    missing: list[str] = []
    for det_key, prov_key in SECTIONS.items():
        flags = detail.get(det_key) or {}
        for q in sorted(flags):
            if covering_note(prov, prov_key, q, flags[q]) is None:
                missing.append(f"{prov_key}:{q}")
    return missing


def committed_detail() -> dict | None:
    """The BENCH_DETAIL.json content at HEAD, or None when it is not
    committed (fresh repo / file only in the working tree)."""
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
    except OSError:
        return None
    if out.returncode != 0:
        return None
    try:
        return json.loads(out.stdout)
    except json.JSONDecodeError:
        return None


def main() -> None:
    if "--worktree" in sys.argv:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)
        label = "working-tree"
    else:
        detail = committed_detail()
        label = "committed (HEAD)"
        if detail is None:
            print("flag_closure_check: no committed BENCH_DETAIL.json — nothing to gate")
            return
    missing = untriaged_flags(detail)
    if missing:
        print(
            f"flag_closure_check: {label} BENCH_DETAIL.json carries "
            f"{len(missing)} UNTRIAGED flag(s) — run the solo-probe protocol "
            f"(isolated tools/probe.py run + scan-bound control; worktree at "
            f"the pin commit when it reproduces) and record provenance in "
            f"tools/bench_provenance.json:"
        )
        for m in missing:
            print(f"  {m}")
        sys.exit(1)
    n = sum(len(detail.get(k) or {}) for k in SECTIONS)
    print(f"flag_closure_check: {label} detail OK — {n} flag(s), all with provenance")


if __name__ == "__main__":
    main()
