"""The bench time-ratchet (VERDICT r5 task #3): injected slowdowns go
red; within-tolerance jitter does not."""

from __future__ import annotations

import bench


def test_injected_slowdown_is_flagged():
    baseline = {"q": {"median": 2.0, "spread": 0.1}}
    # tolerance = 2.0 + max(0.2, 0.5) = 2.5
    assert bench.flag_regressions({"q": 2.49}, baseline) == {}
    flagged = bench.flag_regressions({"q": 2.6}, baseline)
    assert flagged["q"]["limit_sec"] == 2.5 and flagged["q"]["sec"] == 2.6


def test_wide_spread_widens_tolerance():
    baseline = {"q": {"median": 1.0, "spread": 0.9}}
    # 2*spread (1.8) dominates 25% (0.25): limit 2.8
    assert bench.flag_regressions({"q": 2.7}, baseline) == {}
    assert "q" in bench.flag_regressions({"q": 2.9}, baseline)


def test_unknown_query_not_flagged():
    assert bench.flag_regressions({"new_query": 99.0}, {}) == {}


def test_shipped_baseline_covers_headline():
    """Every baseline entry corresponds to a current HEADLINE query
    (stale entries would silently never fire)."""
    base = bench.load_baseline()
    assert base, "tools/bench_baseline.json must exist and parse"
    assert set(base) <= set(bench.HEADLINE)


def test_uniform_drift_not_flagged_but_reported():
    """A uniformly slow box (shared-host VM variance) reports suite
    drift instead of flagging every query; an idiosyncratic regression
    on the same box still fires after normalization."""
    baseline = {f"q{i}": {"median": 1.0, "spread": 0.05} for i in range(20)}
    uniform = {f"q{i}": 1.4 for i in range(20)}
    drift = bench.suite_drift(uniform, baseline)
    assert abs(drift - 1.4) < 1e-9
    assert drift > bench.DRIFT_ALERT
    assert bench.flag_regressions(uniform, baseline, drift) == {}
    # same drifted box, one query truly regressed 3x
    one_bad = dict(uniform, q7=3.0)
    flagged = bench.flag_regressions(one_bad, baseline, bench.suite_drift(one_bad, baseline))
    assert set(flagged) == {"q7"}


def test_fast_box_never_loosens_limits():
    baseline = {f"q{i}": {"median": 1.0, "spread": 0.05} for i in range(10)}
    fast = {f"q{i}": 0.7 for i in range(10)}
    fast["q3"] = 1.5  # above the absolute limit of 1.25
    drift = bench.suite_drift(fast, baseline)
    assert drift < 1.0
    assert set(bench.flag_regressions(fast, baseline, drift)) == {"q3"}


def test_sf1_injected_slowdown_is_flagged():
    """The 10x ratchet (VERDICT r6 task #3): a single-run sf1 timing
    above baseline + max(35%, 1.0 s) flags; within-tolerance does not."""
    baseline = {"q": {"median": 10.0}}
    # limit = 10 + max(3.5, 1.0) = 13.5
    assert bench.flag_sf1_regressions({"q": 13.4}, baseline) == {}
    flagged = bench.flag_sf1_regressions({"q": 13.9}, baseline)
    assert flagged["q"]["limit_sec"] == 13.5 and flagged["q"]["sec"] == 13.9
    # sub-second queries get the 1.0 s absolute floor
    small = {"s": {"median": 0.4}}
    assert bench.flag_sf1_regressions({"s": 1.3}, small) == {}
    assert "s" in bench.flag_sf1_regressions({"s": 1.5}, small)


def test_sf1_uniform_drift_normalized():
    """A uniformly slow 10x pass (loaded box) is drift-normalized;
    an idiosyncratic scale regression still fires."""
    baseline = {f"q{i}": {"median": 10.0} for i in range(20)}
    uniform = {f"q{i}": 13.0 for i in range(20)}
    drift = bench.suite_drift(uniform, baseline)
    assert bench.flag_sf1_regressions(uniform, baseline, drift) == {}
    one_bad = dict(uniform, q7=40.0)
    flagged = bench.flag_sf1_regressions(
        one_bad, baseline, bench.suite_drift(one_bad, baseline)
    )
    assert set(flagged) == {"q7"}


def test_shipped_sf1_baseline_covers_headline():
    """The committed sf1 map only names current HEADLINE queries, and
    covers everything the 10x pass measures (minus documented skips)."""
    base = bench.load_baseline("sf1")
    assert base, "tools/bench_baseline.json must carry an sf1 map"
    assert set(base) <= set(bench.HEADLINE)
    measured = set(bench.HEADLINE) - set(bench.SKIP_SF1)
    # every measured query has a pin (new queries get pinned the round
    # after they first run at sf1; allow a small lag)
    assert len(measured - set(base)) <= 8, sorted(measured - set(base))


# --- cross-ROUND ratchet (VERDICT r8 next #2) ---

from tools.cross_round_check import cross_round_regressions


def test_cross_round_injected_regression_flagged():
    prev = {f"q{i}": 1.0 for i in range(20)}
    cur = dict(prev, q7=1.8)  # 1.8x, +0.8 s
    flags, drift = cross_round_regressions(cur, prev)
    assert set(flags) == {"q7"} and abs(drift - 1.0) < 1e-9
    assert flags["q7"]["ratio"] == 1.8


def test_cross_round_uniform_drift_not_flagged():
    prev = {f"q{i}": 1.0 for i in range(20)}
    cur = {f"q{i}": 1.7 for i in range(20)}  # slow box, not a plan change
    flags, drift = cross_round_regressions(cur, prev)
    assert flags == {} and abs(drift - 1.7) < 1e-9
    # idiosyncratic 3x on the same drifted box still fires
    cur["q3"] = 3.0 * 1.7
    flags, _ = cross_round_regressions(cur, prev)
    assert set(flags) == {"q3"}


def test_cross_round_subsecond_jitter_below_floor():
    prev = {"q": 0.1, "r": 5.0}
    # 1.9x but only +0.09 s — local[32] scheduler noise, not a regression
    flags, _ = cross_round_regressions({"q": 0.19, "r": 5.0}, prev)
    assert flags == {}


def test_cross_round_disjoint_or_empty_history():
    assert cross_round_regressions({"a": 1.0}, {}) == ({}, 1.0)
    assert cross_round_regressions({"a": 1.0}, {"b": 2.0}) == ({}, 1.0)


def test_history_file_matches_headline():
    """Every snapshotted round's queries are (a subset of) HEADLINE —
    a renamed query would silently fall out of the comparison."""
    from tools.cross_round_check import load_history

    hist = load_history()
    assert hist, "tools/bench_rounds.json must exist (snapshot protocol)"
    for label, medians in hist.items():
        assert set(medians) <= set(bench.HEADLINE), label


# ---- flag-closure gate (VERDICT r9 next #3) ----

from tools.flag_closure_check import SECTIONS, load_provenance, untriaged_flags


def test_untriaged_flags_pure():
    detail = {
        "regressions_vs_baseline": {"qa": {"sec": 2.0, "baseline_sec": 1.0}},
        "sf1_regressions_vs_baseline": {"qb": {"sec": 3.0, "baseline_sec": 1.5}},
        "cross_round_regressions": {"qa": {"ratio": 2.0, "prev_sec": 1.0}},
    }
    # nothing covered
    assert untriaged_flags(detail, {}) == [
        "warm:qa",
        "sf1:qb",
        "cross_round:qa",
    ]
    # fully covered: entries keyed by the flag's own baseline/prev value
    prov = {
        "warm": {"qa": {"note": "probe ...", "baseline_sec": 1.0}},
        "sf1": {"qb": {"note": "probe ...", "baseline_sec": 1.5}},
        "cross_round": {"qa": {"note": "probe ...", "prev_sec": 1.0}},
    }
    assert untriaged_flags(detail, prov) == []
    # empty flag sets need no provenance
    assert untriaged_flags({}, {}) == []


def test_stale_provenance_does_not_cover_new_regression():
    """ADVICE r10: a note recorded against an OLD pin must not close a
    NEW regression of the same query (different baseline regime), and
    legacy string entries carry no regime key so they never cover."""
    detail = {"regressions_vs_baseline": {"qa": {"sec": 4.0, "baseline_sec": 2.0}}}
    stale = {"warm": {"qa": {"note": "closed last round", "baseline_sec": 1.0}}}
    assert untriaged_flags(detail, stale) == ["warm:qa"]
    legacy = {"warm": {"qa": "closed as a bare string last round"}}
    assert untriaged_flags(detail, legacy) == ["warm:qa"]
    # the same note re-keyed to the current pin covers
    fresh = {"warm": {"qa": {"note": "probed this regime", "baseline_sec": 2.0}}}
    assert untriaged_flags(detail, fresh) == []


def test_auto_triage_closes_churn_and_keeps_reproductions(tmp_path, monkeypatch):
    """bench.auto_triage: a flag whose isolated probe lands within its
    limit is closed with an embedded note + provenance entry; one that
    reproduces keeps its untriaged status (nonzero rc upstream)."""
    import json as _json

    import tools.flag_closure_check as fcc

    detail = {
        "regressions_vs_baseline": {
            "q_churn": {"sec": 2.0, "baseline_sec": 0.5, "limit_sec": 0.75},
            "q_real": {"sec": 3.0, "baseline_sec": 0.5, "limit_sec": 0.75},
        },
        "cross_round_regressions": {
            "q_churn": {"sec": 2.0, "prev_sec": 0.5, "ratio": 4.0},
        },
    }
    probe_out = {
        "q1_pricing_summary": {"median": 2.2, "spread": 0.1},  # pin 1.934 -> 1.138x
        # worker-class control slower than the scan control: the MAX
        # ratio wins (class-correlated drift, r9 blind spot)
        "mm_image_decode_stub": {"median": 0.35, "spread": 0.01},  # pin 0.232 -> 1.509x
        "q_churn": {"median": 0.7, "spread": 0.05},  # adjusted ~0.46 < 0.75
        "q_real": {"median": 2.9, "spread": 0.05},  # adjusted ~1.92 >> 0.75
    }

    class FakeProc:
        stdout = _json.dumps(probe_out) + "\n"
        returncode = 0

    import subprocess as _sp

    monkeypatch.setattr(_sp, "run", lambda *a, **k: FakeProc())
    monkeypatch.setattr(fcc, "PROVENANCE_PATH", str(tmp_path / "prov.json"))
    provenance: dict = {}
    bench.auto_triage(detail, provenance, "/root/testdata/sf0.1")

    warm = detail["regressions_vs_baseline"]
    assert warm["q_churn"]["auto_probe"]["verdict"] == "churn"
    # adjustment used the slower (worker-class) control, not q1's 1.138
    assert abs(warm["q_churn"]["auto_probe"]["control_ratio"] - 0.35 / 0.232) < 2e-3
    assert "provenance" in warm["q_churn"]
    assert warm["q_real"]["auto_probe"]["verdict"] == "reproduces"
    assert "provenance" not in warm["q_real"]
    # cross-round churn rule: 0.62/0.5 = 1.23x < 1.5x alert
    assert detail["cross_round_regressions"]["q_churn"]["auto_probe"]["verdict"] == "churn"
    # the provenance file was appended with keyed entries
    saved = _json.loads((tmp_path / "prov.json").read_text())
    assert saved["warm"]["q_churn"]["baseline_sec"] == 0.5
    assert "q_real" not in saved.get("warm", {})
    # and the closed detail now gates clean while the real one stays loud
    assert untriaged_flags(detail, provenance) == ["warm:q_real"]


def test_committed_provenance_covers_committed_detail():
    """The shipped invariant itself: every flag section in the repo's
    BENCH_DETAIL.json (the artifact the driver commits) is covered by
    tools/bench_provenance.json — the state r9 shipped without."""
    import json as _json
    import os as _os

    path = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                         "BENCH_DETAIL.json")
    with open(path) as fh:
        detail = _json.load(fh)
    assert untriaged_flags(detail, load_provenance()) == []


def test_sections_map_matches_bench_detail_keys():
    # the section names are load-bearing: a renamed BENCH_DETAIL key
    # would silently stop gating that flag class
    assert set(SECTIONS) == {
        "regressions_vs_baseline",
        "sf1_regressions_vs_baseline",
        "cross_round_regressions",
        "loader_regression",
    }


# ---- loader-throughput ratchet (VERDICT r10 next #2) ----


def test_loader_regression_flagged_and_drift_normalized():
    pin = {"rows_per_sec": 400_000, "spread": 20_000}
    # limit = 400k - max(1*20k, 15% * 400k) = 340k (ADVICE r11: the old
    # 2*spread / 25% floor could not catch a ~27% r10-shape incident)
    assert bench.flag_loader_regression({"rows_per_sec": 345_000}, pin) == {}
    flagged = bench.flag_loader_regression({"rows_per_sec": 300_000}, pin)
    assert flagged["loader"]["limit_rows_per_sec"] == 340_000
    assert flagged["loader"]["baseline_rows_per_sec"] == 400_000
    # a ~25% drop — the incident class the ratchet exists for — flags
    assert "loader" in bench.flag_loader_regression({"rows_per_sec": 300_000}, pin)
    # a uniformly slow box (drift 1.2) understates throughput — the
    # same 300k multiplies back to 360k and passes
    assert bench.flag_loader_regression({"rows_per_sec": 300_000}, pin, drift=1.2) == {}
    # a FAST box never loosens the limit (norm floors at 1.0)
    assert "loader" in bench.flag_loader_regression(
        {"rows_per_sec": 300_000}, pin, drift=0.8
    )
    # no pin / no measurement -> no flag
    assert bench.flag_loader_regression({"rows_per_sec": 0}, pin) == {}
    assert bench.flag_loader_regression({"rows_per_sec": 300_000}, {}) == {}


def test_shipped_control_fingerprints_match_sources():
    """The pinned control fingerprints (tools/bench_baseline.json)
    match the current source files: editing relational.py /
    multimodal.py / codecs.py invalidates the controls' pins, and this
    tripwire forces a re-pin (ADVICE r11 bench.py:492)."""
    fps = bench.load_baseline("control_fingerprints")
    assert set(fps) == set(bench.PROBE_CONTROLS)
    for c in bench.PROBE_CONTROLS:
        assert fps[c] == bench.control_fingerprint(c), (
            f"control {c}'s source changed since its fingerprint pin — "
            "re-probe the control and re-pin control_fingerprints"
        )


def test_auto_triage_control_ratio_bounded_and_fingerprint_gated(tmp_path, monkeypatch):
    """ADVICE r11 (bench.py:492): an anomalous control reading cannot
    deflate flags past CTL_CAP, and a control whose source changed
    since its pin is excluded from the ratio entirely."""
    import json as _json
    import subprocess as _sp

    import tools.flag_closure_check as fcc

    def make_detail():
        return {
            "regressions_vs_baseline": {
                # in-suite 9.0s vs limit 0.75s; isolated 2.9s would
                # close only if a >3.8x control ratio were accepted
                "q_slow": {"sec": 9.0, "baseline_sec": 0.5, "limit_sec": 0.75},
            }
        }

    probe_out = {
        # q1 reading 5x its 1.934 pin: an anomaly, not host drift
        "q1_pricing_summary": {"median": 9.7},
        "mm_image_decode_stub": {"median": 0.232},  # 1.0x its pin
        "q_slow": {"median": 2.9},
    }

    class FakeProc:
        stdout = _json.dumps(probe_out) + "\n"
        returncode = 0

    monkeypatch.setattr(_sp, "run", lambda *a, **k: FakeProc())
    monkeypatch.setattr(fcc, "PROVENANCE_PATH", str(tmp_path / "prov.json"))

    detail = make_detail()
    bench.auto_triage(detail, {}, "/root/testdata/sf0.1")
    probe = detail["regressions_vs_baseline"]["q_slow"]["auto_probe"]
    # the 5x anomaly was capped: 2.9 / 2.0 = 1.45 > 0.75 limit -> open
    assert probe["control_ratio"] == bench.CTL_CAP
    assert probe["verdict"] == "reproduces"

    # a fingerprint mismatch on BOTH controls -> no trusted ratio ->
    # ctl floors at 1.0 (raw isolated number vs limit; stays open)
    monkeypatch.setattr(bench, "control_fingerprint", lambda c: "tampered")
    detail = make_detail()
    bench.auto_triage(detail, {}, "/root/testdata/sf0.1")
    probe = detail["regressions_vs_baseline"]["q_slow"]["auto_probe"]
    assert probe["control_ratio"] == 1.0
    assert probe["verdict"] == "reproduces"


def test_shipped_loader_pin_exists():
    pin = bench.load_baseline("loader")
    assert pin.get("rows_per_sec", 0) > 0 and "spread" in pin


def test_auto_triage_loader_branch_is_direction_reversed(tmp_path, monkeypatch):
    """The loader flag probes via the __loader__ pseudo-query and its
    isolated rows/sec is multiplied UP by the control ratio (a slow box
    understates throughput): an isolated number that clears the limit
    after adjustment closes as churn."""
    import json as _json

    import tools.flag_closure_check as fcc

    detail = {
        "loader_regression": {
            "loader": {
                "sec": 250_000,
                "rows_per_sec": 250_000,
                "baseline_rows_per_sec": 400_000,
                "limit_rows_per_sec": 300_000,
            }
        }
    }
    probe_out = {
        "q1_pricing_summary": {"median": 2.2},  # pin 1.934 -> control 1.138x
        "__loader__": {"median": 280_000},  # * 1.138 = 318k >= 300k limit
    }

    class FakeProc:
        stdout = _json.dumps(probe_out) + "\n"
        returncode = 0

    import subprocess as _sp

    monkeypatch.setattr(_sp, "run", lambda *a, **k: FakeProc())
    monkeypatch.setattr(fcc, "PROVENANCE_PATH", str(tmp_path / "prov.json"))
    provenance: dict = {}
    bench.auto_triage(detail, provenance, "/root/testdata/sf0.1")
    entry = detail["loader_regression"]["loader"]
    assert entry["auto_probe"]["verdict"] == "churn"
    assert entry["auto_probe"]["drift_adjusted"] >= 300_000
    saved = _json.loads((tmp_path / "prov.json").read_text())
    assert saved["loader"]["loader"]["baseline_rows_per_sec"] == 400_000
    from tools.flag_closure_check import untriaged_flags

    assert untriaged_flags(detail, provenance) == []
