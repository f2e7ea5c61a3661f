"""Benchmark harness: runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (real execution,
no driver collect overhead). One small warmup run amortizes JVM/codegen
startup out of the first measurement.

Second scale (VERDICT r4 next-round #7): many queries sit below the
fixed-cost floor at sf0.1, where regressions hide — so after the sf0.1
medians, the same headline set runs once per query against the 10×
replicated corpus (tools/scale_experiment.py layout, built on demand),
and BOTH scales land in the artifact: per-query sf1 seconds in the
final line (2 dp, kept compact for the driver's tail capture) and full
detail in BENCH_DETAIL.json. Set SPARK_GRAFT_BENCH_SF1=0 to skip the
10× pass (e.g. when iterating on one query).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_s3_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# Representative slice of the operator inventory: scan-agg, fact-fact
# join, 6-way join, window, distinct-agg, ETL partition+flush, dedup
# (LSH + simhash), text stats, ANN, multimodal decode.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_topk_per_group",
    "agg_distinct",
    "etl_row_type_partition",
    "etl_buffer_flush",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_exact",
    "text_token_stats",
    "text_langid",
    "events_asof_join",
    "events_sessionize",
    "agg_percentiles",
    "agg_stats_suite",
    "ann_multi_query_topk",
    "ann_lsh_bucketed",
    "ann_recall_lsh",
    "ann_ivf_topk",
    "dedup_cluster_resolve",
    "etl_buffer_flush_bytes",
    "mm_image_decode_stub",
    "text_pii_mask",
    "text_gopher_repetition",
    "curation_pack_sequences",
    "curation_pipeline_funnel",
    "emb_normalize_quantize",
    "events_funnel_steps",
    "dedup_incremental",
    "fn_map_suite",
    "events_retention_cohorts",
    "curation_length_histogram",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "text_unigram_surprisal",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_strict",
    "curation_dedup_pipeline",
    "text_bpe_train",
    "text_bpe_train_k64",
    "ann_pq_topk",
    "dedup_semantic",
    "dedup_semantic_k32",
    "dedup_semantic_hier",
    "emb_kcenter_coreset",
    "emb_kcenter_batched",
    "text_phrase_search",
    "curation_url_dedup",
    "text_bm25_search",
    "graph_pagerank",
    "graph_triangles",
    "curation_dsir_weights",
    "curation_weighted_sample",
    "curation_ccnet_buckets",
    "dedup_span_exact",
    "mm_image_resize_real",
    "etl_indexed_gzip_splits",
    "search_hybrid_rrf",
    "curation_split_leakage",
    "events_drift_chi2",
    "mm_audio_decode_real",
    "sketch_countmin",
    "text_tfidf_topk",
    "emb_kmeans",
    "events_ewma",
    "text_bigram_surprisal",
    "sketch_heavy_hitters",
    "sketch_quantile_histogram",
    "events_drift_psi",
    "curation_quality_lr",
    "curation_quality_lr_scores",
    "dedup_fuzzy_names",
    "etl_scd2_merge",
    "etl_snapshot_diff",
    "etl_zorder_skipping",
    "events_session_window",
    "mm_video_frame_sample",
    "events_mad_outliers",
    "emb_pca_project",
    "sketch_ams_f2",
    "dedup_minhash_containment",
    "events_ar1_autocorr",
    "events_asof_tolerance",
    "curation_quality_lr_auc",
    "text_bpe_fertility",
    "text_zipf_fit",
    "curation_epoch_shuffle",
    "events_cusum_alarm",
    "etl_raw_roundtrip",
    "ann_mips_topk",
    "ann_mips_ivf_topk",
    "text_gopher_rules",
    "etl_incremental_agg_merge",
    "sketch_hll_estimate",
    "events_asof_nearest",
    "events_resample_ffill",
    "events_rollup_cascade",
    "events_seasonal_decompose",
    "events_funnel_conversion_time",
    "events_drift_ks",
    "events_peak_detection",
    "curation_quality_lr_calibration",
    "mm_video_shot_boundary",
    "text_learnability",
    "text_ngram_novelty",
    "ann_hard_negatives",
    "emb_prototype_prune",
    "ann_matryoshka_recall",
    "curation_dedup_survivorship",
    "sketch_kmv_intersection",
    "join_interval_overlap",
    "sketch_hll_sliding",
    "etl_compaction_bins",
    "diag_key_skew",
    "agg_bitmap_distinct",
    "events_pit_features",
    "events_streak_runs",
    "fn_lambda_suite",
    "events_markov_stationary",
    "events_recursive_sessions",
    "join_lateral_topn",
    "agg_weighted_median",
    "mm_image_dhash_dedup",
    "mm_audio_fingerprint",
    "fn_try_suite",
    "curation_epoch_shuffle_write",
    "curation_decontaminate",
    "window_rank_dense",
    "text_vocabulary",
    # r9 additions (this session)
    "dedup_ngram_coverage",
    "dedup_source_overlap",
    "events_attribution",
    "events_rfm_segments",
    "events_ab_test",
    "events_session_paths",
    "etl_cdc_merge",
    "graph_label_propagation",
    "text_rake_keywords",
    "ann_knn_join_ivf",
    "ann_recall_knn_join",
    "events_cohort_ltv",
    "emb_outlier_report",
    "graph_link_prediction",
    "text_tfidf_simjoin",
    "events_seasonal_naive_mape",
    "events_dau_mau_stickiness",
    # -- added in round 10 --
    "ann_knn_classify",
    "ann_mmr_diversify",
    "emb_drift_mmd",
    # -- added in round 11 --
    "join_market_basket",
    # -- added in round 12 --
    "events_sequential_patterns",
    "ann_knn_join_pq",
    "ann_recall_knn_join_pq",
]

WARM_RUNS = 3  # warm samples per query; reported value = median

# Pinned per-query baseline (VERDICT r5 task #3): round 5's warm
# medians + spreads. Any query slower than median + max(2*spread,
# 25% of median) is flagged in the artifact — the plan-budget pattern
# applied to time, so suite drift is caught mechanically instead of
# by judge-side diffing. Refresh the file when a faster plan lands
# (ratchet down, never silently up).
BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "bench_baseline.json"
)


def load_baseline(key: str = "queries") -> dict[str, dict]:
    """``key='queries'`` → the sf0.1 warm-median baselines;
    ``key='sf1'`` → the 10× single-run baselines (VERDICT r6 task #3:
    the sf1 column is where scale regressions show — guard it with the
    same drift-normalized ratchet as sf0.1)."""
    try:
        with open(BASELINE_PATH) as fh:
            return json.load(fh).get(key) or {}
    except (OSError, json.JSONDecodeError):
        return {}


# Above this suite-wide ratio-to-baseline, the run is flagged as a
# whole: a GLOBAL slowdown (session config, scan splitting — the r6
# openCostInBytes incident) must not hide inside the normalizer below.
DRIFT_ALERT = 1.35


def suite_drift(timings: dict[str, float], baseline: dict[str, dict]) -> float:
    """Median per-query ratio to baseline across the whole suite — the
    run's environment factor. Two idle-box r6 full-suite runs came in
    with near-uniform per-query ratios around 1.2x and 1.4x (15 and 31
    flags, unrelated operators, no code change between them): shared-
    host VM throughput variance, not plans. The median over 90+ queries
    estimates that factor robustly (a handful of true regressions
    cannot move it)."""
    ratios = sorted(
        t / baseline[q]["median"]
        for q, t in timings.items()
        if q in baseline and baseline[q]["median"] > 0
    )
    if not ratios:
        return 1.0
    return round(statistics.median(ratios), 4)


def flag_regressions(
    timings: dict[str, float], baseline: dict[str, dict], drift: float = 1.0
) -> dict[str, dict]:
    """Pure so tests can inject a slowdown: queries whose DRIFT-
    NORMALIZED warm median exceeds baseline median + max(2*spread,
    25% of median, 0.15 s). The absolute floor is the local[32]
    scheduler-noise scale: without it, sub-second queries carry
    tens-of-ms tolerances and the flag set churns run to run on
    environment jitter (r6 observed two consecutive suites flag 15
    queries each with only 6 in common, most within ~5 ms of their
    limit). A real plan regression is idiosyncratic — one query,
    usually well over 2x — so it still fires after dividing out the
    suite-level drift; a uniformly slow box fires the DRIFT_ALERT
    instead (recorded in the artifact), never 31 per-query flags.

    Known blind spot (r9, documented after three rotating flag sets in
    one session): host variance can be CLASS-correlated, not uniform —
    python-worker- and driver-loop-heavy queries (Arrow UDF decode,
    GD/Lloyd/power-iteration loops, many-small-job plans) measured
    1.2-1.8x their pins on sessions where scan-bound controls sat at
    1.0x, so the suite-median normalizer passes them through as flags.
    Protocol when that happens: isolated 5-run probes with scan-bound
    controls; re-pin only probe-confirmed values with provenance under
    repin_* keys; tools/cross_round_check.py guards the long horizon
    against silent ratchet-up."""
    norm = max(drift, 1.0)  # a fast box never excuses absolute slowness
    flags: dict[str, dict] = {}
    for q, t in timings.items():
        b = baseline.get(q)
        if not b:
            continue
        limit = b["median"] + max(2 * b["spread"], 0.25 * b["median"], 0.15)
        if t / norm > limit:
            flags[q] = {
                "sec": t,
                "drift_adj_sec": round(t / norm, 3),
                "baseline_sec": b["median"],
                "limit_sec": round(limit, 3),
            }
    return flags


def flag_sf1_regressions(
    times: dict[str, float], baseline: dict[str, dict], drift: float = 1.0
) -> dict[str, dict]:
    """sf1 ratchet (pure, injection-tested like flag_regressions).
    sf1 timings are SINGLE runs on a warm JVM, so the tolerance is
    wider than the sf0.1 warm-median ratchet: drift-normalized time
    above baseline + max(35% of baseline, 1.0 s) flags. The drift
    factor is the sf1 suite's own median ratio-to-baseline — a 10×
    pass on a loaded box drifts as a whole, one regressed plan does
    not."""
    norm = max(drift, 1.0)
    flags: dict[str, dict] = {}
    for q, t in times.items():
        b = baseline.get(q)
        if not b:
            continue
        limit = b["median"] + max(0.35 * b["median"], 1.0)
        if t / norm > limit:
            flags[q] = {
                "sec": t,
                "drift_adj_sec": round(t / norm, 3),
                "baseline_sec": b["median"],
                "limit_sec": round(limit, 3),
            }
    return flags

def flag_loader_regression(
    loader: dict[str, float], baseline: dict[str, float], drift: float = 1.0
) -> dict[str, dict]:
    """Loader-throughput ratchet (VERDICT r10 next #2: the rows/sec
    number dropped 27% round-over-round and nothing watched it). Same
    shape as the query ratchets but direction-reversed — throughput
    regresses DOWN — and normalized by the suite drift factor: a box
    running queries at 1.3x their pins delivers proportionally fewer
    rows/sec, so the in-suite number is multiplied back up before the
    compare. Flags when drift-adjusted rows/sec falls below
    pin − max(1·spread, 15% of pin) — tightened from 2·spread/25%
    (ADVICE r11: with the r11 pin's spread the old threshold was a
    ~44% drop, so the −27% r10 incident that MOTIVATED this ratchet
    would have passed unflagged); pure for injection tests."""
    pin = (baseline or {}).get("rows_per_sec")
    if not pin or not loader.get("rows_per_sec"):
        return {}
    spread = (baseline or {}).get("spread", 0)
    norm = max(drift, 1.0)  # a fast box never excuses absolute slowness
    adj = round(loader["rows_per_sec"] * norm)
    limit = round(pin - max(spread, 0.15 * pin))
    if adj < limit:
        return {
            "loader": {
                "sec": loader["rows_per_sec"],  # flag-entry convention
                "rows_per_sec": loader["rows_per_sec"],
                "drift_adj_rows_per_sec": adj,
                "baseline_rows_per_sec": pin,
                "limit_rows_per_sec": limit,
            }
        }
    return {}


SF1_DIR = "/tmp/scale10"  # tools/scale_experiment.py's 10x corpus


def ensure_scale10(spark) -> bool:
    """Build the 10× corpus if it isn't already on disk (embeddings is
    the last table replicate() writes, so its _SUCCESS implies a
    complete build). Returns False when the pass is disabled."""
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") == "0":
        return False
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet", "_SUCCESS")):
        from tools.scale_experiment import replicate

        replicate(spark)
    return True


# dedup_embedding_lsh is the deliberately noise-floor-thresholded
# ORACLE ANCHOR (ann.py): its candidate set is pair-bound by design
# (SCALE.md measured 204x pairs at 10x), so at sf1 it alone costs
# ~180 s — 56% of the whole pass — while saying nothing new about the
# engine (its production sibling dedup_embedding_lsh_strict runs the
# same plan shape at a real threshold and IS measured). Skipping it at
# sf1 only, explicitly recorded in the artifact, keeps the 10x pass
# representative instead of anchor-dominated.
SKIP_SF1 = {
    "dedup_embedding_lsh": "noise-floor oracle anchor, pair-bound at 10x",
    # r10: ann_knn_join_ivf / graph_label_propagation /
    # graph_link_prediction now ride the corpus-sized trained-IVF
    # join (cells ∝ sqrt(N), per-cell blocked Arrow scoring) and run
    # at sf1; only the exact truth arm stays guarded
    "ann_recall_knn_join": "exact truth arm quadratic past the guard scale",
    "ann_recall_knn_join_pq": "exact truth arm quadratic past the guard scale",
    # recursion = one frontier shuffle join PER DEPTH level; 10x data
    # makes sessions ~10x longer, so depth x frontier costs ~55 s while
    # the window twin (events_sessionize) stays sub-second — the
    # documented anti-recommendation, measured once in SCALE.md
    "events_recursive_sessions": "depth-proportional recursion demo; window twin is the scale path",
}


def run_sf1(spark, queries) -> tuple[dict[str, float], dict[str, str]]:
    """Warm-then-measure at 10×: one unmeasured run per query (plan
    compile + codegen + page-cache for THESE paths — the sf0.1 medians
    warm different plans over different files), then one measured run.
    The r7 isolated re-probes showed 2-5× cold-vs-warm spreads on the
    heavier queries (e.g. text_gopher_repetition 8.98 → 1.86 s), and
    the committed sf1 baselines come from the warm protocol
    (tools/scale_experiment.py) — mixing cold measurements into a warm
    ratchet produced a spurious 10-query flag list. Guarded operators
    that refuse at this scale are recorded as errors, not silently
    dropped."""
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name in SKIP_SF1:
            errors[name] = f"skipped_sf1: {SKIP_SF1[name]}"
            continue
        try:
            materialize(queries[name](spark, SF1_DIR))  # warm
            t0 = time.time()
            materialize(queries[name](spark, SF1_DIR))
            times[name] = round(time.time() - t0, 2)
        except Exception as e:
            errors[name] = str(e).split("\n")[0][:120]
    return times, errors


PROBE_CONTROL = "q1_pricing_summary"  # scan-bound control for solo probes
# Host drift is CLASS-correlated (the r9-documented blind spot): the
# scan-bound q1 control can read 1.0x while python-worker-heavy
# queries run 1.3-1.9x their pins. Auto-triage therefore probes a
# second, WORKER-class control (Arrow decode, pinned, code never hot)
# and adjusts by the MAX control ratio — the most generous host-factor
# reading. A genuine single-query plan regression still fires: the
# controls are unchanged code and do not inflate with it.
PROBE_CONTROLS = (PROBE_CONTROL, "mm_image_decode_stub")

# ADVICE r11 (bench.py:492): the control ratio can close flags, so it
# must itself be trustworthy. Two guards:
# 1. a control whose SOURCE changed since its pin no longer measures
#    host drift (its own code change may have moved its number) — its
#    ratio is excluded. Fingerprints of the declared source files are
#    pinned in tools/bench_baseline.json["control_fingerprints"].
# 2. the accepted ratio is capped: beyond CTL_CAP the "host factor"
#    reading is an anomaly (noisy probe, swapping box), and letting it
#    deflate flags would self-close real regressions. Capping keeps
#    the adjustment conservative — more flags stay open for the human
#    worktree protocol, none silently vanish.
CTL_CAP = 2.0
CONTROL_SOURCES = {
    "q1_pricing_summary": ("kinesis_s3_spark/operators/relational.py",),
    "mm_image_decode_stub": (
        "kinesis_s3_spark/operators/multimodal.py",
        "kinesis_s3_spark/multimodal/codecs.py",
    ),
}


def control_fingerprint(name: str) -> str:
    """sha256 over the control query's declared source files (the query
    module plus any shared hot-path module, e.g. the Arrow decode path
    both mm_* controls and real queries ride)."""
    import hashlib

    repo = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for rel in CONTROL_SOURCES.get(name, ()):
        with open(os.path.join(repo, rel), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def auto_triage(detail: dict, provenance: dict, sf_dir: str) -> None:
    """Self-triaging final bench (VERDICT r10 next #1): every flag with
    no matching provenance entry is immediately re-measured SOLO — a
    subprocess ``tools/probe.py`` run (fresh JVM, fresh session) with
    the scan-bound q1 control — and the isolated number + verdict are
    embedded in the flag entry itself. Flags whose control-adjusted
    isolated time sits within their limit are churn: a provenance entry
    (keyed by the flag's baseline, per the stale-closure fix) is
    appended to tools/bench_provenance.json so driver-final artifacts
    arrive self-triaged and rc returns to 0. A flag that REPRODUCES in
    isolation stays untriaged (nonzero rc): the pin-commit worktree
    comparison that separates host class drift from a code regression
    is a human step by design. Mutates ``detail``'s flag maps and
    ``provenance`` in place."""
    import subprocess

    from tools.flag_closure_check import (
        KEY_FIELD,
        PROVENANCE_PATH,
        SECTIONS,
        covering_note,
    )

    repo = os.path.dirname(os.path.abspath(__file__))
    jobs: dict[str, set[str]] = {}
    fresh: list[tuple[str, str, dict]] = []
    for det_key, prov_key in SECTIONS.items():
        for q, entry in (detail.get(det_key) or {}).items():
            if covering_note(provenance, prov_key, q, entry) is None:
                d = SF1_DIR if prov_key == "sf1" else sf_dir
                # the loader flag probes via the __loader__ pseudo-query
                jobs.setdefault(d, set()).add("__loader__" if prov_key == "loader" else q)
                fresh.append((prov_key, q, entry))
    if not fresh:
        return
    results: dict[tuple[str, str], dict] = {}
    controls: dict[str, float] = {}
    for d, names in sorted(jobs.items()):
        cmd = [
            sys.executable,
            os.path.join(repo, "tools", "probe.py"),
            d,
            ",".join(list(PROBE_CONTROLS) + sorted(names)),
            "--warm",
            "3",
        ]
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800, cwd=repo
            )
            parsed = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as exc:  # a failed probe leaves its flags untriaged (loud)
            for n in names:
                results[(d, n)] = {"error": f"{type(exc).__name__}: {exc}"}
            continue
        pins = load_baseline("sf1" if d == SF1_DIR else "queries")
        fps = load_baseline("control_fingerprints")
        ratios = []
        for c in PROBE_CONTROLS:
            if c not in parsed or not pins.get(c, {}).get("median"):
                continue
            if fps.get(c) and fps[c] != control_fingerprint(c):
                # control's own source changed since its pin — its
                # ratio can no longer stand in for host drift
                continue
            ratios.append(parsed[c]["median"] / pins[c]["median"])
        controls[d] = round(min(max(ratios), CTL_CAP), 3) if ratios else 1.0
        for n in names:
            if n in parsed:
                results[(d, n)] = parsed[n]
    stamp = time.strftime("%Y-%m-%d", time.gmtime())
    changed = False
    for prov_key, q, entry in fresh:
        d = SF1_DIR if prov_key == "sf1" else sf_dir
        probe_name = "__loader__" if prov_key == "loader" else q
        r = results.get((d, probe_name), {"error": "probe returned no result"})
        if "error" in r:
            entry["auto_probe"] = r
            continue
        ctl = max(controls.get(d, 1.0), 1.0)  # a fast box never excuses slowness
        if prov_key == "loader":
            # throughput: direction reversed — a slow box UNDERSTATES
            # rows/sec, so multiply back up before comparing to the pin
            adj = round(r["median"] * ctl)
            churn = adj >= entry["limit_rows_per_sec"]
            limit_txt = f"limit {entry['limit_rows_per_sec']} rows/s"
            unit = " rows/s"
        elif prov_key == "cross_round":
            # mirror tools/cross_round_check: a flag needs ratio > 1.5
            # AND +0.2 s absolute — churn when either fails in isolation
            adj = round(r["median"] / ctl, 3)
            prev = entry["prev_sec"]
            churn = adj / prev <= 1.5 or adj - prev <= 0.2
            limit_txt = f"cross-round limit {round(prev * 1.5, 3)}s (1.5x r_prev {prev})"
            unit = "s"
        else:
            adj = round(r["median"] / ctl, 3)
            churn = adj <= entry["limit_sec"]
            limit_txt = f"limit {entry['limit_sec']}s"
            unit = "s"
        verdict = "churn" if churn else "reproduces"
        entry["auto_probe"] = {
            "isolated_median": r["median"],
            "control_ratio": controls.get(d, 1.0),
            "drift_adjusted": adj,
            "verdict": verdict,
        }
        if churn:
            field = KEY_FIELD[prov_key]
            note = (
                f"auto-probe (bench.py self-triage, {stamp}): flagged "
                f"{entry['sec']}{unit} in-suite; isolated probe {r['median']}{unit} "
                f"(control {controls.get(d, 1.0)}x its pin) -> {adj}{unit} adjusted "
                f"vs {limit_txt} — within limit; churn, no re-pin."
            )
            provenance.setdefault(prov_key, {})[q] = {"note": note, field: entry[field]}
            entry["provenance"] = note
            changed = True
    if changed:
        with open(PROVENANCE_PATH, "w") as fh:
            json.dump(provenance, fh, indent=1)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def loader_throughput(spark, sf_dir: str) -> dict[str, float]:
    """The reference's actual job, measured: synthesize self-describing
    JSON records from events and push one batch through the full emit
    path (row_type partition + gzip text sink + bad-row split).
    Reported as rows/sec and MB/sec of payload — the reference's
    per-shard ceiling is 1 MiB/s (BASELINE.md §2)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from kinesis_s3_spark.config import from_dict
    from kinesis_s3_spark.operators.etl import _SDJ_SPARK
    from kinesis_s3_spark.sinks.emitter import emit
    from kinesis_s3_spark.sources.tables import load_table

    out = tempfile.mkdtemp(prefix="bench_emit_")
    try:
        cfg = from_dict(
            {
                "purpose": "SELF_DESCRIBING",
                "input": {"stream_name": "bench"},
                "output": {
                    "s3": {"path": f"{out}/good", "compression": "GZIP"},
                    "bad_path": f"{out}/bad",
                },
                # production-sized flush buffer: the config DEFAULT
                # (2048 B, mirroring config.hocon.sample's test value)
                # would roll a ~10-record file per object and measure
                # file-creation overhead instead of the emit path
                "buffer": {"byte_limit": 64 * 1024 * 1024},
            }
        )
        one = (
            load_table(spark, sf_dir, "events")
            .withColumn("value", F.expr(_SDJ_SPARK))
            .select("value")
        )
        # 10-fold batch: a micro-batch large enough that per-job fixed
        # costs (~1-2 s) don't dominate the steady-state rate
        batch = one
        for _ in range(9):
            batch = batch.unionByName(one)
        n_bytes = batch.agg(F.sum(F.length("value"))).collect()[0][0]
        # median of 3 emits — the same sandbox-noise protocol as the
        # query timings (single-shot loader numbers swung 203k-288k
        # rows/s run to run)
        rates = []
        for i in range(3):
            t0 = time.time()
            meta = emit(batch, batch_id=i, cfg=cfg)
            dt = time.time() - t0
            rates.append((meta.count / dt, n_bytes / 1e6 / dt))
        rates.sort()
        return {
            "rows_per_sec": round(rates[1][0]),
            "payload_mb_per_sec": round(rates[1][1], 1),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches on the smoke SF
    materialize(queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    # cold = first execution (includes codegen/JIT compile for the
    # plan); warm = median of WARM_RUNS further executions
    # (steady-state, what a resident engine serves, with the median
    # absorbing sandbox load spikes — round 2's 35% phantom swing was
    # an n=1 artifact). value/queries report the warm median; cold and
    # the per-query warm spread are kept for context.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        materialize(queries[name](spark, sf_dir))
        cold[name] = round(time.time() - t0, 3)
        samples = []
        for _ in range(WARM_RUNS):
            t0 = time.time()
            materialize(queries[name](spark, sf_dir))
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)

    baseline = load_baseline()
    drift = suite_drift(timings, baseline)
    regressions = flag_regressions(timings, baseline, drift)

    # cross-ROUND ratchet (VERDICT r8 next #2): the pin file above is a
    # within-round gate since the r8 re-seed; this compares against the
    # PREVIOUS round's committed warm medians (tools/bench_rounds.json,
    # snapshotted once per round — see tools/cross_round_check.py)
    from tools.cross_round_check import cross_round_regressions, prev_round_medians

    prev_label, prev_medians = prev_round_medians()
    xround_flags, xround_drift = cross_round_regressions(timings, prev_medians)

    loader = loader_throughput(spark, sf_dir)
    loader_flags = flag_loader_regression(loader, load_baseline("loader"), drift)

    sf1_times: dict[str, float] = {}
    sf1_errors: dict[str, str] = {}
    sf1_drift = 1.0
    sf1_regressions: dict[str, dict] = {}
    if ensure_scale10(spark):
        sf1_times, sf1_errors = run_sf1(spark, queries)
        sf1_baseline = load_baseline("sf1")
        sf1_drift = suite_drift(sf1_times, sf1_baseline)
        sf1_regressions = flag_sf1_regressions(sf1_times, sf1_baseline, sf1_drift)

    total = round(sum(timings.values()), 3)
    # flag-closure discipline (VERDICT r9 next #3): every flag carries
    # its triage provenance string INSIDE the artifact when one exists
    # (tools/bench_provenance.json), so a committed detail file is
    # self-documenting; flags WITHOUT provenance are listed in
    # untriaged_flags and turn the exit code nonzero — a final driver
    # bench that ships new unprobed flags is loud, not silent.
    from tools.flag_closure_check import covering_note, load_provenance, untriaged_flags

    provenance = load_provenance()
    for flag_map, prov_key in (
        (regressions, "warm"),
        (sf1_regressions, "sf1"),
        (xround_flags, "cross_round"),
        (loader_flags, "loader"),
    ):
        for q, entry in flag_map.items():
            note = covering_note(provenance, prov_key, q, entry)
            if note:
                entry["provenance"] = note
    # Full detail (cold timings, warm spread) goes to a sidecar file:
    # round 3's final line carried all three 41-entry maps and outgrew
    # the driver's stdout tail capture (BENCH_r03 "parsed": null). The
    # final stdout line stays compact — the driver parses the LAST line.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    detail = {
        "sf": float(sf),
        "warm_runs": WARM_RUNS,
        "warm_median_sec": timings,
        "cold_sec": cold,
        "cold_total_sec": round(sum(cold.values()), 3),
        "warm_spread_sec": spread,
        "regressions_vs_baseline": regressions,
        "suite_drift": drift,
        "drift_alert": drift > DRIFT_ALERT,
        "cross_round_vs": prev_label,
        "cross_round_drift": xround_drift,
        "cross_round_regressions": xround_flags,
        "loader": loader,
        "loader_regression": loader_flags,
        "sf1_single_run_sec": sf1_times,
        "sf1_errors": sf1_errors,
        "sf1_total_sec": round(sum(sf1_times.values()), 2),
        "sf1_regressions_vs_baseline": sf1_regressions,
        "sf1_suite_drift": sf1_drift,
    }
    open_flags = untriaged_flags(detail, provenance)
    # write the artifact BEFORE auto-triage (ADVICE r11 bench.py:711):
    # a crash inside the triage subprocess handling must not lose the
    # whole suite's results after a full bench run
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    if open_flags and os.environ.get("SPARK_GRAFT_BENCH_AUTOPROBE", "1") != "0":
        # free the bench JVM before the solo sessions — overlapping
        # Spark runs are exactly the contention the probes must escape
        spark.stop()
        try:
            auto_triage(detail, provenance, sf_dir)
        except Exception as exc:  # keep the artifact; record the failure
            detail["auto_triage_error"] = f"{type(exc).__name__}: {exc}"
        open_flags = untriaged_flags(detail, provenance)
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    line = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": float(sf),
        "loader": loader,
        "n_regressions": len(regressions),
        "regressed": sorted(regressions),
        "suite_drift": drift,
        "cross_round_vs": prev_label,
        "cross_round_drift": xround_drift,
        "cross_round_regressions": sorted(xround_flags),
    }
    if sf1_times:
        # array aligned with the `queries` map's key order (HEADLINE
        # order) — the per-query names are NOT repeated so the final
        # line stays under the driver's tail-capture size; the
        # name-keyed map lives in BENCH_DETAIL.json (sf1_single_run_sec)
        n_skipped = sum(1 for v in sf1_errors.values() if v.startswith("skipped_sf1:"))
        line["sf1"] = {
            "total_sec": round(sum(sf1_times.values()), 2),
            "n_queries": len(sf1_times),
            "n_errors": len(sf1_errors) - n_skipped,
            "n_skipped": n_skipped,
            "n_regressions": len(sf1_regressions),
            "regressed": sorted(sf1_regressions),
            "suite_drift": sf1_drift,
            "sec_by_query_in_queries_order": [
                sf1_times.get(n) for n in HEADLINE if n in sf1_times or n in sf1_errors
            ],
        }
    line["untriaged_flags"] = open_flags
    print(json.dumps(line))
    if open_flags:
        # nonzero exit (VERDICT r9 next #3): the artifact above is
        # complete — the rc only marks that its flag sets need the
        # solo-probe protocol + provenance before the detail is shipped
        sys.exit(1)


if __name__ == "__main__":
    main()
