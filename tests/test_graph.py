"""Graph operator tests: PageRank invariants and triangle counts
cross-checked against a driver-side brute force on the same edges."""

from __future__ import annotations

from itertools import combinations

import __spark_entry__ as entrymod

from kinesis_s3_spark.operators.graph import transition_edges
from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_pagerank_is_a_distribution(spark):
    rows = Q["graph_pagerank"](spark, SF_CORRECT).collect()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-3, total  # mass conserved (dangling handled)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["pagerank"], b["event_type"]) >= (b["pagerank"], a["event_type"])


def test_triangles_match_bruteforce(spark):
    """Engine triangle counts vs a driver-side brute force over the
    same undirected edge set."""
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in transition_edges(spark, SF_CORRECT).collect()
        if r["src"] != r["dst"]
    }
    nodes = sorted({v for e in edges for v in e})
    expected = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for v in (a, b, c):
                expected[v] += 1
    got = {
        r["event_type"]: r["n_triangles"]
        for r in Q["graph_triangles"](spark, SF_CORRECT).collect()
    }
    for v in nodes:
        assert got.get(v, 0) == expected[v], (v, got.get(v), expected[v])
