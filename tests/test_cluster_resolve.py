"""Connected-components resolvers: the alternating large-star /
small-star contraction (dedup.resolve_labels_star) must (a) agree with
min-label propagation and with a NetworkX-free reference union-find on
arbitrary graphs, and (b) converge in O(log n) rounds on the
worst-case shape for label propagation — a long path (template/
boilerplate near-dup chains). Kiveris et al. 2014 prove the bound;
this pins it empirically so a regression back to diameter-rounds
behavior fails loudly."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kinesis_s3_spark.operators.dedup import (
    _large_star,
    _small_star,
    resolve_components,
    resolve_labels,
    resolve_labels_star,
)


def _ids(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "doc_id string")


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges] or [("x", "x")], "d1 string, d2 string"
    ).filter(F.col("d1") != F.col("d2"))


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_star_path_graph_logarithmic_rounds(spark):
    """A planted 1000-node path converges in <= 2*log2(n) rounds —
    the whole point of the alternating-star variant (min-label would
    need ~1000 rounds here)."""
    n = 1000
    nodes = [f"d{i:05d}" for i in range(n)]
    edges = list(zip(nodes, nodes[1:]))
    rounds: list[int] = []
    labels = resolve_labels_star(_ids(spark, nodes), _pairs(spark, edges), rounds)
    got = {r["node"]: r["lab"] for r in labels.collect()}
    assert got == {m: nodes[0] for m in nodes}
    assert rounds[0] <= 2 * math.ceil(math.log2(n)), rounds


def test_star_matches_minlabel_and_unionfind_random(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(90)]
    ids, pairs = _ids(spark, nodes), _pairs(spark, edges)
    want = _union_find(nodes, edges)
    star = {r["node"]: r["lab"] for r in resolve_labels_star(ids, pairs).collect()}
    prop = {r["node"]: r["lab"] for r in resolve_labels(ids, pairs).collect()}
    assert star == want
    assert prop == want


def test_star_no_edges_and_self_pairs(spark):
    nodes = ["a", "b", "c"]
    labels = resolve_labels_star(_ids(spark, nodes), _pairs(spark, []))
    assert {r["node"]: r["lab"] for r in labels.collect()} == {
        "a": "a", "b": "b", "c": "c"
    }


def test_minlabel_raises_past_cap(spark, monkeypatch):
    """min-label propagation REFUSES (raises) when a component's
    diameter exceeds its round cap instead of silently returning
    under-propagated labels — the failure mode that motivated the
    star resolver (a 20-diameter random graph used to return wrong
    minima under the old silent 15-round cap)."""
    import kinesis_s3_spark.operators.dedup as dd
    import pytest

    monkeypatch.setattr(dd, "_CLUSTER_MAX_ITERS", 4)
    nodes = [f"p{i:02d}" for i in range(12)]
    edges = list(zip(nodes, nodes[1:]))
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_labels(_ids(spark, nodes), _pairs(spark, edges)).collect()


def test_star_steps_preserve_components(spark):
    """One large-star and one small-star step each keep the component
    structure intact (spot-check on a two-component graph)."""
    edges = [("b", "a"), ("c", "b"), ("e", "d")]
    e = spark.createDataFrame(edges, "a string, b string")
    for step in (_large_star, _small_star):
        out = [(r["a"], r["b"]) for r in step(e).collect()]
        comp = _union_find(["a", "b", "c", "d", "e"], out)
        assert comp == _union_find(["a", "b", "c", "d", "e"], edges)


def test_hybrid_matches_unionfind_random_and_deep(spark):
    """resolve_components (the production resolver): min-label head +
    star fallback must equal union-find on a random graph (deep
    components force the fallback path) AND on a planted deep chain
    (pure fallback), AND on a shallow clique set (pure head path)."""
    rng = random.Random(11)
    nodes = [f"h{i:03d}" for i in range(100)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(70)]
    want = _union_find(nodes, edges)
    got = {r["node"]: r["lab"] for r in
           resolve_components(_ids(spark, nodes), _pairs(spark, edges)).collect()}
    assert got == want

    chain = [f"c{i:03d}" for i in range(64)]
    cedges = list(zip(chain, chain[1:]))
    got = {r["node"]: r["lab"] for r in
           resolve_components(_ids(spark, chain), _pairs(spark, cedges)).collect()}
    assert got == {m: chain[0] for m in chain}

    cliq = [("k0", "k1"), ("k1", "k2"), ("k0", "k2"), ("k3", "k4")]
    knodes = ["k0", "k1", "k2", "k3", "k4", "k5"]
    got = {r["node"]: r["lab"] for r in
           resolve_components(_ids(spark, knodes), _pairs(spark, cliq)).collect()}
    assert got == _union_find(knodes, cliq)
