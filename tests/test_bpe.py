"""BPE merge training: hand-verifiable semantics on a tiny corpus —
pair counting weighted by word frequency, deterministic tie-break, and
GREEDY left-to-right non-overlapping merging."""

from __future__ import annotations

from kinesis_s3_spark.operators.bpe import train_bpe


def test_bpe_hand_corpus(spark):
    # word freqs: "abab" x3, "ab" x2, "b" x1
    docs = spark.createDataFrame(
        [("abab abab ab",), ("abab ab b",)], "text string"
    )
    merges = train_bpe(docs, 2)
    # round 1 pairs: (a,b): 2*3 + 1*2 = 8 ; (b,a): 1*3 = 3 → merge (a,b)
    assert merges[0] == (1, "a", "b", 8)
    # after merge: "ab ab" x3, "ab" x2, "b" x1 → round 2: (ab,ab): 3
    assert merges[1] == (2, "ab", "ab", 3)


def test_bpe_greedy_nonoverlap(spark):
    # "aaa" x1: pairs (a,a): 2 occurrences but merging is greedy
    # left-to-right → "aa a"; round 2 top pair is (aa, a) with count 1
    docs = spark.createDataFrame([("aaa",)], "text string")
    merges = train_bpe(docs, 2)
    assert merges[0] == (1, "a", "a", 2)
    assert merges[1] == (2, "aa", "a", 1)


def test_bpe_tiebreak_lexicographic(spark):
    # "xy" and "yz" each once: (x,y) and (y,z) both count 1 →
    # lexicographic (l, r) tie-break picks (x, y)
    docs = spark.createDataFrame([("xy yz",)], "text string")
    merges = train_bpe(docs, 1)
    assert merges[0] == (1, "x", "y", 1)
