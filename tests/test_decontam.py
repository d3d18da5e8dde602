"""Benchmark-decontamination operator tests (operators/decontam.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark.operators import decontam as DC


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_doc_ngrams_distinct_within_doc(spark):
    df = _df(spark, [(1, "a b c a b c"), (2, "x y")])
    grams = sorted(
        (r.doc_id, r.gram) for r in DC.doc_ngrams(df, n=3).collect()
    )
    # "a b c a b c" 3-grams: abc, bca, cab, abc -> distinct = 3; doc 2 too short
    assert grams == [(1, "a b c"), (1, "b c a"), (1, "c a b")]


def test_decontaminate_flags_overlap_only(spark):
    corpus = _df(
        spark,
        [
            (1, "the quick brown fox jumps"),  # shares "quick brown fox"
            (2, "totally unrelated clean words here"),
            (3, "a b"),  # too short for any 3-gram
        ],
    )
    bench = _df(spark, [(100, "my quick brown fox benchmark")])
    out = {r.doc_id: r for r in DC.decontaminate(corpus, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert r1.contaminated and r1.n_hit_grams == 1 and r1.n_grams == 3
    assert r1.contam_frac == 1.0 / 3.0
    assert not out[2].contaminated and out[2].n_hit_grams == 0
    r3 = out[3]
    assert (r3.n_grams, r3.n_hit_grams, r3.contam_frac, r3.contaminated) == (
        0, 0, 0.0, False,
    )


def test_decontaminate_benchmark_side_is_broadcast(spark):
    corpus = _df(spark, [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(50)])
    bench = _df(spark, [(999, "tok1 tok2 tok3")])
    plan = (
        DC.decontaminate(corpus, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
