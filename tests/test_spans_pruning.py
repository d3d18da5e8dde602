"""Span enumeration (A7/P4) and beam pruning (M4/K7/K8) semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark.operators import pruning as PR
from dygiepp_spark.operators import spans as SP


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, None) for (c, i, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_enumerate_spans_count_closed_form(spark):
    # n=20 tokens, W=8: n*W - W*(W-1)/2 = 160 - 28 = 132
    t = _turns(spark, [("d", 0, " ".join(["tok"] * 20))])
    spans = SP.enumerate_spans(t, max_width=8)
    assert spans.count() == 132
    # n=5 < W: n*(n+1)/2 = 15
    t2 = _turns(spark, [("d", 0, " ".join(["tok"] * 5))])
    assert SP.enumerate_spans(t2, max_width=8).count() == 15


def test_enumerate_spans_inclusive_bounds(spark):
    t = _turns(spark, [("d", 0, "a b c")])
    got = {
        (r["start"], r["end"])
        for r in SP.enumerate_spans(t, max_width=2).collect()
    }
    assert got == {(0, 0), (0, 1), (1, 1), (1, 2), (2, 2)}


def test_width_filter(spark):
    t = _turns(spark, [("d", 0, " ".join(["tok"] * 10))])
    spans = SP.enumerate_spans(t, max_width=10)
    assert SP.filter_span_width(spans, 3).count() == 10 + 9 + 8


def test_topk_keeps_k_and_at_least_one(spark):
    df = spark.createDataFrame(
        [("d", 0, i, i, float(i)) for i in range(10)],
        "conv_id string, turn_idx int, start int, end int, score double",
    )
    kept = PR.topk_per_group(df, ["conv_id", "turn_idx"], "score", 3).collect()
    assert sorted(r["start"] for r in kept) == [7, 8, 9]
    # k computed as 0 still keeps one ("always keep at least one item")
    kept1 = PR.topk_per_group(df, ["conv_id", "turn_idx"], "score", 0).collect()
    assert [r["start"] for r in kept1] == [9]


def test_beam_prune_k_formula_and_cap(spark):
    # 20 tokens, 0.3 spans/word -> ceil(6) = 6; with cap 4 -> 4
    df = spark.createDataFrame(
        [("d", 0, i, i, float(i), 20) for i in range(30)],
        "conv_id string, turn_idx int, start int, end int, score double, n_tokens int",
    )
    assert PR.beam_prune_spans(df, 0.3).count() == 6
    assert PR.beam_prune_spans(df, 0.3, hard_cap=4).count() == 4


def test_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("d", 0, i, i, 1.0) for i in range(5)],
        "conv_id string, turn_idx int, start int, end int, score double",
    )
    kept = PR.topk_per_group(df, ["conv_id", "turn_idx"], "score", 2).collect()
    # equal scores: first occurrences (textual order) win
    assert sorted(r["start"] for r in kept) == [0, 1]


def test_global_topk_extends_through_ties(spark):
    df = spark.createDataFrame(
        [(i, [0.9, 0.8, 0.8, 0.8, 0.1][i]) for i in range(5)],
        "id int, conf double",
    )
    kept = PR.global_topk_with_ties(df, "conf", 2)
    # rank()<=2: 0.9 (rank 1) + all three 0.8 (rank 2) = 4 rows
    assert kept.count() == 4


def test_best_per_span(spark):
    df = spark.createDataFrame(
        [
            ("d", 0, 1, 2, "A", 0.9),
            ("d", 0, 1, 2, "B", 0.7),
            ("d", 0, 3, 4, "C", 0.5),
        ],
        "conv_id string, turn_idx int, start int, end int, label string, score double",
    )
    got = {
        (r["start"], r["label"])
        for r in PR.best_per_span(df, score_col="score").collect()
    }
    assert got == {(1, "A"), (3, "C")}


def test_global_topk_threshold_equals_rank_window(spark):
    # adversarial tie structure incl. duplicate scores straddling the cut
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [(i, float(s)) for i, s in enumerate(
        [9, 7, 7, 7, 5, 5, 4, 3, 3, 3, 3, 2, 1, 1, 0]
    )]
    df = spark.createDataFrame(rows, "id int, conf double")
    for k in (1, 2, 3, 4, 7, 11, 15, 100):
        got = {r["id"] for r in PR.global_topk_with_ties(df, "conf", k).collect()}
        w = Window.orderBy(F.col("conf").desc())
        ref = {
            r["id"]
            for r in df.withColumn("_rk", F.rank().over(w))
            .filter(F.col("_rk") <= k)
            .collect()
        }
        assert got == ref, f"k={k}"


def test_kth_score_threshold_empty_frame(spark):
    df = spark.createDataFrame([], "id int, conf double")
    assert PR.global_topk_with_ties(df, "conf", 5).count() == 0
