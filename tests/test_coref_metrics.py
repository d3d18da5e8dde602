"""Unit tests for the G5 coref metrics (MUC / B-cubed)."""

from __future__ import annotations

import pytest

from dygiepp_spark.operators import coref as CO


def _cl(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, mention_ix int, cluster_id int"
    )


def test_muc_perfect(spark):
    c = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2)])
    out = CO.muc_score(c, c).collect()[0]
    assert out["precision"] == 1.0 and out["recall"] == 1.0 and out["f1"] == 1.0


def test_muc_split_cluster(spark):
    # gold: {0,1,2}; pred splits it into {0,1} and {2}
    gold = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 0)])
    pred = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2)])
    out = CO.muc_score(pred, gold).collect()[0]
    # recall: (3 - 2) / (3 - 1) = 0.5; precision: links in pred all correct = 1.0
    assert out["recall"] == 0.5
    assert out["precision"] == 1.0
    assert out["f1"] == pytest.approx(2 * 0.5 / 1.5)


def test_b3_counts_and_fold(spark):
    gold = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 0), ("c", 3, 3)])
    pred = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2), ("c", 3, 2)])
    counts = CO.b3_counts(pred, gold)
    rows = {(r["pc"], r["gc"]): (r["n_pg"], r["n_p"], r["n_g"]) for r in counts.collect()}
    assert rows == {(0, 0): (2, 2, 3), (2, 0): (1, 2, 3), (2, 3): (1, 2, 1)}
    p, r, f1 = CO.b3_scores(counts)
    # precision: (2*2/2 + 1*1/2 + 1*1/2) / 4 = 0.75
    assert p == pytest.approx(0.75)
    # recall: (4/3 + 1/3 + 1) / 4
    assert r == pytest.approx((4 / 3 + 1 / 3 + 1) / 4)


def test_global_vs_windowed_clusters_agree_on_dense(spark, sf_dir):
    """On the test corpus same-surface gaps never exceed the antecedent
    window, so the windowed rule and the unbounded rule must coincide —
    the controlled condition for the north-rule cluster equivalence."""
    from dygiepp_spark import tables as TT
    from dygiepp_spark.operators import extraction as EX

    mentions = EX.detect_mentions(
        TT.turns_from_documents(spark, sf_dir, with_ts=False)
    )
    pred = CO.coref_clusters(mentions).select("conv_id", "mention_ix", "cluster_id")
    gold = CO.coref_clusters_global(mentions).select(
        "conv_id", "mention_ix", "cluster_id"
    )
    out = CO.muc_score(pred, gold).collect()[0]
    assert out["f1"] >= 0.99
