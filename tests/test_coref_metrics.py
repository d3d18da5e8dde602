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


# --------------------------------------------------------------------------
# CEAF-e (round 2)
# --------------------------------------------------------------------------

def _brute_force_assignment(w):
    """Max-weight matching by permutation enumeration (exact, tiny inputs)."""
    import itertools
    from fractions import Fraction

    n_r, n_c = len(w), len(w[0]) if w else 0
    best, best_total = [], Fraction(0)
    cols = list(range(n_c))
    for r_sel in range(min(n_r, n_c), -1, -1):
        for rows in itertools.combinations(range(n_r), r_sel):
            for perm in itertools.permutations(cols, r_sel):
                total = sum((w[i][j] for i, j in zip(rows, perm)), Fraction(0))
                if total > best_total:
                    best_total = total
                    best = [(i, j) for i, j in zip(rows, perm) if w[i][j] > 0]
    return best_total, sorted(best)


def test_hungarian_matches_bruteforce_nonlaminar():
    from fractions import Fraction

    from dygiepp_spark.kernels.assignment import max_weight_assignment

    F2 = Fraction
    cases = [
        # non-laminar: pred clusters straddle gold clusters
        [[F2(1, 2), F2(2, 3)], [F2(2, 3), F2(1, 2)]],
        [[F2(3, 4), F2(1, 4), F2(0)], [F2(1, 4), F2(3, 4), F2(1, 2)]],
        [[F2(1, 3)]],
        [[F2(0), F2(0)], [F2(0), F2(1, 5)]],
        # adversarial: greedy per-column argmax is SUBOPTIMAL here
        [[F2(10, 10), F2(9, 10)], [F2(9, 10), F2(0)]],
    ]
    for w in cases:
        got = max_weight_assignment(w)
        bf_total, _ = _brute_force_assignment(w)
        got_total = sum((w[i][j] for i, j in got), Fraction(0))
        assert got_total == bf_total, w


def test_ceafe_stats_split_cluster(spark):
    gold = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 0), ("c", 3, 3)])
    pred = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2), ("c", 3, 2)])
    rows = {
        (r["gc"]): (r["phi_num"], r["phi_den"])
        for r in CO.ceafe_stats(pred, gold).collect()
    }
    # optimal alignment: gold 0 -> pred {0,1} (phi 4/5), gold 3 -> pred {2,3}
    # (phi 2/3); aligning gold 0 to pred {2,3} instead scores 2/5 + 0 worse
    assert rows == {0: (4, 5), 3: (2, 3)}


def test_ceafe_perfect(spark):
    c = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2)])
    p, r, f1 = CO.ceafe_score(c, c)
    assert p == 1.0 and r == 1.0 and f1 == 1.0


def test_conll_score_triple(spark):
    gold = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 0)])
    pred = _cl(spark, [("c", 0, 0), ("c", 1, 0), ("c", 2, 2)])
    out = CO.conll_score(pred, gold)
    assert set(out) == {"muc_f1", "b3_f1", "ceafe_f1", "conll_f1"}
    assert out["conll_f1"] == pytest.approx(
        (out["muc_f1"] + out["b3_f1"] + out["ceafe_f1"]) / 3
    )


def test_b3_scores_distributed_equals_sequential_fold(spark):
    gold = _cl(
        spark,
        [("c", i, i // 3) for i in range(12)] + [("d", i, i // 2) for i in range(8)],
    )
    pred = _cl(
        spark,
        [("c", i, i // 4) for i in range(12)] + [("d", i, i // 5) for i in range(8)],
    )
    counts = CO.b3_counts(pred, gold)
    p, r, f1 = CO.b3_scores(counts)
    rows = counts.collect()
    n = sum(x["n_pg"] for x in rows)
    p_seq = sum(x["n_pg"] ** 2 / x["n_p"] for x in rows) / n
    r_seq = sum(x["n_pg"] ** 2 / x["n_g"] for x in rows) / n
    assert p == pytest.approx(p_seq, rel=1e-12)
    assert r == pytest.approx(r_seq, rel=1e-12)
