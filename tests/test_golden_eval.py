"""Level-3 golden-output regression: run OUR eval operators on the
reference's own released gold/pred event TSVs
(/root/reference/event_pred/test-{gold,predicted}.tsv — the files
eval_events.py:51-55 consumes) and pin the resulting P/R/F1.

The frozen numbers were computed once with this code; any drift in the
matching semantics (K2/K3/K5 joins, dedup rules, safe-div F1) breaks the
assert. Reference data is read in place (read-only), never copied.
"""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

from dygiepp_spark.operators import kg_eval as KE

GOLD_TSV = "/root/reference/event_pred/test-gold.tsv"
PRED_TSV = "/root/reference/event_pred/test-predicted.tsv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLD_TSV) and os.path.exists(PRED_TSV)),
    reason="reference golden TSVs not present",
)

_G = "conv_id string, sent_text string, arg0 string, event_type string, arg1 string"
_P = _G + ", s1 double, s2 double, s3 double, p1 double, p2 double, p3 double"


@pytest.fixture(scope="module")
def gold(spark):
    return spark.read.option("sep", "\t").schema(_G).csv(GOLD_TSV).cache()


@pytest.fixture(scope="module")
def pred(spark):
    return spark.read.option("sep", "\t").schema(_P).csv(PRED_TSV).cache()


def test_event_tuple_exact_match_frozen(spark, gold, pred):
    out = KE.ie_eval_event(pred, gold).collect()[0]
    assert (out["tp"], out["fp"], out["fn"]) == (91, 225, 343)
    assert out["precision"] == pytest.approx(0.2879746835443038)
    assert out["recall"] == pytest.approx(0.20967741935483872)
    assert out["f1"] == pytest.approx(0.24266666666666664)


def test_relation_substring_match_frozen(spark, gold, pred):
    p = pred.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    g = gold.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    out = KE.ie_eval(p, g, "substring").collect()[0]
    assert (out["n_pred"], out["n_gold"]) == (294, 434)
    assert (out["tp"], out["tp_recall"]) == (169, 146)
    assert out["f1"] == pytest.approx(0.4244259052206072)


def test_substring_recall_dominates_exact(spark, gold, pred):
    """Sanity property from the reference's metric grid: looser matching
    can only raise TP (eval_utils.py:191-199 substring vs exact)."""
    p = pred.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    g = gold.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    exact = KE.ie_eval(p, g, "exact").collect()[0]
    sub = KE.ie_eval(p, g, "substring").collect()[0]
    assert sub["tp"] >= exact["tp"]
    assert sub["tp_recall"] >= exact["tp_recall"]


def test_relation_rouge_match_frozen(spark, gold, pred):
    """K1 rouge-L on the reference's real multi-word spans — full-LCS DP
    path (not the single-token degeneracy of the synthetic corpus)."""
    p = pred.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    g = gold.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    out = KE.ie_eval(p, g, "rouge").collect()[0]
    assert (out["tp"], out["tp_recall"]) == (162, 136)
    assert out["precision"] == pytest.approx(0.5510204081632653)
    assert out["recall"] == pytest.approx(0.31336405529953915)
    assert out["f1"] == pytest.approx(0.3995212708083995)


def test_relation_head_match_frozen(spark, gold, pred):
    p = pred.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    g = gold.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    out = KE.ie_eval(p, g, "head").collect()[0]
    assert (out["tp"], out["tp_recall"]) == (135, 125)
    assert out["f1"] == pytest.approx(0.35399622404027686)


def test_rouge_recall_between_exact_and_substring(spark, gold, pred):
    # sanity ordering: rouge@0.3 is looser than exact, usually tighter
    # than substring on multi-word spans
    p = pred.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    g = gold.select(
        "conv_id", "arg0", "arg1",
        F.col("event_type").alias("label"), F.lit(1.0).alias("conf"),
    )
    exact = KE.ie_eval(p, g, "exact").collect()[0]
    rouge = KE.ie_eval(p, g, "rouge").collect()[0]
    assert rouge["tp"] >= exact["tp"]
