"""KG triple-evaluation operators (the fork's eval layer, SURVEY.md §2.6).

Re-expressed from /root/reference/eval_utils.py as pure DataFrame ops:

* K1 span matching — ``exact`` (lower+trim equality) and ``substring``
  (either-contains) metrics (eval_utils.py:180-263). ``jaccard`` (token-set
  overlap >= theta) is exposed as a predicate builder too.
* K2 relation matching — arg0 AND arg1 match AND label match
  (eval_utils.py:283-335; ``collapse=False`` keeps label equality).
* K3 ie_eval — global sort by confidence desc, cut at topK (head, not
  rank-ties: ``predrels[:topK]``, eval_utils.py:783-785), per-doc
  cross-product match, dedup of matched pred keys (``good_preds``) and
  matched gold keys (``found_from_gold``); P = TP/topK,
  R = TP_recall/n_gold (eval_utils.py:853-863).
* K4 ie_span_eval — argument-level P/R/F1 ignoring pairing
  (eval_utils.py:620-682).
* K6 transitive closure of gold — add (a, c) when (a, b), (b, c) share a
  doc; confidence = product; dedup on (doc, a, c)
  (``find_transivity_relations``, eval_utils.py:466-496). The reference
  loops to fixpoint with order-dependent first-wins confidence; we run a
  BOUNDED number of expansion rounds with max-confidence dedup so the
  result is deterministic and engine-portable.
* G1 micro P/R/F1 — TP/FP/FN sums then safe-div F1
  (dygie/training/f1.py:6-17).

Scale notes: every join here is an equi-join on conv_id (plus arg
predicates evaluated post-probe); gold/pred sides are triple tables (tiny
relative to the corpus). The global top-k sort in K3 is the only global
exchange — a rank over one window, and only when topK is requested.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from dygiepp_spark.operators.extraction import (
    detect_mentions,
    positional_beam,
    relation_pairs,
)

# --------------------------------------------------------------------------
# K1 span-match predicates
# --------------------------------------------------------------------------

def match_exact(a: Column, b: Column) -> Column:
    """K1 'exact': case-insensitive strip equality (eval_utils.py:183-189)."""
    return F.lower(F.trim(a)) == F.lower(F.trim(b))


def match_substring(a: Column, b: Column) -> Column:
    """K1 'substring': either side contains the other (eval_utils.py:191-199)."""
    la, lb = F.lower(F.trim(a)), F.lower(F.trim(b))
    return la.contains(lb) | lb.contains(la)


def match_jaccard(a: Column, b: Column, thresh: float = 0.5) -> Column:
    """K1 'jaccard': token-set overlap ratio >= thresh (eval_utils.py:201-215)."""
    ta = F.array_distinct(F.split(F.lower(F.trim(a)), " "))
    tb = F.array_distinct(F.split(F.lower(F.trim(b)), " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return (inter / F.greatest(union, F.lit(1.0))) >= thresh


_METRICS = {
    "exact": match_exact,
    "substring": match_substring,
    "jaccard": match_jaccard,
}


def relation_match_cond(metric: str = "exact", collapse: bool = False) -> list[Column]:
    """K2: join predicate pred x gold — arg0, arg1 (and label unless
    collapsed) must match under the chosen span metric."""
    m = _METRICS[metric]
    cond = [
        F.col("p.conv_id") == F.col("g.conv_id"),
        m(F.col("p.arg0"), F.col("g.arg0")),
        m(F.col("p.arg1"), F.col("g.arg1")),
    ]
    if not collapse:
        cond.append(F.col("p.label") == F.col("g.label"))
    return cond


# --------------------------------------------------------------------------
# gold derivation (deterministic rule-gold for the synthetic corpus)
# --------------------------------------------------------------------------

def gold_triples(turns: DataFrame, max_dist: int = 3) -> DataFrame:
    """Deterministic 'gold' triples: the tight-distance subset of the rule
    extractor, deduped per (conv, arg0, arg1) keeping the first occurrence's
    label — mirroring ``goldrels.drop_duplicates(subset=["id","arg0","arg1"])``
    (eval_utils.py:755-756) which keeps the first row in document order.
    """
    from dygiepp_spark.operators.extraction import _beam_filter

    mentions = _beam_filter(
        detect_mentions(turns, with_context=True), 0.5, None, "ceil", "start"
    ).drop("text", "n_tokens")
    pairs = relation_pairs(mentions, max_dist)
    w = Window.partitionBy("conv_id", "arg0", "arg1").orderBy(
        "turn_idx", "s1", "s2"
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "arg0", "arg1", "label", "conf")
    )


# --------------------------------------------------------------------------
# K3 / K4 / G1
# --------------------------------------------------------------------------

def _safe_f1(p: Column, r: Column) -> Column:
    return F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))


def ie_eval(
    pred: DataFrame,
    gold: DataFrame,
    metric: str = "exact",
    topk: int | None = None,
) -> DataFrame:
    """K3: global P/R/F1 of predicted triples vs gold (eval_utils.py:753-863).

    ``pred``: (conv_id, arg0, arg1, label, conf); ``gold``: same minus conf.
    Returns ONE row (n_pred, n_gold, tp, tp_recall, precision, recall, f1).
    P = TP / n_pred_kept (the reference's TP/(TP+FP) with FP = topK - TP);
    R = TP_recall / n_gold.
    """
    if topk is not None:
        w = Window.orderBy(
            F.col("conf").desc(), "conv_id", "arg0", "arg1", "label"
        )
        pred = pred.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= topk
        ).drop("_rn")
    # four scalar actions follow (tp, tp_recall, n_pred, n_gold) — pin the
    # upstream extraction once instead of re-running it per action
    pred = pred.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    gold = gold.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    p = pred.alias("p")
    g = gold.alias("g")
    cond = relation_match_cond(metric)
    matches = p.join(g, on=cond)

    tp = matches.select("p.conv_id", "p.arg0", "p.arg1").distinct().count()
    tp_recall = matches.select("g.conv_id", "g.arg0", "g.arg1").distinct().count()
    n_pred = pred.select("conv_id", "arg0", "arg1").distinct().count()
    n_gold = g.distinct().count()

    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(n_pred, n_gold, tp, tp_recall)],
        "n_pred bigint, n_gold bigint, tp bigint, tp_recall bigint",
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("n_pred"), F.lit(1)).cast("double")
    rec = F.col("tp_recall").cast("double") / F.greatest(F.col("n_gold"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def ie_span_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """K4 (eval_utils.py:620-682): argument-span-level P/R/F1 ignoring
    pairing — explode arg0/arg1 to (conv, text) sets on both sides."""

    def spans_of(df: DataFrame) -> DataFrame:
        return (
            df.select("conv_id", F.col("arg0").alias("span"))
            .unionByName(df.select("conv_id", F.col("arg1").alias("span")))
            .distinct()
        )

    ps = spans_of(pred).localCheckpoint(eager=False)
    gs = spans_of(gold).localCheckpoint(eager=False)
    tp = ps.join(gs, ["conv_id", "span"]).count()
    n_p, n_g = ps.count(), gs.count()
    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(n_p, n_g, tp)], "n_pred_spans bigint, n_gold_spans bigint, tp bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("n_pred_spans"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("n_gold_spans"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def micro_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """G1 (dygie/training/ner_metrics.py:22-64 + f1.py:6-17): micro P/R/F1
    with exact (arg0, arg1, label) matching, computed distributed — per-conv
    TP via join, global sums, safe division. One output row."""
    p = pred.select("conv_id", "arg0", "arg1", "label").distinct().localCheckpoint(
        eager=False
    )
    g = gold.select("conv_id", "arg0", "arg1", "label").distinct().localCheckpoint(
        eager=False
    )
    tp = p.join(g, ["conv_id", "arg0", "arg1", "label"]).count()
    n_p, n_g = p.count(), g.count()
    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(tp, n_p - tp, n_g - tp)], "tp bigint, fp bigint, fn bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


# --------------------------------------------------------------------------
# K5 event-tuple eval + G4 argument multiplicity
# --------------------------------------------------------------------------

def ie_eval_event(pred_bin: DataFrame, gold_bin: DataFrame) -> DataFrame:
    """K5 (eval_utils.py:866-940): (arg0, trigger, arg1) tuple matching —
    match requires arg0, arg1 and the trigger's event type to agree (the
    reference accepts label-or-trigger-text; our event types ARE derived
    from trigger text, so one equality covers both). One output row."""
    key = ["conv_id", "arg0", "event_type", "arg1"]
    p = pred_bin.select(*key).distinct().localCheckpoint(eager=False)
    g = gold_bin.select(*key).distinct().localCheckpoint(eager=False)
    tp = p.join(g, key).count()
    n_p, n_g = p.count(), g.count()
    spark = pred_bin.sparkSession
    row = spark.createDataFrame(
        [(tp, n_p - tp, n_g - tp)], "tp bigint, fp bigint, fn bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def arg_multiplicity(events: DataFrame) -> DataFrame:
    """G4 (event_metrics.py:120-157): fraction of argument spans used by
    more than one trigger. One aggregation + one row out."""
    per_span = events.groupBy("conv_id", "turn_idx", "arg_start", "arg_end").agg(
        F.count_distinct("trigger_ix").alias("nt")
    )
    return per_span.agg(
        F.count(F.lit(1)).alias("n_args"),
        F.sum(F.when(F.col("nt") > 1, 1).otherwise(0)).cast("bigint").alias("n_shared"),
    ).select(
        "n_args",
        "n_shared",
        (
            F.col("n_shared").cast("double")
            / F.greatest(F.col("n_args"), F.lit(1)).cast("double")
        ).alias("shared_frac"),
    )


# --------------------------------------------------------------------------
# G7 greedy one-to-one matching (diff / annotation_eval)
# --------------------------------------------------------------------------

def greedy_match(
    pred: DataFrame, gold: DataFrame, metric: str = "substring"
) -> DataFrame:
    """G7 (eval_utils.py:498-563 ``diff`` / :567-617 ``annotation_eval``):
    match pred and gold triples one-to-one with greedy dedup bookkeeping
    (``seen_pred``/``seen_gold``), under a fuzzy span metric that makes the
    candidate graph many-to-many.

    Deterministic greedy order = lexicographic candidate key; pass 1 keeps
    the first gold per pred (window rank), pass 2 keeps the first surviving
    pred per gold — exactly the sequential first-wins scan, expressed as
    two ranking windows. Output: the matched pairs.
    """
    m = _METRICS[metric]
    p = pred.select(
        "conv_id",
        F.col("arg0").alias("p_arg0"),
        F.col("arg1").alias("p_arg1"),
        F.col("label").alias("p_label"),
    ).distinct().alias("p")
    g = gold.select(
        "conv_id",
        F.col("arg0").alias("g_arg0"),
        F.col("arg1").alias("g_arg1"),
        F.col("label").alias("g_label"),
    ).distinct().alias("g")
    cand = p.join(
        g,
        on=[
            F.col("p.conv_id") == F.col("g.conv_id"),
            m(F.col("p_arg0"), F.col("g_arg0")),
            m(F.col("p_arg1"), F.col("g_arg1")),
            F.col("p_label") == F.col("g_label"),
        ],
    ).select(
        F.col("p.conv_id").alias("conv_id"),
        "p_arg0", "p_arg1", "p_label", "g_arg0", "g_arg1", "g_label",
    )
    w_pred = Window.partitionBy("conv_id", "p_arg0", "p_arg1", "p_label").orderBy(
        "g_arg0", "g_arg1", "g_label"
    )
    first_per_pred = (
        cand.withColumn("_r", F.row_number().over(w_pred))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    w_gold = Window.partitionBy("conv_id", "g_arg0", "g_arg1", "g_label").orderBy(
        "p_arg0", "p_arg1", "p_label"
    )
    return (
        first_per_pred.withColumn("_r", F.row_number().over(w_gold))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


# --------------------------------------------------------------------------
# K6 transitive closure
# --------------------------------------------------------------------------

def transitive_closure(
    gold: DataFrame, rounds: int = 2
) -> DataFrame:
    """K6 (eval_utils.py:466-496): within each conv add (a, c) for every
    (a, b), (b, c); conf = product. ``rounds`` bounded expansion rounds with
    max-conf dedup per (conv, a, c) — deterministic (the reference's
    while-loop confidence is insertion-order-dependent; max over paths is
    the order-free version and agrees when there is a single path).

    Each round = one self-equi-join on (conv_id, join surface) + one
    aggregate; localCheckpoint between rounds cuts lineage like the CC loop.
    """
    closure = gold.select("conv_id", "arg0", "arg1", "conf")
    for _ in range(rounds):
        a = closure.alias("a")
        b = closure.alias("b")
        new = a.join(
            b,
            on=[
                F.col("a.conv_id") == F.col("b.conv_id"),
                F.col("a.arg1") == F.col("b.arg0"),
            ],
        ).select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.arg0").alias("arg0"),
            F.col("b.arg1").alias("arg1"),
            (F.col("a.conf") * F.col("b.conf")).alias("conf"),
        )
        closure = (
            closure.unionByName(new)
            .groupBy("conv_id", "arg0", "arg1")
            .agg(F.max("conf").alias("conf"))
        ).localCheckpoint(eager=False)
    return closure
