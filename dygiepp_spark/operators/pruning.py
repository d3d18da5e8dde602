"""Beam pruning and top-k operators (M4 / K7 / K8).

The single most important algorithmic device in the reference: score spans,
keep ``k = ceil(spans_per_word * sentence_length)`` per sentence, then
re-sort the survivors into ascending textual order
(``Pruner.forward``, /root/reference/dygie/models/entity_beam_pruner.py:104-192
— the ascending re-sort is the ``torch.sort(top_indices)`` at :171-173).
Without it, span-pair ops are O(n^2 W^2); with it they are O(k^2).

In Spark this is a ranking window per group — one shuffle on the group key,
then ``row_number() <= k``. Sentence-level groups are uniform (bounded
sentence length) so the window has no skew; doc-level beams (coref,
spans_per_word over the whole doc) inherit the conversation skew and are
run after :func:`dygiepp_spark.operators.doc_assembly.assign_chunks`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k_col,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """M4: keep the top ``k`` rows per group by score (desc), k per-group.

    ``k_col`` may be a Column (e.g. ``ceil(0.5 * n_tokens)``) or an int.
    Always keeps at least one row per group (entity_beam_pruner.py:139:
    "Always keep at least one item"). Ties are broken by ``tiebreak_cols``
    (default: span order) so results are deterministic — the reference
    relies on torch.topk's stable index order, which for our purposes is
    "first occurrence wins".
    """
    if isinstance(k_col, int):
        k_col = F.lit(k_col)
    tiebreak = tiebreak_cols or ["start", "end"]
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") <= F.greatest(k_col, F.lit(1))))
        .drop("_rn")
    )


def beam_prune_spans(
    spans: DataFrame,
    spans_per_word: float,
    group_cols: list[str] = ("conv_id", "turn_idx"),
    score_col: str = "score",
    len_col: str = "n_tokens",
    hard_cap: int | None = None,
) -> DataFrame:
    """The reference's span beam: k = ceil(spans_per_word * sentence_len),
    optionally capped (events: triggers 0.3/word cap 15, args 0.8/word cap
    30 — events.py:133-152; relations 0.5/word — template.libsonnet:99).

    Survivors are returned in ascending (start, end) order per group — the
    ascending re-sort that keeps downstream pair enumeration in textual
    order (entity_beam_pruner.py:171-173). In a DataFrame the "order" is
    carried by the sort keys, materialized by any downstream
    ``sort_array``/window consumer rather than a global sort.
    """
    k = F.ceil(F.lit(spans_per_word) * F.col(len_col))
    if hard_cap is not None:
        k = F.least(k, F.lit(hard_cap))
    return topk_per_group(spans, list(group_cols), score_col, k)


def kth_score_threshold(
    df: DataFrame, score_col: str, k: int, num_partitions: int | None = None
) -> DataFrame:
    """Distributed k-th-highest-score threshold: one row ``(_thr)`` where
    ``_thr`` = the smallest score s such that fewer than ``k`` rows score
    strictly above s (NULL when ``df`` is empty).

    ``filter(score >= _thr)`` is then EXACTLY ``rank() <= k``: a row
    survives rank() <= k iff #(rows with strictly greater score) < k, and
    that count is monotone in the score, so the cut is a threshold.

    Plan: no unpartitioned window over the data — per-score counts
    (map-side combinable agg), range-partitioned descending, per-partition
    prefix sums, plus one tiny collect (one row per partition) for the
    cross-partition offsets — the same two-pass prefix-sum pattern as
    :func:`dygiepp_spark.operators.collate.collate`. Work through any
    single task is O(distinct-scores / partitions).
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    counts = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("_n"))
    srt = (
        counts.repartitionByRange(p, F.col(score_col).desc())
        .sortWithinPartitions(F.col(score_col).desc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids for both passes
    )
    wloc = Window.partitionBy("_pid").orderBy(F.col(score_col).desc())
    loc = srt.withColumn("_cum_in", F.sum("_n").over(wloc))
    totals = sorted(
        srt.groupBy("_pid").agg(F.sum("_n").alias("_pn")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, off = [], 0
    for r in totals:
        offsets.append((r["_pid"], off))
        off += r["_pn"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off bigint")
    cum = loc.join(F.broadcast(off_df), "_pid")
    # rows strictly above this score = _off + _cum_in - _n
    eligible = cum.filter(F.col("_off") + F.col("_cum_in") - F.col("_n") < k)
    return eligible.agg(F.min(score_col).alias("_thr"))


def global_topk_with_ties(df: DataFrame, score_col: str, k: int) -> DataFrame:
    """K7 (``Dataset.prune``, dygie_visualize_util.py:63-148): global top-k
    by confidence where the cut extends through ties — ``rank()`` not
    ``row_number()`` semantics.

    Scale-safe formulation: a ``Window.orderBy(score)`` with no
    partitionBy funnels the whole frame through ONE task; instead the
    k-th score is found distributively (:func:`kth_score_threshold`) and
    the cut is a broadcast-threshold filter evaluated at the scan — the
    same output set, including tie extension, with no global exchange.
    """
    thr = kth_score_threshold(df, score_col, k)
    return df.join(
        F.broadcast(thr), on=F.col(score_col) >= F.col("_thr"), how="inner"
    ).drop("_thr")


def best_per_span(
    df: DataFrame,
    span_cols: list[str] = ("conv_id", "turn_idx", "start", "end"),
    score_col: str = "score",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """K8 (dygie_visualize_util.py:121-143): among duplicate predictions for
    the same span keep the max-score one. Deterministic tiebreak on label."""
    tiebreak = tiebreak_cols or ["label"]
    w = Window.partitionBy(*span_cols).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak]
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
