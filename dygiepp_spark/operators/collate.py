"""A5 collate / A6 uncollate — length-sorted bin-packing of sentences into
bounded pseudo-documents (the reference's batch-shape/skew optimization,
/root/reference/scripts/data/shared/collate.py:26-105 and its inverse
uncollate.py:12-60).

Reference semantics: sort ALL sentences by length across documents, pack
greedily into pseudo-docs capped by ``max_spans_per_doc`` (cost heuristic
len^2, cap 50000) and ``max_sentences_per_doc`` (16); remember the
original keys so uncollate can restore grouping and order.

Spark formulation: a greedy sequential packer does not distribute, so the
pack is expressed with GLOBAL PREFIX SUMS over one total order — a turn's
bin key is (floor(prefix_cost / cost_cap), floor(prefix_count /
count_cap)); both components are non-decreasing along the order, so bins
are contiguous runs bounding both dimensions. This approximates greedy
first-fit (bins average slightly under cap). Cap guarantee, precisely:
the COUNT cap is exact (never more than ``max_sents`` turns per bin); the
COST cap is honored up to the last member's cost — a turn is assigned to
``floor(exclusive_prefix / cost_cap)``, so a bin's total may exceed
``cost_cap`` by at most ``max(cost)`` of its members (the reference greedy
instead closes a doc *before* exceeding). Downstream kernels that size
buffers must budget ``cost_cap + max_item_cost`` (the derived corpus's
turns are ~12 tokens, cost ~144, so the overshoot is negligible there);
callers needing a hard ceiling should pre-split outlier turns.

The prefix sums themselves are computed with the scalable two-pass
pattern, NOT an unpartitioned window (which would funnel the corpus
through one task):

1. ``repartitionByRange`` on the (unique) order key + per-partition
   window for local prefix sums;
2. per-partition totals (one tiny aggregate, collected: one row per
   partition) turned into broadcast offsets;
3. global prefix = partition offset + local prefix.

The reference instead sorts the whole corpus in memory (collate.py:60).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dygiepp_spark.operators.doc_assembly import with_token_counts

COST_CAP = 50_000
MAX_SENTS_PER_PSEUDO = 16

#: pseudo_doc_id = b_cost * _BIN_STRIDE + b_cnt (ids unique + ordered, not
#: dense — density is not needed by any consumer and would cost a window)
_BIN_STRIDE = 1_000_000_000


def collate(
    turns: DataFrame,
    cost_cap: int = COST_CAP,
    max_sents: int = MAX_SENTS_PER_PSEUDO,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every turn a pseudo_doc_id honoring both caps.

    Output: conv_id, turn_idx, text, n_tokens, cost, pseudo_doc_id, slot —
    slot is the turn's index inside its pseudo-doc. Deterministic: the
    order key (n_tokens, conv_id, turn_idx) is total, so prefix sums are
    independent of partition boundaries.
    """
    spark = turns.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    order_cols = ["n_tokens", "conv_id", "turn_idx"]

    t = with_token_counts(turns).withColumn(
        "cost", (F.col("n_tokens").cast("bigint") * F.col("n_tokens")).cast("bigint")
    )
    srt = (
        t.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    loc = srt.withColumn("_lrn", F.row_number().over(wloc)).withColumn(
        "_lcum",
        F.coalesce(
            F.sum("cost").over(wloc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    loc = loc.localCheckpoint(eager=True)  # pin partitioning for both passes

    totals = sorted(
        loc.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cost").alias("c"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    offsets, rn_off, cost_off = [], 0, 0
    for r in totals:
        offsets.append((r["_pid"], rn_off, cost_off))
        rn_off += r["n"]
        cost_off += r["c"]
    off_df = spark.createDataFrame(
        offsets, "_pid int, _rn_off bigint, _cost_off bigint"
    )

    g = loc.join(F.broadcast(off_df), "_pid").select(
        "conv_id",
        "turn_idx",
        "text",
        "n_tokens",
        "cost",
        (F.col("_rn_off") + F.col("_lrn")).alias("_rn"),
        (F.col("_cost_off") + F.col("_lcum")).alias("_cum"),
    )
    # integer division (`div`), not floor(double /): prefix costs overflow
    # the 2^53 double mantissa long before 10^12 turns
    binned = g.withColumn("_b_cost", F.expr(f"_cum div {cost_cap}")).withColumn(
        "_b_cnt", F.expr(f"(_rn - 1) div {max_sents}")
    )
    out = binned.withColumn(
        "pseudo_doc_id",
        (F.col("_b_cost") * F.lit(_BIN_STRIDE) + F.col("_b_cnt")).cast("bigint"),
    ).withColumn(
        "slot",
        F.row_number().over(
            Window.partitionBy("_b_cost", "_b_cnt").orderBy(*order_cols)
        )
        - 1,
    )
    return out.drop("_rn", "_cum", "_b_cost", "_b_cnt")


def uncollate(collated: DataFrame) -> DataFrame:
    """A6: restore the original per-conversation grouping and order — a
    groupBy on the original key with sort_array on turn_idx (conv_id and
    turn_idx ride along through collation as the ``_orig_*`` carriers of
    the reference, uncollate.py:12-60)."""
    return (
        collated.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("_turns")
        )
        .select(
            "conv_id",
            F.posexplode(F.col("_turns")).alias("pos", "t"),
        )
        .select(
            "conv_id",
            F.col("t.turn_idx").alias("turn_idx"),
            F.col("t.text").alias("text"),
        )
    )
