"""Span enumeration and gold-label alignment (A7/A8/P4).

Reference semantics:

* A7 — enumerate all spans ``(start, end)`` inclusive with width <=
  ``max_span_width`` per sentence (AllenNLP ``enumerate_spans`` call,
  /root/reference/dygie/data/dataset_readers/dygie.py:120-125; width
  default 8, training_config/template.libsonnet:34).
* P4 — gold annotations wider than the cap are dropped (``_too_long``,
  dygie.py:55-56).
* A8 — gold spans/pairs are aligned onto the enumerated list by exact
  (start, end) lookup; misses become the null label
  (``_process_ner``/``_process_relations``, dygie.py:58-94).

Scale note: materializing O(n_tokens * W) span rows through a shuffle is
the one thing the reference's beam pruning exists to avoid. The relational
form below is exposed for parity/tests and for when a downstream op really
wants a span frame; the production extraction kernel enumerates spans
*inside* the Arrow batch (numpy) so only scored survivors ever hit a
shuffle (SURVEY.md §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dygiepp_spark.operators.doc_assembly import with_token_counts

MAX_SPAN_WIDTH = 8


def enumerate_spans(turns: DataFrame, max_width: int = MAX_SPAN_WIDTH) -> DataFrame:
    """A7: all candidate spans per turn, sentence-relative inclusive offsets.

    Narrow generate (two nested explodes) — no shuffle. Output columns:
    (conv_id, turn_idx, start, end).
    """
    with_len = with_token_counts(turns).filter(F.col("n_tokens") > 0)
    starts = with_len.select(
        "conv_id",
        "turn_idx",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.col("n_tokens") - 1)).alias("start"),
    )
    return starts.select(
        "conv_id",
        "turn_idx",
        "start",
        F.explode(
            F.sequence(
                F.col("start"),
                F.least(F.col("start") + max_width - 1, F.col("n_tokens") - 1),
            )
        ).alias("end"),
    )


def filter_span_width(spans: DataFrame, max_width: int = MAX_SPAN_WIDTH) -> DataFrame:
    """P4: drop spans wider than the cap (end inclusive)."""
    return spans.filter(F.col("end") - F.col("start") + 1 <= max_width)


def align_gold_labels(
    enumerated: DataFrame,
    gold: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx", "start", "end"),
    label_col: str = "label",
    null_label: str | None = None,
) -> DataFrame:
    """A8: left-join gold labels onto enumerated spans; miss -> null label.

    The reference builds dense label vectors with the null class at index 0
    (ner.py:49-51); in long format the same invariant is
    ``coalesce(label, null_label)``.
    """
    out = enumerated.join(gold, on=list(keys), how="left")
    if null_label is not None:
        out = out.withColumn(label_col, F.coalesce(F.col(label_col), F.lit(null_label)))
    return out
