"""Relational (Catalyst-side) extraction: mentions, triples, events.

This module is the *relational skeleton* of the DyGIE++ decode path,
expressed entirely in DataFrame ops so Catalyst can push filters into the
scan and keep everything in whole-stage codegen. The scores here come from
the deterministic rule scorer (planted entities/triggers of
``dygiepp_spark.tables``); the neural path swaps in the Arrow kernel of
``dygiepp_spark.kernels`` which must produce the identical frame shapes
(pytest asserts kernel == relational on the rule scorer).

Reference semantics re-expressed:

* mention detection -> the NER module's non-null argmax per span
  (/root/reference/dygie/models/ner.py:92-120).
* triple emission -> ``predict.py:22-42``: key (doc_key, sent_text, arg0,
  arg1, label) deduped with last-write-wins over (i, j) pair order; value =
  softmax score. TSV variant ``dygie_pred_to_tsv.py:23-34`` maps
  USED-FOR -> MECHANISM and drops all other labels.
* events -> single-token triggers with role-labelled argument spans
  (doc/data.md:59-72); binary decode ``decode.py:10-43`` (ARG0 x ARG1
  cross product per trigger).

Scale notes: mention detection is a narrow filter over the token explode;
the pair join is a self-join *within* (conv_id, turn_idx) with a band
predicate (distance cap), so the shuffle key is (conv_id, turn_idx) — high
cardinality and uniform (turns are bounded at TURN_TOKENS tokens), no skew.
AQE handles residual imbalance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dygiepp_spark.operators.doc_assembly import with_token_counts
from dygiepp_spark.tables import (
    ENTITY_VOCAB,
    EVENT_ARG_MAX_DIST,
    RELATION_LABELS,
    RELATION_MAX_DIST,
    TRIGGER_VOCAB,
    tokens_from_turns,
)


def detect_mentions(turns: DataFrame) -> DataFrame:
    """Rule-based single-token entity mentions.

    Output: (conv_id, turn_idx, start, end, surface) — sentence-relative
    inclusive offsets like the reference's per-sentence ner lists
    (doc/data.md:29-37).
    """
    toks = tokens_from_turns(turns)
    return toks.filter(F.col("token").isin(*ENTITY_VOCAB)).select(
        "conv_id",
        "turn_idx",
        F.col("tok_ix").alias("start"),
        F.col("tok_ix").alias("end"),
        F.col("token").alias("surface"),
    )


def detect_triggers(turns: DataFrame) -> DataFrame:
    """Rule-based single-token event triggers (doc/data.md:59)."""
    toks = tokens_from_turns(turns)
    return toks.filter(F.col("token").isin(*TRIGGER_VOCAB)).select(
        "conv_id",
        "turn_idx",
        F.col("tok_ix").alias("trigger_ix"),
        F.concat(F.lit("op_"), F.col("token")).alias("event_type"),
    )


def positional_beam(
    items: DataFrame,
    turns: DataFrame,
    spans_per_word: float,
    cap: int | None = None,
    mode: str = "ceil",
    pos_col: str = "start",
) -> DataFrame:
    """M4 beam for uniformly-scored candidates: keep the first
    k = round(spans_per_word * sentence_len) items per turn in textual
    order (the Pruner's tie rule — equal scores resolve to lower indices,
    then survivors re-sort ascending; entity_beam_pruner.py:104-192).

    Relations use ceil (relation.py:117); events use floor-with-min-1 and
    a hard cap (events.py:133-152).
    """
    counts = with_token_counts(turns).select("conv_id", "turn_idx", "n_tokens")
    rounder = F.ceil if mode == "ceil" else F.floor
    k = F.greatest(rounder(F.lit(spans_per_word) * F.col("n_tokens")), F.lit(1))
    if cap is not None:
        k = F.least(k, F.lit(cap))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(pos_col)
    return (
        items.join(counts, ["conv_id", "turn_idx"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "n_tokens")
    )


def relation_pairs(mentions: DataFrame, max_dist: int = RELATION_MAX_DIST) -> DataFrame:
    """M5-analog pair generation: ordered mention pairs within a turn.

    Band self-join: equi-keys (conv_id, turn_idx) + ``0 < j - i <= max_dist``.
    Label and confidence are the deterministic rule:
    label = RELATION_LABELS[(len(arg0) + 2*len(arg1)) % 3],
    conf  = 1 / (1 + distance).
    """
    a = mentions.alias("a")
    b = mentions.alias("b")
    n_labels = len(RELATION_LABELS)
    label_arr = F.array(*[F.lit(x) for x in RELATION_LABELS])
    pairs = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
            F.col("b.start") > F.col("a.start"),
            F.col("b.start") - F.col("a.start") <= max_dist,
        ],
    ).select(
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.turn_idx").alias("turn_idx"),
        F.col("a.start").alias("s1"),
        F.col("a.end").alias("e1"),
        F.col("b.start").alias("s2"),
        F.col("b.end").alias("e2"),
        F.col("a.surface").alias("arg0"),
        F.col("b.surface").alias("arg1"),
        (F.col("b.start") - F.col("a.start")).alias("dist"),
    )
    return pairs.select(
        "*",
        F.element_at(
            label_arr,
            (
                (F.length(F.col("arg0")) + 2 * F.length(F.col("arg1"))) % n_labels
            ).cast("int")
            + 1,
        ).alias("label"),
        (F.lit(1.0) / (F.lit(1.0) + F.col("dist"))).alias("conf"),
    )


def emit_triples(turns: DataFrame, max_dist: int = RELATION_MAX_DIST) -> DataFrame:
    """The flagship query: predict.py triple emission.

    (conv_id, sent_text, arg0, arg1, label) deduped with last-write-wins in
    (s1, s2) iteration order — the dict-overwrite semantics of
    ``get_doc_key_info`` (predict.py:22-34) — carrying the softmax score.
    ``max_by(conf, s1 * 1000 + s2)`` reproduces "last wins" because pairs
    are generated in ascending (i, j) order and turns are < 1000 tokens.

    Mentions pass the reference's relation beam first
    (k = ceil(0.5 * sentence_len), template.libsonnet:99) so this emits
    exactly what the Arrow kernel emits with the RuleScorer.
    """
    mentions = positional_beam(detect_mentions(turns), turns, 0.5, mode="ceil")
    pairs = relation_pairs(mentions, max_dist)
    sent = turns.select("conv_id", "turn_idx", F.col("text").alias("sent_text"))
    return (
        pairs.join(sent, ["conv_id", "turn_idx"])
        .groupBy("conv_id", "sent_text", "arg0", "arg1", "label")
        .agg(
            F.max_by(F.col("conf"), F.col("s1") * 1000 + F.col("s2")).alias("conf")
        )
    )


def triples_to_mechanism(triples: DataFrame) -> DataFrame:
    """dygie_pred_to_tsv.py:28-32 — keep USED-FOR as MECHANISM, drop rest."""
    return triples.filter(F.col("label") == "USED-FOR").withColumn(
        "label", F.lit("MECHANISM")
    )


def extract_events(turns: DataFrame, max_dist: int = EVENT_ARG_MAX_DIST) -> DataFrame:
    """Rule-based event extraction: trigger + role-labelled args.

    Args are entity mentions within ``max_dist`` tokens of the trigger
    (distance 0 impossible — vocabularies are disjoint); role = 'arg0' if
    the mention precedes the trigger else 'arg1'. Mirrors the reference's
    trigger-gated argument decode shape (events.py:251-279): an argument
    row exists only for predicted (non-null) triggers, and argument pairs
    are restricted to the trigger beam (floor 0.3/word cap 15) x the
    argument-span beam (floor 0.8/word cap 30), events.py:133-152.
    """
    mentions = positional_beam(
        detect_mentions(turns), turns, 0.8, cap=30, mode="floor"
    )
    triggers = positional_beam(
        detect_triggers(turns), turns, 0.3, cap=15, mode="floor",
        pos_col="trigger_ix",
    )
    m = mentions.alias("m")
    t = triggers.alias("t")
    return t.join(
        m,
        on=[
            F.col("t.conv_id") == F.col("m.conv_id"),
            F.col("t.turn_idx") == F.col("m.turn_idx"),
            F.abs(F.col("m.start") - F.col("t.trigger_ix")) <= max_dist,
        ],
    ).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.trigger_ix").alias("trigger_ix"),
        F.col("t.event_type").alias("event_type"),
        F.col("m.start").alias("arg_start"),
        F.col("m.end").alias("arg_end"),
        F.when(F.col("m.start") < F.col("t.trigger_ix"), F.lit("arg0"))
        .otherwise(F.lit("arg1"))
        .alias("role"),
        F.col("m.surface").alias("arg_text"),
    )


def events_binary_decode(events: DataFrame) -> DataFrame:
    """K10 (decode.py:10-43): per trigger, ARG0 x ARG1 cross product.

    Emits (conv_id, turn_idx, trigger_ix, event_type, arg0, arg1); a row
    requires both an arg0 and an arg1 for the trigger.
    """
    a0 = events.filter(F.col("role") == "arg0").select(
        "conv_id", "turn_idx", "trigger_ix", "event_type",
        F.col("arg_text").alias("arg0"), F.col("arg_start").alias("a0_start"),
    )
    a1 = events.filter(F.col("role") == "arg1").select(
        "conv_id", "turn_idx", "trigger_ix",
        F.col("arg_text").alias("arg1"), F.col("arg_start").alias("a1_start"),
    )
    return a0.join(a1, ["conv_id", "turn_idx", "trigger_ix"]).select(
        "conv_id", "turn_idx", "trigger_ix", "event_type",
        "arg0", "a0_start", "arg1", "a1_start",
    )
