"""K9 baseline relation generators (eval_utils.py:388-463).

The reference ships two uninformed baselines used to contextualize the
model's P/R numbers:

* ``allpairs_base`` — per sentence, take the candidate spans (spaCy noun
  chunks / NER entities) and emit EVERY ordered pair as a relation.
* ``depparse_base`` — a dependency-parse heuristic: pair an ``nsubj``
  span with its verb's ``dobj``/``pobj`` span.

No parser exists in this environment, so the span inventory substitutes
honestly (documented boundary, same as the K1 ``head`` metric):

* candidate spans = the planted-entity mentions (our NER stand-in);
* the "verb" pivot of the dep-parse heuristic = the planted trigger
  tokens — subject is a mention LEFT of the trigger, object a mention
  RIGHT of it, mirroring nsubj -> head-verb -> dobj/pobj.

Both are pure relational plans: mention/trigger detection is a narrow
token explode, pair generation an equi-join on (conv_id, turn_idx) with
inequality predicates evaluated at the probe — no beam, no cap (baselines
are deliberately exhaustive), so costs are quadratic per sentence by
SPEC, bounded by the corpus's short turns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from dygiepp_spark.operators.extraction import detect_mentions, detect_triggers
from dygiepp_spark.tables import SRL_STEM_MAP


def allpairs_baseline(turns: DataFrame) -> DataFrame:
    """K9 ``allpairs_base`` (eval_utils.py:388-412): every ordered pair of
    candidate spans in a sentence, BOTH directions (the reference unions
    ``combinations(spans, 2)`` with ``combinations(spans[::-1], 2)``),
    deduped per (conv, arg0, arg1). Output: (conv_id, arg0, arg1)."""
    m = detect_mentions(turns)
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
            F.col("a.start") != F.col("b.start"),
        ],
    ).select(
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.surface").alias("arg0"),
        F.col("b.surface").alias("arg1"),
    )
    return pairs.distinct()


def srl_label(token: Column) -> Column:
    """srlmap collapse (eval_utils.py:160-166): the first stem in the
    ORDERED :data:`~dygiepp_spark.tables.SRL_STEM_MAP` that is a substring
    of the verb text gives the label; no match -> NULL (the reference
    ``continue``s the frame). Expressed as one nested CASE — JVM-side."""
    expr = F.lit(None).cast("string")
    for stem, label in reversed(SRL_STEM_MAP):
        expr = F.when(token.contains(stem), F.lit(label)).otherwise(expr)
    return expr


def srl_baseline(turns: DataFrame) -> DataFrame:
    """K9 ``allenlp_base_relations`` with ``filter_biosrl``/``collapse=False``
    (eval_utils.py:48-172): per unique sentence TEXT, one relation per verb
    frame — (first ARG0 span, first ARG1 span, srlmap label, conf 1.0) —
    keeping only verbs whose text matches an srlmap stem.

    Parser-free stand-in (same documented boundary as depparse_baseline):
    verb frames = planted trigger tokens; ARG0 = the LEFTMOST mention
    before the verb, ARG1 = the LEFTMOST mention after it (the reference's
    ``rels0[0]``/``rels1[0]`` — the first span listed for each role). The
    reference runs its predictor over ``eval_df.drop_duplicates(subset=
    ["text"])`` and emits under the representative row's id; here the
    representative of each distinct text is the (min numeric conv_id,
    min turn_idx) occurrence — the deterministic analog of "first row in
    dataframe order". Output: (conv_id, arg0, arg1, label, conf), one row
    per surviving verb occurrence (duplicates kept, as the reference
    appends per frame).

    Plan: the unique-text dedup is one hash agg on a text-hash key; the
    two argmin sides come out of ONE trigger x mention equi-join on
    (conv_id, turn_idx) + a per-trigger aggregate — all conv-local.
    """
    rep = (
        turns.groupBy("text")
        .agg(
            F.min(
                F.struct(
                    F.col("conv_id").cast("bigint").alias("c"),
                    F.col("turn_idx").alias("t"),
                    F.col("conv_id").alias("conv_id"),
                )
            ).alias("k")
        )
        .select(
            F.col("k.conv_id").alias("conv_id"),
            F.col("k.t").alias("turn_idx"),
            "text",
        )
    )
    m = detect_mentions(rep).alias("m")
    t = (
        detect_triggers(rep)
        .withColumn("label", srl_label(F.col("event_type").substr(F.lit(4), F.length("event_type"))))
        .filter(F.col("label").isNotNull())
        .alias("t")
    )
    joined = t.join(
        m,
        on=[
            F.col("t.conv_id") == F.col("m.conv_id"),
            F.col("t.turn_idx") == F.col("m.turn_idx"),
        ],
    )
    per_verb = joined.groupBy(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.trigger_ix").alias("trigger_ix"),
        F.col("t.label").alias("label"),
    ).agg(
        F.min(
            F.when(
                F.col("m.start") < F.col("t.trigger_ix"),
                F.struct(F.col("m.start").alias("s"), F.col("m.surface").alias("w")),
            )
        ).alias("a0"),
        F.min(
            F.when(
                F.col("m.start") > F.col("t.trigger_ix"),
                F.struct(F.col("m.start").alias("s"), F.col("m.surface").alias("w")),
            )
        ).alias("a1"),
    )
    return per_verb.filter(
        F.col("a0").isNotNull() & F.col("a1").isNotNull()
    ).select(
        "conv_id",
        F.col("a0.w").alias("arg0"),
        F.col("a1.w").alias("arg1"),
        "label",
        F.lit(1.0).alias("conf"),
    )


def depparse_baseline(turns: DataFrame) -> DataFrame:
    """K9 ``depparse_base`` (eval_utils.py:414-463) with the trigger-pivot
    stand-in: (subject mention, object mention) pairs bridged by a trigger
    token between them — subject left of the pivot, object right, like
    nsubj -> verb -> dobj/pobj. Deduped per (conv, arg0, arg1).
    Output: (conv_id, arg0, arg1)."""
    m = detect_mentions(turns)
    t = detect_triggers(turns)
    s = m.alias("s")
    o = m.alias("o")
    tr = t.alias("t")
    pairs = (
        s.join(
            tr,
            on=[
                F.col("s.conv_id") == F.col("t.conv_id"),
                F.col("s.turn_idx") == F.col("t.turn_idx"),
                F.col("s.start") < F.col("t.trigger_ix"),
            ],
        )
        .join(
            o,
            on=[
                F.col("t.conv_id") == F.col("o.conv_id"),
                F.col("t.turn_idx") == F.col("o.turn_idx"),
                F.col("o.start") > F.col("t.trigger_ix"),
            ],
        )
        .select(
            F.col("s.conv_id").alias("conv_id"),
            F.col("s.surface").alias("arg0"),
            F.col("o.surface").alias("arg1"),
        )
    )
    return pairs.distinct()
