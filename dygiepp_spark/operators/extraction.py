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

Plan-shape invariants (checked via .explain during tuning):

* the source is scanned ONCE per side — ``n_tokens`` and ``text`` are
  carried through the (narrow) token explode instead of being re-derived
  and joined back, so the positional beams are pure ranking windows with
  zero joins, and ``sent_text`` needs no extra join at emission;
* the only shuffles in emit_triples are: turns derivation (1), the beam
  window + pair self-join sharing one (conv_id, turn_idx) partitioning,
  and the final triple-dedup aggregation.
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
)


def _token_frame(turns: DataFrame) -> DataFrame:
    """Token explode that CARRIES the per-turn context (``text``,
    ``n_tokens``) on every token row instead of re-deriving and joining it
    back later — one narrow stage, one scan of the source. The duplication
    is transient (columnar, never wider than the turn itself) and buys
    join-free beams plus join-free sent_text emission downstream.
    """
    base = turns.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
    )
    return (
        base.select(
            "conv_id",
            "turn_idx",
            "text",
            "n_tokens",
            F.posexplode(F.split(F.col("text"), " ")).alias("tok_ix", "token"),
        )
        .filter(F.col("token") != "")
        .withColumn(
            "token",
            F.when(F.col("token").isin("/.", "/?"), F.expr("substring(token, 2)"))
            .otherwise(F.col("token")),
        )
    )


def detect_mentions(turns: DataFrame, with_context: bool = False) -> DataFrame:
    """Rule-based single-token entity mentions.

    Output: (conv_id, turn_idx, start, end, surface) — sentence-relative
    inclusive offsets like the reference's per-sentence ner lists
    (doc/data.md:29-37). ``with_context=True`` additionally carries
    (text, n_tokens) for join-free downstream beams.
    """
    toks = _token_frame(turns)
    extra = ["text", "n_tokens"] if with_context else []
    return toks.filter(F.col("token").isin(*ENTITY_VOCAB)).select(
        "conv_id",
        "turn_idx",
        F.col("tok_ix").alias("start"),
        F.col("tok_ix").alias("end"),
        F.col("token").alias("surface"),
        *extra,
    )


def detect_triggers(turns: DataFrame, with_context: bool = False) -> DataFrame:
    """Rule-based single-token event triggers (doc/data.md:59)."""
    toks = _token_frame(turns)
    extra = ["text", "n_tokens"] if with_context else []
    return toks.filter(F.col("token").isin(*TRIGGER_VOCAB)).select(
        "conv_id",
        "turn_idx",
        F.col("tok_ix").alias("trigger_ix"),
        F.concat(F.lit("op_"), F.col("token")).alias("event_type"),
        *extra,
    )


def _beam_filter(
    items: DataFrame,
    spans_per_word: float,
    cap: int | None,
    mode: str,
    pos_col: str,
) -> DataFrame:
    """Join-free M4 beam over a frame that already carries ``n_tokens``:
    one ranking window on (conv_id, turn_idx), nothing else."""
    rounder = F.ceil if mode == "ceil" else F.floor
    k = F.greatest(rounder(F.lit(spans_per_word) * F.col("n_tokens")), F.lit(1))
    if cap is not None:
        k = F.least(k, F.lit(cap))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(pos_col)
    return (
        items.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
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

    General form for items that do NOT carry ``n_tokens`` — joins the turn
    lengths in. The pipeline's own call sites use the join-free
    ``with_context=True`` + :func:`_beam_filter` path instead.
    """
    if "n_tokens" in items.columns:
        return _beam_filter(items, spans_per_word, cap, mode, pos_col).drop(
            *[c for c in ("text", "n_tokens") if c in items.columns]
        )
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
    carry_text = "text" in mentions.columns
    a = mentions.alias("a")
    b = mentions.drop(*[c for c in ("text", "n_tokens") if c in mentions.columns]).alias("b")
    n_labels = len(RELATION_LABELS)
    label_arr = F.array(*[F.lit(x) for x in RELATION_LABELS])
    sent = [F.col("a.text").alias("sent_text")] if carry_text else []
    if "entity_id" in mentions.columns:
        sent += [
            F.col("a.entity_id").alias("subj_id"),
            F.col("b.entity_id").alias("obj_id"),
        ]
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
        *sent,
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

    Plan shape — the 100 TB-critical property: every per-turn step
    (tokenize, mention detect, positional beam, band pair generation) is
    ROW-LOCAL, so it runs as array expressions inside one narrow stage;
    the ONLY shuffle is the final triple-dedup aggregation (map-side
    partial agg). The windowed formulation (beam_prune_spans) exists for
    scored beams, but a positional beam shuffling every mention row —
    with sent_text attached — through a ranking window would make shuffle
    IO the scaling bottleneck (measured: 0.39 efficiency at 4x cores vs
    this formulation).
    """
    # token convention identical to _token_frame: positions come from the
    # RAW split (posexplode-before-filter) with empties dropped afterwards,
    # so this fused path and the relational detect_mentions path agree on
    # ANY input text (repeated spaces included), not just the single-space
    # derived corpus. The '/.'/'/?' -> '.'/'?' word normalization is
    # deliberately ABSENT here: it can never change vocab membership
    # (normalization rewrites exactly '/.' and '/?', and neither '.' nor
    # '?' is in ENTITY_VOCAB), so in a path that only FILTERS on the vocab
    # it is dead weight — an extra per-token array transform measured at
    # ~20% of this query's wall (interleaved A/B at sf0.1, BENCH/PLANS.md
    # round 3; output identity vs the normalizing form machine-checked
    # with two-way exceptAll). _token_frame keeps the normalization
    # because its consumers OUTPUT token surfaces.
    raw = F.split(F.col("text"), " ")
    toks = F.filter(
        F.transform(raw, lambda t, i: F.struct(i.alias("pos"), t.alias("tok"))),
        lambda s: s["tok"] != "",
    )
    n = F.size(toks)
    ments = F.filter(toks, lambda s: s["tok"].isin(*ENTITY_VOCAB))
    k = F.greatest(F.ceil(F.lit(0.5) * n), F.lit(1)).cast("int")
    beamed = F.slice(ments, 1, k)
    pairs_arr = F.flatten(
        F.transform(
            beamed,
            lambda a: F.transform(
                F.filter(
                    beamed,
                    lambda b: (b["pos"] > a["pos"])
                    & (b["pos"] - a["pos"] <= max_dist),
                ),
                lambda b: F.struct(
                    a["pos"].alias("s1"),
                    b["pos"].alias("s2"),
                    a["tok"].alias("arg0"),
                    b["tok"].alias("arg1"),
                ),
            ),
        )
    )
    label_arr = F.array(*[F.lit(x) for x in RELATION_LABELS])
    exploded = turns.select(
        "conv_id", F.col("text").alias("sent_text"), F.explode(pairs_arr).alias("p")
    ).select(
        "conv_id",
        "sent_text",
        F.col("p.s1").alias("s1"),
        F.col("p.s2").alias("s2"),
        F.col("p.arg0").alias("arg0"),
        F.col("p.arg1").alias("arg1"),
        F.element_at(
            label_arr,
            (
                (F.length(F.col("p.arg0")) + 2 * F.length(F.col("p.arg1")))
                % len(RELATION_LABELS)
            ).cast("int")
            + 1,
        ).alias("label"),
        (
            F.lit(1.0) / (F.lit(1.0) + (F.col("p.s2") - F.col("p.s1")))
        ).alias("conf"),
    )
    # Dedup key: hash the sentence text instead of grouping on the raw
    # string — a ~70-char string in a hash-agg key costs ~4x the whole
    # aggregation (measured); the 64-bit surrogate keeps key compare cheap
    # and sent_text rides along via max() (all values in a group are equal
    # up to a 2^-64 collision).
    return (
        exploded.groupBy(
            "conv_id",
            F.xxhash64("sent_text").alias("_sh"),
            "arg0",
            "arg1",
            "label",
        )
        .agg(
            F.max("sent_text").alias("sent_text"),
            F.max_by(F.col("conf"), F.col("s1") * 1000 + F.col("s2")).alias("conf"),
        )
        .select("conv_id", "sent_text", "arg0", "arg1", "label", "conf")
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

    Plan shape: mentions and triggers come out of ONE token scan and ONE
    shared beam window partitioned by (conv_id, turn_idx, kind) — the two
    per-kind beam sizes are a conditional k inside the same window, so the
    self-join's two sides differ only by a post-window filter and the
    exchange is reusable.
    """
    toks = _token_frame(turns)
    cands = toks.withColumn(
        "kind",
        F.when(F.col("token").isin(*ENTITY_VOCAB), F.lit("m"))
        .when(F.col("token").isin(*TRIGGER_VOCAB), F.lit("t")),
    ).filter(F.col("kind").isNotNull())
    k = F.when(
        F.col("kind") == "m",
        F.least(
            F.greatest(F.floor(F.lit(0.8) * F.col("n_tokens")), F.lit(1)),
            F.lit(30),
        ),
    ).otherwise(
        F.least(
            F.greatest(F.floor(F.lit(0.3) * F.col("n_tokens")), F.lit(1)),
            F.lit(15),
        )
    )
    w = Window.partitionBy("conv_id", "turn_idx", "kind").orderBy("tok_ix")
    beamed = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("conv_id", "turn_idx", "tok_ix", "token", "kind")
    )
    m = beamed.filter(F.col("kind") == "m").alias("m")
    t = beamed.filter(F.col("kind") == "t").alias("t")
    return t.join(
        m,
        on=[
            F.col("t.conv_id") == F.col("m.conv_id"),
            F.col("t.turn_idx") == F.col("m.turn_idx"),
            F.abs(F.col("m.tok_ix") - F.col("t.tok_ix")) <= max_dist,
        ],
    ).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.tok_ix").alias("trigger_ix"),
        F.concat(F.lit("op_"), F.col("t.token")).alias("event_type"),
        F.col("m.tok_ix").alias("arg_start"),
        F.col("m.tok_ix").alias("arg_end"),
        F.when(F.col("m.tok_ix") < F.col("t.tok_ix"), F.lit("arg0"))
        .otherwise(F.lit("arg1"))
        .alias("role"),
        F.col("m.token").alias("arg_text"),
    )


def events_binary_decode(events: DataFrame) -> DataFrame:
    """K10 (decode.py:10-43): per trigger, ARG0 x ARG1 cross product.

    Emits (conv_id, turn_idx, trigger_ix, event_type, arg0, arg1); a row
    requires both an arg0 and an arg1 for the trigger.

    Implemented as ONE aggregation per trigger (collect arg0/arg1 lists)
    followed by a nested explode — one pass over the events frame instead
    of a filtered self-join (which would recompute the whole upstream
    extraction for each side). Per-trigger arg counts are beam-capped
    (<= 30), so the collected lists are bounded.
    """
    per_trigger = events.groupBy(
        "conv_id", "turn_idx", "trigger_ix", "event_type"
    ).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("role") == "arg0",
                    F.struct(F.col("arg_start").alias("s"), F.col("arg_text").alias("t")),
                )
            )
        ).alias("a0s"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("role") == "arg1",
                    F.struct(F.col("arg_start").alias("s"), F.col("arg_text").alias("t")),
                )
            )
        ).alias("a1s"),
    )
    return (
        per_trigger.select(
            "conv_id", "turn_idx", "trigger_ix", "event_type",
            F.explode("a0s").alias("a0"), "a1s",
        )
        .select(
            "conv_id", "turn_idx", "trigger_ix", "event_type",
            "a0", F.explode("a1s").alias("a1"),
        )
        .select(
            "conv_id", "turn_idx", "trigger_ix", "event_type",
            F.col("a0.t").alias("arg0"), F.col("a0.s").alias("a0_start"),
            F.col("a1.t").alias("arg1"), F.col("a1.s").alias("a1_start"),
        )
    )


def event_schema_profile(events: DataFrame) -> DataFrame:
    """Event-ontology profile: one row per (event_type, role) with the
    argument count, distinct-conversation support, and the role's share
    within its event type — the schema-induction table for the event
    half of the KG (an event type whose role mix shifts between corpus
    slices signals extractor drift, the event analog of
    graph.schema_profile).

    Scale: one map-side-combinable agg on the tiny type x role domain
    plus a broadcast of per-type totals; share is one exact-integer
    division.
    """
    per = events.groupBy("event_type", "role").agg(
        F.count(F.lit(1)).alias("n_args"),
        F.count_distinct("conv_id").alias("n_convs"),
    )
    tot = per.groupBy("event_type").agg(F.sum("n_args").alias("_t"))
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type", "role", "n_args", "n_convs",
        (
            F.col("n_args").cast("double") / F.col("_t").cast("double")
        ).alias("role_share"),
    )
