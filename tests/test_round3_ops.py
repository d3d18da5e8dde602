"""Round-3 operators: G3 four-way event metrics, K9 SRL baseline, S6
metadata-CSV ingest, the eval grid sweep, G5 MentionRecall, and A4 exact
Document.split semantics."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dygiepp_spark.operators import baselines as BL
from dygiepp_spark.operators import coref as CO
from dygiepp_spark.operators import doc_assembly as DA
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.operators import kg_eval as KE
from dygiepp_spark.sources import jsonl as J


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user" if i % 2 == 0 else "assistant", t, None)
         for (c, i, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


# ------------------------------------------------------ G3 event_f1_4way

def test_event_f1_4way_trigger_offset_free_arg_match(spark):
    """The defining semantics (event_metrics.py:56-58): an argument
    matches a gold argument if (arg_ix, trigger LABEL, role) agree — the
    trigger OFFSET need not. Construct a sentence where the pred arg
    attaches to a different same-label trigger than gold's."""
    # 8 tokens (trigger beam floor(0.3*8)=2 keeps both joins):
    # a(0) join(1) spark(2) a(3) a(4) join(5) a(6) a(7); pred (dist 4)
    # attaches spark@2 to BOTH joins; gold (dist 2) only to join@1
    t = _turns(spark, [("1", 0, "a join spark a a join a a")])
    pred = EX.extract_events(t, max_dist=4)
    gold = EX.extract_events(t, max_dist=2)
    row = KE.event_f1_4way(pred, gold).collect()[0]
    # pred triggers: join@1 and join@5 (both have the arg in range);
    # gold triggers: join@1 only
    assert row["n_pred_trig"] == 2 and row["n_gold_trig"] == 1
    assert row["tp_trig_id"] == 1 and row["tp_trig_class"] == 1
    # pred args: (spark@2, op_join, arg1 [after join@1]) and
    # (spark@2, op_join, arg0 [before join@5]); gold args: (spark@2,
    # op_join, arg1). arg_id matches BOTH pred entries (label-level,
    # offset-free); arg_class only the role-consistent one.
    assert row["n_pred_arg"] == 2 and row["n_gold_arg"] == 1
    assert row["tp_arg_id"] == 2
    assert row["tp_arg_class"] == 1
    # reference counting: same matched count feeds precision AND recall,
    # so arg_id recall is 2/1 = 2.0 (faithful to compute_f1, not clamped)
    assert row["arg_id_recall"] == 2.0
    assert row["arg_class_precision"] == 0.5 and row["arg_class_recall"] == 1.0


def test_event_f1_4way_duplicate_entries_counted(spark):
    """Dict-collapsed entry lists keep duplicates (event_metrics.py:70-74):
    two same-label triggers sharing an argument with the same role yield
    two entries, both counted in n_pred_arg and both matched."""
    # join(0) a(1) spark(2) a(3) join(4) a(5) a(6) — 7 tokens so the
    # trigger beam (floor 0.3/word) keeps both joins; mention@2 is arg1 of
    # join@0 and arg0 of join@4, both at dist 2 -> roles differ;
    # pred == gold -> perfect scores with multiplicity 2
    t = _turns(spark, [("1", 0, "join a spark a join a a")])
    ev = EX.extract_events(t, max_dist=2)
    row = KE.event_f1_4way(ev, ev).collect()[0]
    assert row["n_pred_arg"] == row["n_gold_arg"] == 2
    assert row["tp_arg_id"] == 2 and row["tp_arg_class"] == 2
    assert row["arg_class_f1"] == 1.0 and row["trig_id_f1"] == 1.0


# ------------------------------------------------------ K9 srl_baseline

def test_srl_baseline_first_stem_wins_and_leftmost_args(spark):
    # 'filter' matches the ordered stems at 'er' (EFFECT) before 'filt'
    # (MECHANISM); arg0 = leftmost mention left, arg1 = leftmost right
    t = _turns(spark, [("1", 0, "spark row filter table batch")])
    rows = BL.srl_baseline(t).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["arg0"], r["arg1"], r["label"], r["conf"]) == (
        "spark", "table", "EFFECT", 1.0
    )


def test_srl_baseline_requires_both_sides(spark):
    # no mention before the verb -> frame dropped (rels0 empty)
    t = _turns(spark, [("1", 0, "join spark table")])
    assert BL.srl_baseline(t).count() == 0


def test_srl_baseline_unique_text_dedup(spark):
    """The reference predicts over eval_df.drop_duplicates(subset=['text'])
    and emits under the representative id — duplicate sentences must
    produce ONE row, keyed by the minimal (conv, turn)."""
    t = _turns(
        spark,
        [("7", 0, "spark join table"), ("3", 1, "spark join table")],
    )
    rows = BL.srl_baseline(t).collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] == "3"
    assert rows[0]["label"] == "MECHANISM"  # stem 'join'


# ------------------------------------------------------ S6 csv ingest

def test_csv_ingest_roundtrip_and_skip_rule(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (5, "gamma  delta"), (74, "skipped text")],
        "doc_id bigint, text string",
    )
    base = str(tmp_path / "meta_csv")
    J.write_metadata_csv(docs, base)
    got = {r["doc_key"]: r for r in J.ingest_metadata_csv(spark, base).collect()}
    # doc 74 (% 37 == 0) -> empty abstract -> skipped (preprocess.py:204-207)
    assert set(got) == {"1_abstract", "5_abstract"}
    assert got["1_abstract"]["section"] == "Abstract"
    assert got["1_abstract"]["n_tokens"] == 2
    # double space collapsed by the empty-token filter + rejoin
    assert got["5_abstract"]["text"] == "gamma delta"


# ------------------------------------------------------ eval grid

def test_eval_grid_cells_match_single_cell_operators(spark, sf_dir):
    from dygiepp_spark import tables as TT

    turns = TT.turns_from_documents(spark, sf_dir, with_ts=False).filter(
        F.col("conv_id").cast("int") < 40
    ).localCheckpoint()
    pred = EX.emit_triples(turns).localCheckpoint()
    gold = KE.gold_triples_ctx(turns).localCheckpoint()
    grid = {
        (r["kind"], r["metric"], r["collapse"], r["topk"]): r
        for r in KE.eval_grid(pred, gold, topks=(25, 50)).collect()
    }
    # 6 rel + 3 span + 2 p@k cells
    assert len(grid) == 11
    # the exact/collapse=False cell equals the standalone ie_eval
    single = KE.ie_eval(pred, gold, "exact").collect()[0]
    cell = grid[("rel", "exact", False, None)]
    for c in ("n_pred", "n_gold", "tp", "tp_recall", "precision", "recall", "f1"):
        assert cell[c] == single[c], c
    # collapse can only add matches
    for metric in ("exact", "substring", "rouge"):
        assert (
            grid[("rel", metric, True, None)]["tp"]
            >= grid[("rel", metric, False, None)]["tp"]
        )
    # substring dominates exact at every level
    assert (
        grid[("rel", "substring", False, None)]["tp"]
        >= grid[("rel", "exact", False, None)]["tp"]
    )
    assert (
        grid[("span", "substring", None, None)]["tp"]
        >= grid[("span", "exact", None, None)]["tp"]
    )
    # p@k cells: precision = tp / k and monotone tp in k
    c25, c50 = grid[("p_at_k", "substring", False, 25)], grid[
        ("p_at_k", "substring", False, 50)
    ]
    assert c25["precision"] == c25["tp"] / max(c25["n_pred"], 1)
    assert c50["tp"] >= c25["tp"]


# ------------------------------------------------------ G5 mention recall

def test_mention_recall_band_split_lowers_recall(spark):
    """A gold cluster whose two mentions sit > band apart is split into
    singletons by the band-limited clustering -> its mentions drop out of
    the predicted mention set and recall falls below 1."""
    pred = spark.createDataFrame(
        [("1", 0, 0), ("1", 1, 1), ("1", 2, 2), ("1", 3, 2)],
        "conv_id string, mention_ix int, cluster_id int",
    )
    gold = spark.createDataFrame(
        [("1", 0, 0), ("1", 1, 0), ("1", 2, 2), ("1", 3, 2)],
        "conv_id string, mention_ix int, cluster_id int",
    )
    rows = {r["conv_id"]: r for r in CO.mention_recall(pred, gold).collect()}
    # gold mentions in non-singleton clusters: 0,1,2,3; pred keeps 2,3
    assert rows["1"]["n_gold"] == 4 and rows["1"]["n_recalled"] == 2
    assert rows["1"]["recall"] == 0.5
    assert rows["__total__"]["n_gold"] == 4
    assert rows["__total__"]["recall"] == 0.5


# ------------------------------------------------------ A4 exact split

def _t12(n):
    """n turns of 12 tokens each (vocab word repeated)."""
    return [("9", i, " ".join(["a"] * 12)) for i in range(n)]


def test_split_documents_passthrough_short_doc(spark):
    t = _turns(spark, _t12(3))  # 36 tokens == max -> NOT split
    out = DA.split_documents(t, max_tokens_per_doc=36).collect()
    assert {r["doc_key"] for r in out} == {"9"}
    assert sorted((r["turn_idx"], r["sentence_start"]) for r in out) == [
        (0, 0), (1, 12), (2, 24)
    ]


def test_split_documents_greedy_groups_and_rebase(spark):
    t = _turns(spark, _t12(5))  # 60 tokens, max 36 -> groups of 3 + 2
    out = DA.split_documents(t, max_tokens_per_doc=36).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["doc_key"], []).append(r)
    assert set(by_key) == {"9_SPLIT_0", "9_SPLIT_1"}
    s1 = sorted(
        (r["orig_turn_idx"], r["turn_idx"], r["sentence_start"])
        for r in by_key["9_SPLIT_1"]
    )
    # group starts at orig turn 3: ix and token offsets rebased to 0
    assert s1 == [(3, 0, 0), (4, 1, 12)]


def test_split_documents_uneven_greedy(spark):
    """Non-uniform lengths: the greedy rule packs by cumulative fit, not
    fixed width — turn lengths 10, 10, 10, 5, 10 with max 25 group as
    [10+10], [10+5+10]: 10+10+10 > 25 starts group 1, which then fits
    exactly 25 — so the two groups have different turn counts."""
    rows = [
        ("9", 0, " ".join(["a"] * 10)),
        ("9", 1, " ".join(["a"] * 10)),
        ("9", 2, " ".join(["a"] * 10)),
        ("9", 3, " ".join(["a"] * 5)),
        ("9", 4, " ".join(["a"] * 10)),
    ]
    out = DA.split_documents(
        _turns(spark, rows), max_tokens_per_doc=25
    ).collect()
    groups = {r["orig_turn_idx"]: r["doc_key"] for r in out}
    assert groups == {
        0: "9_SPLIT_0", 1: "9_SPLIT_0",
        2: "9_SPLIT_1", 3: "9_SPLIT_1", 4: "9_SPLIT_1",
    }


def test_split_documents_long_sentence_raises(spark):
    t = _turns(spark, [("9", 0, " ".join(["a"] * 40))])
    with pytest.raises(Exception, match="more than 36 tokens"):
        DA.split_documents(t, max_tokens_per_doc=36).collect()


def test_split_documents_refuses_coref(spark):
    t = _turns(spark, _t12(2))
    with pytest.raises(NotImplementedError):
        DA.split_documents(t, max_tokens_per_doc=36, clusters=t)


def test_split_documents_roundtrip_preserves_text(spark):
    t = _turns(spark, _t12(7))
    out = DA.split_documents(t, max_tokens_per_doc=36)
    rebuilt = (
        out.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("orig_turn_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("doc_text")
        )
        .collect()[0]["doc_text"]
    )
    orig = DA.assemble_documents(
        t.withColumn("ts", F.lit(None).cast("timestamp"))
    ).collect()[0]["doc_text"]
    assert rebuilt == orig
