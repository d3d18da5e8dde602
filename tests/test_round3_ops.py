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


ACE_FIXTURE = "/root/reference/dygie/tests/fixtures/ace_event_article.json"


@pytest.mark.skipif(
    not __import__("os").path.exists(ACE_FIXTURE),
    reason="ACE fixture not present",
)
def test_event_f1_4way_ace_golden(spark):
    """Golden regression on the reference's own ACE event fixture: pred =
    the fixture's events; gold = the even-trigger subset with trigger
    labels perturbed on trigger_ix % 4 == 0 and roles perturbed on
    arg_start % 3 == 0 — so every one of the four axes scores differently
    (id vs class on both triggers and args). Numbers frozen from this
    code; any drift in the dict-collapse / any-match / span-key counting
    breaks the assert."""
    rows = []
    for doc in J.load_jsonl(ACE_FIXTURE):
        preds = J.doc_predictions(doc)
        for (key, six), v in preds.items():
            for ev in v["events"]:
                for (s, e, role) in ev["args"]:
                    rows.append(
                        (key, six, ev["trigger_ix"], ev["event_type"],
                         s, e, role, "")
                    )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, trigger_ix int, event_type string, "
        "arg_start int, arg_end int, role string, arg_text string",
    )
    gold = (
        df.filter(F.col("trigger_ix") % 2 == 0)
        .withColumn(
            "event_type",
            F.when(
                F.col("trigger_ix") % 4 == 0,
                F.concat(F.col("event_type"), F.lit("_X")),
            ).otherwise(F.col("event_type")),
        )
        .withColumn(
            "role",
            F.when(F.col("arg_start") % 3 == 0, F.lit("ROLE_X")).otherwise(
                F.col("role")
            ),
        )
    )
    out = KE.event_f1_4way(df, gold).collect()[0]
    assert (out["n_pred_trig"], out["n_gold_trig"]) == (17, 11)
    assert (out["tp_trig_id"], out["tp_trig_class"]) == (11, 6)
    assert (out["n_pred_arg"], out["n_gold_arg"]) == (29, 20)
    assert (out["tp_arg_id"], out["tp_arg_class"]) == (8, 6)
    assert out["trig_id_f1"] == pytest.approx(0.7857142857142858)
    assert out["trig_class_f1"] == pytest.approx(0.42857142857142855)
    assert out["arg_id_f1"] == pytest.approx(0.32653061224489793)
    assert out["arg_class_f1"] == pytest.approx(0.24489795918367346)


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


def test_salted_assembly_equals_plain_on_skewed_corpus(spark):
    """assemble_documents_salted must equal the one-phase assembly on the
    Zipf-skewed synthetic corpus (the exact workload salting exists for),
    including a salt count that does NOT divide the conversation lengths."""
    from dygiepp_spark import tables as TT

    turns = TT.synth_turns(spark, n_convs=40, max_turns=97).localCheckpoint()
    plain = DA.assemble_documents(turns).select("conv_id", "n_turns", "doc_text")
    for n_salts in (3, 8):
        salted = DA.assemble_documents_salted(turns, n_salts).select(
            "conv_id", "n_turns", "doc_text"
        )
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_json_ingest_fallback_and_skip_rules(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (41, "meta fallback"), (43, "no abstract"),
         (47, "no body"), (2, "gamma")],
        "doc_id bigint, text string",
    )
    base = str(tmp_path / "articles")
    J.write_article_json(docs, base)
    got = {r["doc_key"]: r for r in J.ingest_article_json(spark, base).collect()}
    # 43 -> no_abstract skip; 47 -> no_body skip
    assert set(got) == {"1:abstract", "41:abstract", "2:abstract"}
    # 41 went through the metadata fallback — observably upper-cased
    assert got["41:abstract"]["text"] == "META FALLBACK"
    assert got["1:abstract"]["text"] == "alpha beta"
    assert got["1:abstract"]["n_tokens"] == 2


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
    # 4 metrics (round 5 added 'partial') x 2 collapse rel + 4 span +
    # 4x2 p@k cells
    assert len(grid) == 20
    # the exact/collapse=False cell equals the standalone ie_eval
    single = KE.ie_eval(pred, gold, "exact").collect()[0]
    cell = grid[("rel", "exact", False, None)]
    for c in ("n_pred", "n_gold", "tp", "tp_recall", "precision", "recall", "f1"):
        assert cell[c] == single[c], c
    # the partial cell equals the standalone ie_eval under the same metric
    single_p = KE.ie_eval(pred, gold, "partial").collect()[0]
    cell_p = grid[("rel", "partial", False, None)]
    for c in ("n_pred", "n_gold", "tp", "tp_recall", "precision", "recall", "f1"):
        assert cell_p[c] == single_p[c], c
    # collapse can only add matches
    for metric in ("exact", "substring", "rouge", "partial"):
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


def test_split_documents_matches_sequential_greedy_random(spark):
    """The distributed kernel equals the reference's sequential greedy
    (document.py:203-226 transcribed in pure Python) on 30 seeded random
    conversations with non-uniform turn lengths — one Spark job, per-conv
    comparison."""
    import random

    rng = random.Random(7)
    max_tok = 23
    rows, expected = [], {}
    for c in range(30):
        conv = str(100 + c)
        lens = [rng.randint(1, max_tok) for _ in range(rng.randint(1, 12))]
        for i, ln in enumerate(lens):
            rows.append((conv, i, " ".join(["a"] * ln)))
        # sequential reference greedy
        starts = [0]
        for ln in lens[:-1]:
            starts.append(starts[-1] + ln)
        if sum(lens) <= max_tok:
            for i in range(len(lens)):
                expected[(conv, i)] = (conv, i, starts[i])
        else:
            g, group_len, tok_off, ix_off = 0, 0, 0, 0
            for i, ln in enumerate(lens):
                if group_len + ln <= max_tok:
                    group_len += ln
                else:
                    g += 1
                    tok_off, ix_off = starts[i], i
                    group_len = ln
                expected[(conv, i)] = (
                    f"{conv}_SPLIT_{g}", i - ix_off, starts[i] - tok_off
                )
    out = DA.split_documents(
        _turns(spark, rows), max_tokens_per_doc=max_tok
    ).collect()
    got = {
        (r["conv_id"], r["orig_turn_idx"]):
            (r["doc_key"], r["turn_idx"], r["sentence_start"])
        for r in out
    }
    assert got == expected


def test_event_f1_4way_matches_python_reference_random(spark):
    """event_f1_4way equals a pure-Python transcription of the reference
    EventMetrics counting (per-sentence dicts, formatted entry lists with
    multiplicity, any-match per predicted entry) on seeded random event
    frames."""
    import random

    rng = random.Random(13)
    types = ["op_a", "op_b"]
    roles = ["arg0", "arg1"]

    def rand_events(n):
        rows = set()
        while len(rows) < n:
            rows.add(
                (str(rng.randint(0, 3)), rng.randint(0, 1),
                 rng.randint(0, 6), rng.choice(types),
                 rng.randint(0, 6), rng.randint(0, 6), rng.choice(roles))
            )
        return sorted(rows)

    pred_rows = rand_events(60)
    gold_rows = rand_events(45)

    def frame(rows):
        return spark.createDataFrame(
            [r + ("",) for r in rows],
            "conv_id string, turn_idx int, trigger_ix int, event_type "
            "string, arg_start int, arg_end int, role string, arg_text string",
        )

    # pure-Python reference counting (event_metrics.py:46-83)
    def counts(pred, gold):
        def trig_dict(rows):
            d = {}
            for (c, t, tix, et, _s, _e, _r) in rows:
                d[(c, t, tix)] = et
            return d

        # the frame carries one event_type per trigger by construction
        # (labels relabelled as a function of the trigger key below), so
        # dict entries == distinct frame triggers
        pt, gt = trig_dict(pred), trig_dict(gold)
        ptk = {(k, v) for k, v in pt.items()}
        tp_id = sum(1 for (k, _v) in ptk if k in gt)
        tp_cls = sum(1 for (k, v) in ptk if gt.get(k) == v)
        # arguments: each (trigger, span) row is unique (deduped below),
        # so frame rows == the reference's dict-collapsed entry list
        pfmt = [
            ((c, t, s, e), pt[(c, t, tix)], r)
            for (c, t, tix, _et, s, e, r) in pred
            if (c, t, tix) in pt
        ]
        gfmt = [
            ((c, t, s, e), gt[(c, t, tix)], r)
            for (c, t, tix, _et, s, e, r) in gold
            if (c, t, tix) in gt
        ]
        a_id = sum(1 for e_ in pfmt if any(e_[:2] == g_[:2] for g_ in gfmt))
        a_cls = sum(1 for e_ in pfmt if any(e_ == g_ for g_ in gfmt))
        return (len(ptk), len(gt), tp_id, tp_cls,
                len(pfmt), len(gfmt), a_id, a_cls)

    # make trigger labels consistent per trigger key (operator's distinct
    # assumes label is a function of the trigger): relabel by hash
    def relabel(rows):
        return [
            (c, t, tix, types[(tix + int(c)) % 2], s, e, r)
            for (c, t, tix, _et, s, e, r) in rows
        ]

    pred_rows, gold_rows = relabel(pred_rows), relabel(gold_rows)
    # dedupe (trigger, span) per side like the reference dicts
    def ded(rows):
        d = {}
        for row in rows:
            d[(row[0], row[1], row[2], row[4], row[5])] = row
        return sorted(d.values())

    pred_rows, gold_rows = ded(pred_rows), ded(gold_rows)
    exp = counts(pred_rows, gold_rows)
    out = KE.event_f1_4way(frame(pred_rows), frame(gold_rows)).collect()[0]
    got = (out["n_pred_trig"], out["n_gold_trig"], out["tp_trig_id"],
           out["tp_trig_class"], out["n_pred_arg"], out["n_gold_arg"],
           out["tp_arg_id"], out["tp_arg_class"])
    assert got == exp


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


# ------------------------------------------------------------- ie_errors

def _err_frames(spark, pred_rows, gold_rows, convs):
    pred = spark.createDataFrame(
        pred_rows, "conv_id string, arg0 string, arg1 string, "
        "label string, conf double")
    gold = spark.createDataFrame(
        gold_rows, "conv_id string, arg0 string, arg1 string, label string")
    docs = spark.createDataFrame(
        [(c, f"doc {c}") for c in convs], "conv_id string, doc_text string")
    return pred, gold, docs


def test_ie_errors_gate_strictly_below_half(spark):
    """fc/np < 0.5 gates the doc (eval_utils.py:1003) — exactly half
    agreement does NOT list the doc; one notch below does."""
    # c1: 2 preds, 1 matched -> 1/2, not listed
    # c2: 2 preds, 0 matched -> listed
    pred, gold, docs = _err_frames(
        spark,
        [("c1", "spark", "flink", "uses", 0.9),
         ("c1", "xx", "yy", "uses", 0.5),
         ("c2", "aa", "bb", "uses", 0.9),
         ("c2", "cc", "dd", "uses", 0.8)],
        [("c1", "spark", "flink", "uses"), ("c2", "qq", "rr", "uses")],
        ["c1", "c2"],
    )
    out = KE.ie_errors(pred, gold, docs).collect()
    assert {r["conv_id"] for r in out} == {"c2"}
    # c2 rows: 1 gold row + 2 unmatched pred rows
    gold_side = [r for r in out if r["pred_label"] == ""]
    pred_side = [r for r in out if r["gold_label"] == ""]
    assert len(gold_side) == 1 and gold_side[0]["arg0_gold"] == "qq"
    assert {(r["arg0_pred"], r["arg1_pred"]) for r in pred_side} == {
        ("aa", "bb"), ("cc", "dd")}
    assert all(r["text"] == "doc c2" for r in out)


def test_ie_errors_pred_shadowing_gold_pair_suppressed(spark):
    """A wrong-label pred on a gold argument pair is NOT listed as a
    pred error (the shared seen_rels set, eval_utils.py:1010-1016) —
    the gold row for that pair already tells the story."""
    pred, gold, docs = _err_frames(
        spark,
        [("c1", "spark", "flink", "WRONG", 0.9),
         ("c1", "other", "thing", "uses", 0.4)],
        [("c1", "spark", "flink", "uses")],
        ["c1"],
    )
    out = KE.ie_errors(pred, gold, docs).collect()
    # 0 matches / 2 preds -> listed; gold row + only the non-shadowing pred
    pred_side = [r for r in out if r["gold_label"] == ""]
    assert len(out) == 2 and len(pred_side) == 1
    assert pred_side[0]["arg0_pred"] == "other"


def test_ie_errors_dedup_and_substring_match(spark):
    """Duplicate preds per argument pair keep max conf (tie -> min
    label); substring matching is bidirectional per argument."""
    pred, gold, docs = _err_frames(
        spark,
        [("c1", "aa", "bb", "z_label", 0.9),
         ("c1", "aa", "bb", "a_label", 0.9),
         ("c1", "aa", "bb", "m_label", 0.1),
         # substring-matches the gold (arg containment both directions)
         ("c1", "the spark engine", "flink", "uses", 0.8),
         ("c1", "unmatched", "row", "uses", 0.2)],
        [("c1", "spark", "flink runtime", "uses"),
         ("c1", "gold-only", "pair", "uses")],
        ["c1"],
    )
    out = KE.ie_errors(pred, gold, docs).collect()
    # 1 match / 5 preds -> listed
    pred_side = sorted(
        (r for r in out if r["gold_label"] == ""),
        key=lambda r: r["arg0_pred"])
    assert [(r["arg0_pred"], r["pred_label"]) for r in pred_side] == [
        ("aa", "a_label"), ("unmatched", "uses")]
    gold_side = [r for r in out if r["pred_label"] == ""]
    assert len(gold_side) == 2


def test_ie_errors_doc_needs_both_sides(spark):
    """Docs missing from either frame never enter the loop
    (eval_utils.py:974-975): pred-only and gold-only docs emit nothing."""
    pred, gold, docs = _err_frames(
        spark,
        [("pred_only", "aa", "bb", "uses", 0.9)],
        [("gold_only", "cc", "dd", "uses")],
        ["pred_only", "gold_only"],
    )
    assert KE.ie_errors(pred, gold, docs).count() == 0
