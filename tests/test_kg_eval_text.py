"""Unit tests for the eval layer (K1-K7, G1), text analysis, multimodal
plumbing, and the streaming wrapper — semantic checks independent of the
DuckDB oracle parity gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dygiepp_spark import tables as TT
from dygiepp_spark.functions import text as TX
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.operators import kg_eval as KE
from dygiepp_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def turns(spark, sf_dir):
    return TT.turns_from_documents(spark, sf_dir, with_ts=False).cache()


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, arg0 string, arg1 string, label string, conf double"
    )


def test_ie_eval_perfect_match(spark):
    g = _triples(spark, [("c1", "a", "b", "R", 1.0), ("c2", "x", "y", "S", 0.5)])
    out = KE.ie_eval(g, g, "exact").collect()[0]
    assert out["precision"] == 1.0 and out["recall"] == 1.0 and out["f1"] == 1.0


def test_ie_eval_label_mismatch_not_counted(spark):
    p = _triples(spark, [("c1", "a", "b", "WRONG", 1.0)])
    g = _triples(spark, [("c1", "a", "b", "R", 1.0)])
    out = KE.ie_eval(p, g, "exact").collect()[0]
    assert out["tp"] == 0 and out["f1"] == 0.0


def test_ie_eval_substring_matches_partial(spark):
    p = _triples(spark, [("c1", "the table", "row", "R", 1.0)])
    g = _triples(spark, [("c1", "table", "row", "R", 1.0)])
    exact = KE.ie_eval(p, g, "exact").collect()[0]
    sub = KE.ie_eval(p, g, "substring").collect()[0]
    assert exact["tp"] == 0 and sub["tp"] == 1


def test_ie_eval_topk_cuts_by_confidence(spark):
    p = _triples(
        spark,
        [("c1", "a", "b", "R", 0.9), ("c1", "bad", "bad", "R", 0.1)],
    )
    g = _triples(spark, [("c1", "a", "b", "R", 1.0)])
    out = KE.ie_eval(p, g, "exact", topk=1).collect()[0]
    # the low-confidence wrong triple is cut, so precision is 1.0
    assert out["tp"] == 1 and out["precision"] == 1.0


def test_gold_first_occurrence_label(spark, turns):
    gold = KE.gold_triples(turns)
    # deduped per (conv, arg0, arg1)
    assert (
        gold.groupBy("conv_id", "arg0", "arg1").count().filter("count > 1").count()
        == 0
    )


def test_transitive_closure_adds_composed_edges(spark):
    g = _triples(
        spark, [("c1", "a", "b", "R", 0.5), ("c1", "b", "c", "R", 0.5)]
    ).select("conv_id", "arg0", "arg1", "conf")
    out = KE.transitive_closure(g, rounds=2)
    rows = {(r["arg0"], r["arg1"]): r["conf"] for r in out.collect()}
    assert rows[("a", "c")] == 0.25
    assert len(rows) == 3


def test_transitive_closure_max_conf_on_multiple_paths(spark):
    g = spark.createDataFrame(
        [
            ("c1", "a", "b", 0.9),
            ("c1", "b", "c", 0.9),
            ("c1", "a", "x", 0.1),
            ("c1", "x", "c", 0.1),
        ],
        "conv_id string, arg0 string, arg1 string, conf double",
    )
    out = KE.transitive_closure(g, rounds=2)
    ac = [r["conf"] for r in out.filter("arg0 = 'a' and arg1 = 'c'").collect()]
    assert ac == [pytest.approx(0.81)]


def test_micro_prf_counts(spark):
    p = _triples(spark, [("c1", "a", "b", "R", 1.0), ("c1", "q", "w", "R", 1.0)])
    g = _triples(spark, [("c1", "a", "b", "R", 1.0), ("c1", "z", "z", "R", 1.0)])
    out = KE.micro_prf(p, g).collect()[0]
    assert (out["tp"], out["fp"], out["fn"]) == (1, 1, 1)
    assert out["precision"] == 0.5 and out["recall"] == 0.5


# ------------------------------------------------------------------
# text analysis
# ------------------------------------------------------------------

def test_token_counts(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id bigint, text string")
    out = TX.bpe_ish_token_count(TX.word_token_count(df)).collect()[0]
    assert out["n_tokens"] == 3
    # ceil(5/4)+ceil(4/4)+ceil(5/4) = 2+1+2
    assert out["n_bpe_tokens"] == 5


def test_langid_picks_english(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat"), (2, "zzz qqq www")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in TX.langid(df).collect()}
    assert out[1] == "en"
    assert out[2] == "und"


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame(
        [(1, "the a of and is table row join" * 3), (2, "x")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["quality"] for r in TX.quality_score(df).collect()}
    assert out[1] > out[2]


def test_fingerprint_stable_and_discriminative(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different content here")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: (r["fp_0"], r["fp_1"], r["fp_2"], r["fp_3"])
            for r in TX.fingerprint(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


# ------------------------------------------------------------------
# multimodal plumbing
# ------------------------------------------------------------------

def test_image_meta_matches_python(spark):
    df = spark.createDataFrame([(7, "Hello world payload")], "doc_id bigint, text string")
    out = MM.image_metadata(df).collect()[0]
    raw = "Hello world payload".encode()
    assert out["n_bytes"] == len(raw)
    assert out["width"] == 1 + raw[0] % 64
    assert out["height"] == 1 + raw[1] % 64
    assert out["checksum"] == sum(raw[::16]) % 256


def test_decode_image_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xxx")


def test_frame_samples_stride(spark):
    df = spark.createDataFrame([(1, "a" * 33)], "doc_id bigint, text string")
    out = MM.frame_samples(df).collect()[0]
    assert out["n_frames"] == 3  # bytes 0, 16, 32


# ------------------------------------------------------------------
# streaming == batch for stateless stages
# ------------------------------------------------------------------

def test_streaming_mentions_equals_batch(spark, sf_dir, tmp_path):
    from dygiepp_spark.streaming import stream as ST

    turns = TT.turns_from_documents(spark, sf_dir, with_ts=False)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    turns.write.mode("overwrite").parquet(in_dir)
    ST.run_mentions_stream(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    want = EX.detect_mentions(turns)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
