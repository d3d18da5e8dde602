"""Stage-1 invariants: turn-text equality under stable ordering (the
north-rule per-row invariant), offset arithmetic, chunking, skew path."""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark import tables as TT
from dygiepp_spark.operators import doc_assembly as DA


def test_roundtrip_and_dense_turns(spark, sf_dir):
    turns = TT.turns_from_documents(spark, sf_dir)
    violations = DA.check_turn_invariant(turns)
    assert violations.count() == 0


def test_sentence_offsets_are_shifted_cumsum(spark, sf_dir):
    turns = TT.turns_from_documents(spark, sf_dir)
    off = DA.with_sentence_offsets(turns)
    rows = (
        off.filter(F.col("conv_id") == "1")
        .orderBy("turn_idx")
        .select("turn_idx", "n_tokens", "sentence_start")
        .collect()
    )
    assert rows[0]["sentence_start"] == 0
    acc = 0
    for r in rows:
        assert r["sentence_start"] == acc
        acc += r["n_tokens"]


def test_assemble_matches_document_text(spark, sf_dir):
    # doc_text of the assembled conversation == original document text
    # (token-normalized): per-turn text equality implies whole-doc equality
    docs = TT.load_documents(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.array_join(
            F.filter(F.split("text", " "), lambda t: t != ""), " "
        ).alias("orig"),
    )
    assembled = DA.assemble_documents(TT.turns_from_documents(spark, sf_dir))
    joined = assembled.join(docs, "conv_id")
    assert joined.filter(F.col("doc_text") != F.col("orig")).count() == 0


def test_synth_turns_deterministic_and_skewed(spark):
    a = TT.synth_turns(spark, n_convs=50, max_turns=64)
    b = TT.synth_turns(spark, n_convs=50, max_turns=64)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    per_conv = a.groupBy("conv_id").count().collect()
    counts = {r["conv_id"]: r["count"] for r in per_conv}
    assert counts["c0"] == 64  # head of the Zipf tail
    assert min(counts.values()) >= 2
    assert counts["c0"] > 4 * counts[min(counts, key=counts.get)]


def test_chunking_bounds_group_size(spark):
    turns = TT.synth_turns(spark, n_convs=10, max_turns=300, tokens_per_turn=12)
    chunked = DA.assign_chunks(turns, max_tokens_per_chunk=500)
    sizes = (
        chunked.groupBy("conv_id", "chunk_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    )
    # each chunk holds <= cap + one turn of overshoot
    assert all(r["tok"] <= 500 + 12 for r in sizes)
    # the long conversation got split
    n_chunks_c0 = len({r["chunk_id"] for r in sizes if r["conv_id"] == "c0"})
    assert n_chunks_c0 >= 5
