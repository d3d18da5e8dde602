"""Streaming wrapper tests: the foreachBatch triple stream equals the
batch pipeline when a conversation's turns arrive within one micro-batch,
and checkpointing makes re-drains idempotent (no reprocessing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark import tables as TT
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.streaming import stream as ST


def test_triples_stream_equals_batch(spark, sf_dir, tmp_path):
    turns = TT.turns_from_documents(spark, sf_dir, with_ts=False)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # one file -> one micro-batch -> per-batch pipeline == batch pipeline
    turns.coalesce(1).write.mode("overwrite").parquet(in_dir)
    ST.run_triples_stream(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir).drop("batch_id")
    want = EX.emit_triples(turns)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_triples_stream_checkpoint_idempotent(spark, sf_dir, tmp_path):
    turns = TT.turns_from_documents(spark, sf_dir, with_ts=False)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    turns.coalesce(1).write.mode("overwrite").parquet(in_dir)
    ST.run_triples_stream(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    # second drain with the same checkpoint: no new files, no duplicates
    ST.run_triples_stream(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1
