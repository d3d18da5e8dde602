"""Tests for the collate/uncollate batch-shaping operators and the
checkpointed Pipeline (resumability + per-partition lineage)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark import tables as TT
from dygiepp_spark.operators import collate as CL
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.plans.pipeline import Pipeline


def _turns(spark, sf_dir):
    return TT.turns_from_documents(spark, sf_dir, with_ts=False)


def test_collate_honors_both_caps(spark, sf_dir):
    packed = CL.collate(_turns(spark, sf_dir), cost_cap=2000, max_sents=8).cache()
    per_bin = packed.groupBy("pseudo_doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cost").alias("c")
    )
    max_item = packed.agg(F.max("cost")).collect()[0][0]
    assert per_bin.filter(F.col("n") > 8).count() == 0
    # prefix-bucketing: bin cost can exceed the cap by at most one item
    assert per_bin.filter(F.col("c") > 2000 + max_item).count() == 0
    # the reference's point: bins balance work — every bin except the last
    # two holds either the max count or a near-cap cost
    packed.unpersist()


def test_collate_slots_dense_and_ordered(spark, sf_dir):
    packed = CL.collate(_turns(spark, sf_dir))
    bad = (
        packed.groupBy("pseudo_doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("slot").alias("mn"),
            F.max("slot").alias("mx"),
        )
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
    )
    assert bad.count() == 0


def test_uncollate_roundtrip(spark, sf_dir):
    turns = _turns(spark, sf_dir)
    restored = CL.uncollate(CL.collate(turns))
    orig = turns.select("conv_id", "turn_idx", "text")
    assert restored.exceptAll(orig).count() == 0
    assert orig.exceptAll(restored).count() == 0


def test_pipeline_checkpoint_and_resume(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")

    def build(p: Pipeline) -> Pipeline:
        @p.stage("turns")
        def s_turns(ctx):
            return _turns(spark, sf_dir)

        @p.stage("mentions")
        def s_mentions(ctx):
            return EX.detect_mentions(ctx["turns"])

        return p

    p1 = build(Pipeline(spark, wh))
    out1 = p1.run()
    assert [r.resumed for r in p1.results] == [False, False]
    n_mentions = out1["mentions"].count()

    # metrics table exists with per-partition rows summing to the total
    metrics = spark.read.parquet(f"{wh}/mentions/_metrics")
    assert metrics.agg(F.sum("rows")).collect()[0][0] == n_mentions
    assert set(metrics.columns) >= {"stage", "partition_id", "rows", "stage_wall_sec"}

    # second run resumes every stage from its checkpoint
    p2 = build(Pipeline(spark, wh))
    out2 = p2.run()
    assert [r.resumed for r in p2.results] == [True, True]
    assert out2["mentions"].count() == n_mentions


def test_full_kg_pipeline_runs_and_resumes(spark, sf_dir, tmp_path):
    from dygiepp_spark.plans.pipeline import build_kg_pipeline

    wh = str(tmp_path / "wh")
    p1 = build_kg_pipeline(spark, wh, sf_dir)
    ctx = p1.run()
    assert set(ctx) >= {
        "turns", "mentions", "triples", "coref_clusters",
        "canonical_entities", "kg_edges", "kg_edges_agg", "eval_exact",
    }
    assert ctx["triples"].count() > 0
    assert ctx["eval_exact"].collect()[0]["f1"] > 0
    assert not any(r.resumed for r in p1.results)

    # second run resumes EVERY stage from the manifests
    p2 = build_kg_pipeline(spark, wh, sf_dir)
    ctx2 = p2.run()
    assert all(r.resumed for r in p2.results)
    assert ctx2["triples"].count() == ctx["triples"].count()

    # module gating: coref/eval stages can be switched off like the
    # reference's zero loss weights
    p3 = build_kg_pipeline(spark, str(tmp_path / "wh2"), sf_dir,
                           with_coref=False, with_eval=False)
    names = [n for n, _ in p3.stages]
    assert "coref_clusters" not in names and "eval_exact" not in names
