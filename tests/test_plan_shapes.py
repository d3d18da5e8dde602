"""Physical-plan shape assertions: the scale story, machine-checked.

These tests pin the plan properties the 100 TB design depends on — if a
refactor silently adds a shuffle to the flagship path, demotes a broadcast
join to sort-merge, or stops filter pushdown reaching the parquet scan,
they fail. `.explain("formatted")` output is matched on operator names,
not exact trees, so Spark-version cosmetic drift doesn't break them.
"""

from __future__ import annotations

import re

import pytest
import pyspark.sql.functions as F

from dygiepp_spark import tables as TT
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.operators import linking as LK
from dygiepp_spark.operators import similarity as SIM


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(plan: str) -> int:
    # count shuffle Exchange nodes in the formatted detail section;
    # BroadcastExchange is free of the all-to-all cost this counts
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))


@pytest.fixture(scope="module")
def stored_turns(spark, sf_dir, tmp_path_factory):
    """Turns materialized to parquet — the production shape (turns come
    off an Iceberg/parquet table, not a derivation subtree)."""
    p = str(tmp_path_factory.mktemp("plans") / "turns")
    TT.turns_from_documents(spark, sf_dir, with_ts=False).write.mode(
        "overwrite"
    ).parquet(p)
    return spark.read.parquet(p)


def test_emit_triples_single_shuffle(spark, stored_turns):
    """The flagship path's load-bearing property: tokenize, mention
    detect, beam, and pair generation are ROW-LOCAL array expressions —
    the ONLY shuffle is the final triple-dedup aggregation."""
    plan = plan_of(EX.emit_triples(stored_turns))
    assert count_shuffles(plan) == 1, plan


def test_emit_triples_column_pruning(spark, stored_turns):
    """The scan must read only the columns the query touches (conv_id,
    text) — a scan fetching role/tool/ts for a triple query is wrong."""
    plan = plan_of(EX.emit_triples(stored_turns))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "conv_id" in schema and "text" in schema
    assert "role" not in schema and "tool" not in schema


def test_parquet_filter_pushdown(spark, sf_dir):
    docs = TT.load_documents(spark, sf_dir).filter(
        F.col("doc_id") > 100
    ).select("doc_id")
    plan = plan_of(docs)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(doc_id,100\)", plan), plan


def test_entity_linking_broadcasts_the_dictionary(spark, stored_turns):
    """The entity dictionary is a small dim — the link join must be a
    broadcast hash join, never a sort-merge shuffle of the mention side."""
    linked = LK.link_mentions(
        EX.detect_mentions(stored_turns), TT.entity_dict(spark)
    )
    plan = plan_of(linked)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ann_brute_force_broadcasts_queries(spark, sf_dir):
    """Exact ANN = broadcast the query set over ONE corpus scan; the only
    shuffle ranks per-query candidates (tiny key space)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(SIM.brute_force_topk(emb))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_relation_pairs_conv_local_join(spark, stored_turns):
    """The pair self-join's equi-keys must include the conv/turn grouping
    (band predicate evaluated at the probe) — a cartesian or
    broadcast-nested-loop here would be quadratic in the corpus."""
    pairs = EX.relation_pairs(EX.detect_mentions(stored_turns))
    plan = plan_of(pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
