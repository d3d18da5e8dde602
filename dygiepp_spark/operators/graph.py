"""KG materialization: nodes/edges tables with per-partition lineage.

Output data model (SURVEY.md §1.3):

* ``nodes(entity_id, canonical_text, type)``
* ``edges(subj_id, pred, obj_id, conv_id, conf, provenance)``

At production these are Iceberg tables written with ``MERGE``/append;
in the sandbox we write parquet (the writer abstracts over both —
see dygiepp_spark.plans.pipeline for the checkpoint/lineage machinery).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dygiepp_spark.operators.extraction import detect_mentions, relation_pairs
from dygiepp_spark.operators.linking import link_mentions


def build_edges(turns: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Triples with both endpoints resolved to canonical entity ids.

    Link-BEFORE-pair: the entity dictionary is broadcast-joined onto the
    mention frame first (narrow, no shuffle on the big side), so the pair
    self-join carries subj_id/obj_id through and no post-join lookup is
    needed — two fewer shuffles than the pair-then-link formulation, and
    a future per-mention neural linker slots into the same position.
    """
    mentions = detect_mentions(turns)
    linked = link_mentions(mentions, entity_dict).select(
        "conv_id", "turn_idx", "start", "end", "surface", "entity_id"
    )
    pairs = relation_pairs(linked)
    return pairs.select(
        "subj_id",
        F.col("label").alias("pred"),
        "obj_id",
        "conv_id",
        "turn_idx",
        "conf",
        F.concat_ws(
            ":", F.lit("extract"), F.col("conv_id"), F.col("turn_idx"),
            F.col("s1"), F.col("s2"),
        ).alias("provenance"),
    )


def build_nodes(turns: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Distinct canonical nodes referenced by any mention."""
    mentions = detect_mentions(turns)
    linked = link_mentions(mentions, entity_dict)
    return (
        linked.groupBy("entity_id")
        .agg(
            F.min("canonical_text").alias("canonical_text"),
            F.min("type").alias("type"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
    )


def aggregate_edges(edges: DataFrame) -> DataFrame:
    """Roll per-occurrence edges up to distinct (subj, pred, obj) with
    support counts and max confidence — the graph-level dedup that turns
    occurrence streams into KG edges."""
    return edges.groupBy("subj_id", "pred", "obj_id").agg(
        F.count(F.lit(1)).alias("support"),
        F.max("conf").alias("max_conf"),
        F.count_distinct("conv_id").alias("n_convs"),
    )
