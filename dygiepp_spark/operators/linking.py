"""Entity linking: mention surface -> canonical entity id (broadcast join).

The dictionary side is small (at production: an Iceberg dim table of
canonical entities, still orders of magnitude under the broadcast
threshold), so the join is an explicit ``F.broadcast`` — zero shuffle on
the 100 TB mention side. Analog of the fork's surface->label maps
(/root/reference/eval_utils.py:55-145) combined with the coref-exemplar
canonical-entity rule (dw-experiments/shared/coref_to_tsv.py:11-33).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def normalize_surface(col) -> Column:
    """K1 'exact' matching normalization: strip + lower
    (eval_utils.py:183-189)."""
    return F.lower(F.trim(col))


def link_mentions(mentions: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Broadcast-join mentions to the canonical-entity dictionary.

    Unlinked mentions (no dictionary hit) keep a deterministic surface-keyed
    id ``S:<normalized surface>`` so downstream canonicalization can still
    cluster them; linked ones get the dictionary entity_id.
    """
    dict_norm = entity_dict.select(
        normalize_surface(F.col("surface")).alias("_k"),
        "entity_id",
        "canonical_text",
        "type",
    )
    m = mentions.withColumn("_k", normalize_surface(F.col("surface")))
    out = m.join(F.broadcast(dict_norm), on="_k", how="left")
    return (
        out.withColumn(
            "entity_id",
            F.coalesce(F.col("entity_id"), F.concat(F.lit("S:"), F.col("_k"))),
        )
        .withColumn("canonical_text", F.coalesce(F.col("canonical_text"), F.col("surface")))
        .withColumn("type", F.coalesce(F.col("type"), F.lit("UNKNOWN")))
        .drop("_k")
    )
