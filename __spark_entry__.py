"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG triple-extraction query on sf0.001.
``queries()`` maps every implemented operator (SURVEY.md §2) to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB twin.
The transcript input itself is derived deterministically from the
``documents`` view in BOTH engines (see dygiepp_spark.tables.TURNS_SQL), so
the full pipeline — doc assembly, tokenization, mention/trigger detection,
pair generation, triple emission, linking, canonicalization — is oracle-
checked end to end.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dygiepp_spark import oracles
from dygiepp_spark import tables as TT
from dygiepp_spark.operators import doc_assembly as DA
from dygiepp_spark.operators import extraction as EX
from dygiepp_spark.operators import spans as SP


def _turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TT.turns_from_documents(spark, sf_dir, with_ts=False)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: turns -> mentions -> (subj, pred, obj) triples."""
    turns = _turns(spark, "/root/testdata/sf0.001")
    return EX.emit_triples(turns)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_turns(spark, sf_dir):
    return _turns(spark, sf_dir)


def q_doc_assembly(spark, sf_dir):
    return DA.assemble_documents(
        TT.turns_from_documents(spark, sf_dir, with_ts=True)
    ).select("conv_id", "n_turns", "doc_text")


def q_sentence_offsets(spark, sf_dir):
    return DA.with_sentence_offsets(_turns(spark, sf_dir)).select(
        "conv_id", "turn_idx", "n_tokens", "sentence_start"
    )


def q_mentions(spark, sf_dir):
    return EX.detect_mentions(_turns(spark, sf_dir))


def q_span_enum(spark, sf_dir):
    spans = SP.enumerate_spans(_turns(spark, sf_dir), max_width=8)
    return spans.groupBy("conv_id", "turn_idx").agg(
        F.count(F.lit(1)).alias("n_spans")
    )


def q_triples(spark, sf_dir):
    return EX.emit_triples(_turns(spark, sf_dir))


def q_triples_mechanism(spark, sf_dir):
    return EX.triples_to_mechanism(EX.emit_triples(_turns(spark, sf_dir)))


def q_events(spark, sf_dir):
    return EX.extract_events(_turns(spark, sf_dir))


def q_events_binary(spark, sf_dir):
    return EX.events_binary_decode(EX.extract_events(_turns(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "turns": q_turns,
        "doc_assembly": q_doc_assembly,
        "sentence_offsets": q_sentence_offsets,
        "mentions": q_mentions,
        "span_enum": q_span_enum,
        "triples": q_triples,
        "triples_mechanism": q_triples_mechanism,
        "events": q_events,
        "events_binary": q_events_binary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "turns": oracles.turns_oracle(),
        "doc_assembly": oracles.doc_assembly_oracle(),
        "sentence_offsets": oracles.sentence_offsets_oracle(),
        "mentions": oracles.mentions_oracle(),
        "span_enum": oracles.span_enum_oracle(),
        "triples": oracles.triples_oracle(),
        "triples_mechanism": oracles.triples_mechanism_oracle(),
        "events": oracles.events_oracle(),
        "events_binary": oracles.events_binary_oracle(),
    }
