"""Structured Streaming wrappers for the extraction pipeline.

The reference is batch-only (SURVEY.md §2.9), but the transcript source is
naturally a stream of turns; the extraction stages split cleanly into:

* **stateless stages** (tokenize, mention/trigger detection — narrow ops
  only): run directly on the stream, any output mode, no state store.
* **per-conversation stages** (beams, pair generation, doc assembly):
  need grouping — run via ``foreachBatch``, which hands each micro-batch
  to the full batch pipeline (the standard pattern for reusing complex
  batch logic; exactly-once via checkpointed batch ids + idempotent sink).

With ``trigger(availableNow=True)`` the same code is a catch-up batch job
— that is how the parity gate runs it (stream results == batch results on
the same input).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dygiepp_spark.operators import extraction as EX

#: schema of the parquet turn stream (ts omitted — the derived test corpus
#: is timeless; a real deployment adds ts + watermark here)
TURNS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)


def stream_turns(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of turn rows (parquet drop directory)."""
    return (
        spark.readStream.schema(TURNS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(turns_stream: DataFrame) -> DataFrame:
    """Stateless streaming mention detection — narrow ops only, so it runs
    without a state store or watermark in append mode."""
    return EX.detect_mentions(turns_stream)


def run_mentions_stream(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain the input directory through the stateless mention stream into
    a parquet sink (availableNow -> terminates when caught up)."""
    q = (
        stream_mentions(stream_turns(spark, input_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_triples_stream(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Micro-batch triple extraction via foreachBatch: each batch runs the
    FULL batch pipeline (beams + pair join + dedup) and appends.

    Note the per-batch dedup scope: triples are deduped within a micro-batch
    (same as the reference's per-document dict semantics — a conversation's
    turns arrive together in the transcript feed); cross-batch dedup, when
    conversations straddle batches, is the downstream aggregate_edges rollup.
    """

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        EX.emit_triples(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out_dir)

    q = (
        stream_turns(spark, input_dir)
        .writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
