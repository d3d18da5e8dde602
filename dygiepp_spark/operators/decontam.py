"""Benchmark decontamination: exact token-n-gram overlap between a
training corpus and an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C, Llama/Gopher
reports use 8-13-gram exact collision): a corpus document is contaminated
if it shares at least one length-``n`` token n-gram with any benchmark
document. This is deliberately a DIFFERENT shape from near-dup detection
(dedup.py): the benchmark side is tiny (thousands of eval documents vs
billions of corpus documents), so the scale plan is a **broadcast
semi-join on the gram**, not banded LSH —

* corpus side: one pass, explode per-document DISTINCT n-grams
  (``array_distinct`` before the explode keeps within-doc duplicates off
  the wire), never materializing a per-doc gram set in an aggregation;
* benchmark side: distinct grams collected into a broadcast hash relation
  (an eval suite is MBs of grams — it fits every executor);
* the join is gram-equality against the broadcast, followed by ONE
  map-side-combinable per-doc count. No shuffle touches the corpus-sized
  frame beyond the final doc-keyed agg of hit rows (hits are rare by
  construction, so that agg is tiny).

``n`` defaults to 3 here because the synthetic docs are ~40 tokens drawn
from a small vocabulary; production uses 8-13 with the same plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

from dygiepp_spark.functions.text import tokens_col

NGRAM_N = 3


def doc_ngrams(df: DataFrame, n: int = NGRAM_N, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, gram) with per-document distinct length-n token n-grams."""
    toks = tokens_col(F.col(text_col))
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda t, i: F.concat_ws(
            " ", F.slice(toks, i + 1, n)
        ),
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus-document contamination report:
    (doc_id, n_grams, n_hit_grams, contam_frac, contaminated).

    ``n_grams`` counts the document's distinct n-grams; ``n_hit_grams``
    how many of them occur anywhere in the benchmark;
    ``contaminated`` = n_hit_grams > 0 (the filter a pipeline applies).
    Documents shorter than ``n`` tokens have 0 grams and are clean.
    """
    cg = doc_ngrams(corpus, n, id_col, text_col)
    bg = (
        doc_ngrams(benchmark, n, id_col, text_col)
        .select("gram")
        .distinct()
    )
    per_doc = cg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cg.join(broadcast(bg), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    out = per_doc.join(hits, id_col, "left")
    n_hit = F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("bigint")
    base = corpus.select(F.col(id_col)).join(out, id_col, "left")
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint")
    return base.select(
        id_col,
        n_grams.alias("n_grams"),
        n_hit.alias("n_hit_grams"),
        F.when(
            n_grams > 0, n_hit.cast("double") / n_grams.cast("double")
        ).otherwise(F.lit(0.0)).alias("contam_frac"),
        (n_hit > 0).alias("contaminated"),
    )
