"""PII detection / scrubbing for training-data pipelines.

A 100 TB pre-training corpus pass has to find and mask personally
identifiable information before anything downstream sees the text. The
operators here are pure JVM-side regex column expressions (``regexp_count``
/ ``regexp_replace`` — whole-stage codegen, no Python in the hot path),
with DuckDB SQL twins in :mod:`dygiepp_spark.oracles_data`.

The regex patterns are deliberately restricted to the syntax subset that
Java ``util.regex`` (Spark) and RE2 (DuckDB, and most scale-out regex
engines) interpret identically: character classes, bounded repetition,
alternation — no backreferences, no lookaround. That keeps the operator
portable AND keeps it in the linear-time regex family, which matters when
the pattern runs over every byte of the corpus.

The synthetic corpus contains no real PII, so :func:`with_synthetic_pii`
deterministically injects an email + phone + long-id per document (derived
from ``doc_id`` alone) — the parity query runs detect/scrub over that
augmented text so every pattern is exercised observably in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: syntax valid and equivalent in Java regex AND RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
LONGNUM_RE = r"[0-9]{9,}"

#: mask tokens (fixed-width, so scrubbed text length is deterministic)
EMAIL_MASK = "<EMAIL>"
PHONE_MASK = "<PHONE>"
LONGNUM_MASK = "<NUM>"


def with_synthetic_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically append synthetic PII derived from ``doc_id``:
    ``... contact user<id>@example.com or call +1 555-<id%10000, lpad 4>
    ref <id*1000003+999999937>``. Same expression exists as SQL in the
    oracle twin; both engines produce byte-identical augmented text."""
    did = F.col("doc_id").cast("string")
    phone_tail = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    longnum = (F.col("doc_id") * 1000003 + 999999937).cast("string")
    return docs.withColumn(
        text_col,
        F.concat(
            F.col(text_col),
            F.lit(" contact user"), did, F.lit("@example.com"),
            F.lit(" or call +1 555-"), phone_tail,
            F.lit(" ref "), longnum,
        ),
    )


def _counts(text: Column) -> list[Column]:
    return [
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(text, F.lit(LONGNUM_RE)).alias("n_longnums"),
    ]


def scrub_col(text: Column) -> Column:
    """Masked text: emails first (their local parts may contain digit runs
    that must NOT be half-eaten by the number pass), then phones, then
    bare long digit runs. Order is part of the contract."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_MASK)
    out = F.regexp_replace(out, PHONE_RE, PHONE_MASK)
    return F.regexp_replace(out, LONGNUM_RE, LONGNUM_MASK)


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detect + mask in one narrow projection (no shuffle, no Python):
    (id, n_emails, n_phones, n_longnums, clean_text). At 100 TB this is a
    single codegen'd scan stage; the regex work is the only cost and it is
    linear-time per byte in both engines' regex families."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        *_counts(text),
        scrub_col(text).alias("clean_text"),
    )
