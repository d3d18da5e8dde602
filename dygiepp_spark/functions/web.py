"""URL / domain operators for web-corpus curation.

Every web-scale training-data pipeline carries a URL hygiene pass:
extract URLs from text, reduce them to registered domains, and drop
documents that cite blocklisted domains (spam/SEO/adult lists run to
millions of entries). The operators here are JVM-side column expressions
(``regexp_extract_all`` + array lambdas — whole-stage codegen) plus ONE
broadcast left-join against the blocklist dimension: the blocklist is
small relative to the corpus (10^6-10^7 rows vs 10^10 docs), which is
exactly the broadcast-join regime; an ``isin`` literal list would not
scale past a few hundred entries.

Regex patterns use the Java-regex/RE2-common subset (see
dygiepp_spark.functions.privacy for the portability contract), so the
DuckDB oracle twin interprets them identically.

The synthetic corpus has no URLs, so :func:`with_synthetic_urls`
deterministically injects two per document (derived from ``doc_id``
alone); the parity query runs extraction + blocklist over the augmented
text so every code path is exercised observably in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

#: portable (Java regex == RE2) URL matcher: scheme + host, optional path
URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"
HOST_RE = r"https?://([A-Za-z0-9.-]+)"

#: registered domains blocked in the synthetic corpus (stand-in for the
#: production blocklist dimension table)
DEFAULT_BLOCKLIST = ["example0.com", "example3.com", "example5.com"]


def with_synthetic_urls(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append two deterministic URLs per doc:
    ``https://host<id%1000>.example<id%7>.com/p/<id>`` and
    ``http://www.site<id*7%500>.org/a<id%13>``. Byte-identical twin in
    the oracle SQL."""
    did = F.col("doc_id").cast("bigint")
    return docs.withColumn(
        text_col,
        F.concat(
            F.col(text_col),
            F.lit(" see https://host"), (did % 1000).cast("string"),
            F.lit(".example"), (did % 7).cast("string"),
            F.lit(".com/p/"), did.cast("string"),
            F.lit(" and http://www.site"), ((did * 7) % 500).cast("string"),
            F.lit(".org/a"), (did % 13).cast("string"),
        ),
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a hostname — the public-suffix-list-lite
    rule ('host7.example3.com' -> 'example3.com'). A single-label host
    (e.g. 'localhost') passes through unchanged — without the guard,
    ``concat_ws`` would silently skip the NULL ``element_at(-2)`` and
    diverge from a SQL ``labels[-2] || '.' || labels[-1]`` twin.
    Production swaps in a broadcast PSL lookup; the column shape is
    identical."""
    labels = F.split(host, r"\.")
    return F.when(F.size(labels) >= 2, F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )).otherwise(host)


def default_blocklist(spark: SparkSession) -> DataFrame:
    """The blocklist dimension: (blocked_domain). Tiny here; 10^6-row in
    production — still broadcast-side."""
    return spark.createDataFrame(
        [(d,) for d in DEFAULT_BLOCKLIST], ["blocked_domain"]
    )


def url_stats(
    docs: DataFrame, blocklist: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document URL hygiene: (doc_id, n_urls, n_blocked, keep).

    Plan: one narrow projection extracts URLs and reduces each to its
    registered domain (array lambdas, no shuffle), explode_outer keeps
    URL-free docs, ONE broadcast left-join marks blocked domains, one
    map-side-combinable groupBy folds back to doc grain. No Python
    anywhere; the only shuffle is the final doc_id aggregation.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    regdoms = F.transform(
        urls, lambda u: registered_domain(F.regexp_extract(u, HOST_RE, 1))
    )
    exploded = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode_outer(regdoms).alias("rd"),
    )
    marked = exploded.join(
        F.broadcast(blocklist),
        exploded["rd"] == blocklist["blocked_domain"],
        "left",
    )
    return marked.groupBy("doc_id").agg(
        F.count("rd").cast("int").alias("n_urls"),
        F.count("blocked_domain").cast("int").alias("n_blocked"),
        (F.count("blocked_domain") == 0).alias("keep"),
    )


def domain_stats(
    docs: DataFrame, blocklist: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-registered-domain corpus report — the C4/CCNet-style rollup a
    curation pass reads before choosing filters:
    (domain, n_docs, n_mentions, total_doc_tokens, is_blocked).

    Same single-explode shape as :func:`url_stats` but folded to DOMAIN
    grain: narrow URL extraction + registered-domain reduction, one
    broadcast join against the blocklist, then a TWO-level aggregation —
    first to (domain, doc_id) grain, then to domain — so
    total_doc_tokens counts each citing document's token length exactly
    ONCE regardless of how many times it mentions the domain (the
    quantity per-domain token budgeting actually wants; the r4 form
    summed per MENTION, double-counting repeat citers). Both levels are
    map-side combinable and share the domain key prefix, so the second
    exchange is a cheap re-key of the already-collapsed per-doc frame; a
    mega-domain like wikipedia.org is one hot key whose per-doc rows AQE
    splits if needed.
    """
    from dygiepp_spark.functions.text import tokens_col

    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    regdoms = F.transform(
        urls, lambda u: registered_domain(F.regexp_extract(u, HOST_RE, 1))
    )
    exploded = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).alias("n_tok"),
        F.explode(regdoms).alias("domain"),
    )
    marked = exploded.join(
        F.broadcast(blocklist),
        exploded["domain"] == blocklist["blocked_domain"],
        "left",
    )
    per_doc = marked.groupBy("domain", "doc_id").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.max("n_tok").alias("n_tok"),
        F.max(F.col("blocked_domain").isNotNull()).alias("is_blocked"),
    )
    return per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_mentions").alias("n_mentions"),
        F.sum("n_tok").alias("total_doc_tokens"),
        F.max("is_blocked").alias("is_blocked"),
    )
