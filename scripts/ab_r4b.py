#!/usr/bin/env python3
"""Interleaved A/B: groupBy-aggregated vs array-native minhash signatures.

The shipped ``minhash_signatures`` explodes shingles long-format and runs
one groupBy(id) with 32 min() aggregates — a shuffle over every shingle
row (k longs per id after map-side combine, but the map side still sorts/
hashes millions of rows). The candidate: compute the whole signature
ROW-LOCALLY on the per-doc shingle ARRAY (array_min over a transform per
family member) — zero shuffle for the signature stage. Hash count is
identical (2 md5 per distinct shingle); output must be bit-identical.

  A = shipped near_dups_minhash (signature groupBy, pinned frames)
  B = array-native signatures feeding the same buckets/candidates/verify
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from dygiepp_spark.functions.hashing import hash60, hash_family_from  # noqa: E402
from dygiepp_spark.operators import dedup as DD  # noqa: E402
from dygiepp_spark.session import get_spark  # noqa: E402

CYCLES = int(os.environ.get("AB_CYCLES", "4"))
THRESH = 0.25


def array_signatures(chunks):
    """(id, mh_0..mh_k-1) computed row-locally from the distinct-shingle
    array — no explode, no shuffle."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    base = chunks.filter(F.size(toks) >= 2).select(
        F.col("chunk_id").cast("bigint").alias("id"),
        F.transform(grams, lambda s: hash60(s)).alias("_h0"),
        F.transform(grams, lambda s: hash60(F.concat(F.lit("b:"), s))).alias("_h1"),
    )
    def fam_min(arr, i):
        # single-arg lambda: a 2-arg lambda would receive the array INDEX
        # as its second argument and clobber the family id
        return F.array_min(F.transform(arr, lambda h: hash_family_from(h, i)))

    return base.select(
        "id",
        *[
            fam_min(F.col(f"_h{i % 2}"), i).alias(f"mh_{i}")
            for i in range(DD.N_HASHES)
        ],
    )


def variant_b(chunks):
    sh = DD.shingles(chunks).localCheckpoint(eager=False)
    sigs = array_signatures(chunks).localCheckpoint(eager=False)
    counts = (
        sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    cands = DD.lsh_candidates(DD.lsh_buckets(sigs))
    return DD.jaccard_verify(cands, sh, THRESH, counts=counts)


def checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id_a") * 31 + F.col("id_b")).alias("s"),
        F.sum(F.round(F.col("jaccard") * 1e6).cast("bigint")).alias("j"),
    ).collect()[0]
    return (r["n"], r["s"], r["j"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r4b", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = DD.doc_chunks(docs).localCheckpoint()
    chunks.count()

    variants = {
        "A_shipped": lambda: DD.near_dups_minhash(chunks, THRESH),
        "B_array_native_sigs": lambda: variant_b(chunks),
    }
    sums = {name: checksum(fn()) for name, fn in variants.items()}
    ref = sums["A_shipped"]
    for name, s in sums.items():
        assert s == ref, f"{name} diverges: {s} != {ref}"
    print(f"output identical: rows={ref[0]}", flush=True)

    walls = {k: [] for k in variants}
    for _ in range(CYCLES):
        for name, fn in variants.items():
            t0 = time.time()
            fn().count()
            walls[name].append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                n: {"walls": w, "best": min(w), "median": sorted(w)[len(w) // 2]}
                for n, w in walls.items()
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
