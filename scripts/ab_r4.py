#!/usr/bin/env python3
"""Interleaved structural A/B for ``near_dups_minhash`` (VERDICT r3 #6).

The round-3 md5-halving A/B cleared signature hashing as the cost driver;
the wall lives in stage/shuffle structure across candidates+verify. Three
variants, interleaved within one session so host-throttle bursts hit all
of them equally:

  A = current tree (``dedup.near_dups_minhash``): lazy-checkpointed
      shingles; counts/prefilter/verify each join back to the shingle
      aggregate (Spark's ReusedExchange dedups identical subplans, but
      the candidate self-join + 4 count joins remain separate stages)
  B = A with the minhash-signature frame and the per-id shingle-count
      frame EAGERLY pinned (localCheckpoint) — isolates recompute cost
  C = fused candidate+verify: n_sh attached to the signature frame
      before band explode, so (1) the PPJoin length filter runs INSIDE
      the bucket self-join (hopeless pairs never reach a later stage)
      and (2) the verify stage reads (id_a, id_b, n_a, n_b) off the
      candidate rows instead of re-joining the count frame 4 times

All variants are output-identical (same pair set, same jaccard values);
each run asserts count + checksum equality against A.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from dygiepp_spark import tables as TT  # noqa: E402
from dygiepp_spark.operators import dedup as DD  # noqa: E402
from dygiepp_spark.session import get_spark  # noqa: E402

CYCLES = int(os.environ.get("AB_CYCLES", "4"))
THRESH = 0.25


def variant_b(chunks):
    sh = DD.shingles(chunks).localCheckpoint(eager=False)
    sigs = DD.minhash_signatures(sh).localCheckpoint(eager=True)
    counts = (
        sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .localCheckpoint(eager=True)
    )
    cands = DD.lsh_candidates(DD.lsh_buckets(sigs))
    pre_a = counts.select(F.col("id").alias("id_a"), F.col("n_sh").alias("_na"))
    pre_b = counts.select(F.col("id").alias("id_b"), F.col("n_sh").alias("_nb"))
    cands = (
        cands.join(pre_a, "id_a")
        .join(pre_b, "id_b")
        .filter(
            F.least("_na", "_nb").cast("double")
            >= F.lit(THRESH) * F.greatest("_na", "_nb").cast("double")
        )
        .select("id_a", "id_b")
    )
    a_sh = cands.join(sh.withColumnRenamed("id", "id_a"), "id_a")
    inter = (
        a_sh.join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
    cb = counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")
    out = (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= THRESH)


def _buckets_with_n(sigs, n_bands=DD.N_BANDS, rows_per_band=DD.ROWS_PER_BAND):
    """lsh_buckets with n_sh carried through the band explode (no re-join)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":",
                    F.lit(b),
                    *[
                        F.col(f"mh_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("id", "n_sh", F.explode(entries).alias("e")).select(
        "id", "n_sh", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
    )


def variant_c(chunks, max_bucket=1000):
    sh = DD.shingles(chunks).localCheckpoint(eager=False)
    counts = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sigs = DD.minhash_signatures(sh).join(counts, "id")
    buckets = _buckets_with_n(sigs)
    bcounts = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    ok = buckets.join(
        F.broadcast(bcounts.filter(F.col("_n") > max_bucket)),
        ["band", "bucket"],
        "left_anti",
    )
    a = ok.alias("a")
    b = ok.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
                F.least(F.col("a.n_sh"), F.col("b.n_sh")).cast("double")
                >= F.lit(THRESH)
                * F.greatest(F.col("a.n_sh"), F.col("b.n_sh")).cast("double"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    a_sh = cands.join(sh.withColumnRenamed("id", "id_a"), "id_a")
    inter = (
        a_sh.join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= THRESH)


def checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id_a") * 31 + F.col("id_b")).alias("s"),
        F.sum(F.round(F.col("jaccard") * 1e6).cast("bigint")).alias("j"),
    ).collect()[0]
    return (r["n"], r["s"], r["j"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = DD.doc_chunks(docs).localCheckpoint()
    chunks.count()

    variants = {
        "A_current": lambda: DD.near_dups_minhash(chunks, THRESH),
        "B_persist_sigs_counts": lambda: variant_b(chunks),
        "C_fused_prefilter": lambda: variant_c(chunks),
    }
    # output identity gate (also serves as warm-up)
    sums = {name: checksum(fn()) for name, fn in variants.items()}
    ref = sums["A_current"]
    for name, s in sums.items():
        assert s == ref, f"{name} diverges: {s} != {ref}"
    print(f"output identical across variants: rows={ref[0]}", flush=True)

    walls = {k: [] for k in variants}
    for _ in range(CYCLES):
        for name, fn in variants.items():
            t0 = time.time()
            fn().count()
            walls[name].append(round(time.time() - t0, 3))
    out = {
        name: {"walls": w, "best": min(w), "median": sorted(w)[len(w) // 2]}
        for name, w in walls.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
