#!/usr/bin/env python3
"""Interleaved A/B: join-based vs sum-based CC convergence check.

near_dup_groups tests its fixpoint by joining old vs new label frames and
counting changed rows — a join + filter + count action per round. Labels
are MONOTONICALLY non-increasing (every update is min(label, ...)), so
the fixpoint holds iff sum(label) is unchanged: two one-scan aggregates
replace the join. Output labels are identical by construction; this
measures the loop-overhead delta on the full dedup_groups pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from dygiepp_spark.operators import compaction as CP  # noqa: E402
from dygiepp_spark.operators import dedup as DD  # noqa: E402
from dygiepp_spark.session import get_spark  # noqa: E402

CYCLES = int(os.environ.get("AB_CYCLES", "4"))


def near_dup_groups_sumcheck(pairs, nodes, max_iter=20):
    edges = pairs.select(
        F.col("id_a").cast("bigint").alias("src"),
        F.col("id_b").cast("bigint").alias("dst"),
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("id").cast("bigint").alias("label"),
    )
    prev_sum = None
    for _ in range(max_iter):
        nb = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("_nb"))
        )
        stepped = labels.join(nb, labels["id"] == nb["dst"], "left").select(
            "id", F.least("label", F.coalesce("_nb", "label")).alias("label")
        )
        parent = stepped.select(
            F.col("id").alias("_pid"), F.col("label").alias("_plabel")
        )
        doubled = (
            stepped.join(parent, stepped["label"] == parent["_pid"], "left")
            .select(
                "id",
                F.least("label", F.coalesce("_plabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = doubled.agg(F.sum("label")).collect()[0][0]
        labels = doubled
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError("no fixpoint")
    return labels.select("id", F.col("label").alias("group_id"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r4c", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = DD.doc_chunks(docs).localCheckpoint()
    chunks.count()

    def pipeline(group_fn):
        pairs = DD.near_dups_minhash(chunks).select("id_a", "id_b")
        nodes = chunks.select(F.col("chunk_id").alias("id"))
        return CP.compact_corpus(group_fn(pairs, nodes))

    variants = {
        "A_join_check": lambda: pipeline(CP.near_dup_groups),
        "B_sum_check": lambda: pipeline(near_dup_groups_sumcheck),
    }

    def checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id") * 7 + F.col("group_id")).alias("s"),
            F.sum(F.col("group_size")).alias("g"),
        ).collect()[0]
        return (r["n"], r["s"], r["g"])

    sums = {name: checksum(fn()) for name, fn in variants.items()}
    ref = sums["A_join_check"]
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
