#!/usr/bin/env python3
"""Interleaved A/B/C on dedup_groups (VERDICT r4 #8) — the largest bench
line (16.3 s at sf0.1).

A: shipped near_dup_groups — per round: neighbor-min hop (join + groupBy
   + left join), pointer-doubling hop (self-join), join-based changed
   count. ~5 jobs/round.
B: sum-check only (ab_r4c's variant, re-tested on an idle host as the
   judge asked) — same two hops, convergence = one sum aggregate
   (labels are monotone non-increasing, so fixpoint iff sum unchanged).
C: FUSED hops + sum check — the pointer edges (label(x) -> x) are
   unioned into the symmetric edge frame, so ONE join + one groupBy-min
   + one left join per round replaces both hops. Both accelerations
   still apply from the same starting labels (slightly weaker per round
   than sequential hop-then-double, so the loop may take one extra
   round), but each round is ~half the stages. Labels stay monotone
   min() updates over same-component edges only, so the fixpoint is the
   same min-reachable-id labeling — checked by checksum below.

Ship rule (BENCH/BASELINE.md protocol): >= 15% median improvement,
interleaved same-session, output pinned.
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


def _prep(pairs, nodes):
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
    return sym, labels


def groups_sumcheck(pairs, nodes, max_iter=20):
    """Variant B: shipped hops, sum-based convergence."""
    sym, labels = _prep(pairs, nodes)
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


def groups_fused(pairs, nodes, max_iter=24):
    """Variant C: pointer edges unioned into the neighbor frame — one
    join + min-agg + left join per round, sum-based convergence."""
    sym, labels = _prep(pairs, nodes)
    prev_sum = None
    for _ in range(max_iter):
        ptr = labels.select(
            F.col("label").alias("src"), F.col("id").alias("dst")
        )
        nb = (
            sym.unionByName(ptr)
            .join(labels, F.col("src") == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("_nb"))
        )
        new_labels = (
            labels.join(nb, labels["id"] == nb["dst"], "left")
            .select(
                "id",
                F.least("label", F.coalesce("_nb", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError("no fixpoint")
    return labels.select("id", F.col("label").alias("group_id"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r5", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = DD.doc_chunks(docs).localCheckpoint()
    chunks.count()

    def pipeline(group_fn):
        pairs = DD.near_dups_minhash(chunks).select("id_a", "id_b")
        nodes = chunks.select(F.col("chunk_id").alias("id"))
        return CP.compact_corpus(group_fn(pairs, nodes))

    variants = {
        "A_shipped": lambda: pipeline(CP.near_dup_groups),
        "B_sum_check": lambda: pipeline(groups_sumcheck),
        "C_fused": lambda: pipeline(groups_fused),
    }

    def checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id") * 7 + F.col("group_id")).alias("s"),
            F.sum(F.col("group_size")).alias("g"),
        ).collect()[0]
        return (r["n"], r["s"], r["g"])

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
            print(f"{name}: {walls[name][-1]}", flush=True)
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
