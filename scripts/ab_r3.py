#!/usr/bin/env python3
"""Interleaved A/B re-bench for the round-2 regressions (VERDICT r2 #8).

``triples`` regressed 2.17 -> 3.42 s and ``kg_edges_agg`` 4.62 -> 8.54 s
round-over-round. The only code delta on the triples path was the
tokenizer-parity change in emit_triples (one extra array transform + a
per-token normalization ``when``); the kg_edges_agg path did not change at
all, so its regression is presumed host noise. This script separates plan
cost from host noise by interleaving the variants within one session:

  A = current emit_triples (struct-carrying filter + normalization)
  B = the round-1 formulation (plain token filter, no normalization —
      diverges on inputs with repeated spaces or '/.' tokens, bench-only)
  C = kg_edges_agg, unchanged code, re-measured for the noise question

Each cycle times A, B, C back to back; report per-cycle walls + best.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from dygiepp_spark import tables as TT  # noqa: E402
from dygiepp_spark.operators import extraction as EX  # noqa: E402
from dygiepp_spark.operators import graph as GR  # noqa: E402
from dygiepp_spark.session import get_spark  # noqa: E402
from dygiepp_spark.tables import RELATION_LABELS, RELATION_MAX_DIST  # noqa: E402

CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def emit_triples_r1(turns, max_dist=RELATION_MAX_DIST):
    """Round-1 formulation (git cef2c75) — no '/.'-normalization, positions
    from the filtered array. Output-identical on the derived corpus."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n = F.size(toks)
    ments = F.filter(
        F.transform(toks, lambda t, i: F.struct(i.alias("pos"), t.alias("tok"))),
        lambda s: s["tok"].isin(*TT.ENTITY_VOCAB),
    )
    k = F.greatest(F.ceil(F.lit(0.5) * n), F.lit(1)).cast("int")
    beamed = F.slice(ments, 1, k)
    pairs_arr = F.flatten(
        F.transform(
            beamed,
            lambda a: F.transform(
                F.filter(
                    beamed,
                    lambda b: (b["pos"] > a["pos"])
                    & (b["pos"] - a["pos"] <= max_dist),
                ),
                lambda b: F.struct(
                    a["pos"].alias("s1"), b["pos"].alias("s2"),
                    a["tok"].alias("arg0"), b["tok"].alias("arg1"),
                ),
            ),
        )
    )
    label_arr = F.array(*[F.lit(x) for x in RELATION_LABELS])
    exploded = turns.select(
        "conv_id", F.col("text").alias("sent_text"), F.explode(pairs_arr).alias("p")
    ).select(
        "conv_id", "sent_text",
        F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"),
        F.col("p.arg0").alias("arg0"), F.col("p.arg1").alias("arg1"),
        F.element_at(
            label_arr,
            ((F.length(F.col("p.arg0")) + 2 * F.length(F.col("p.arg1")))
             % len(RELATION_LABELS)).cast("int") + 1,
        ).alias("label"),
        (F.lit(1.0) / (F.lit(1.0) + (F.col("p.s2") - F.col("p.s1")))).alias("conf"),
    )
    return (
        exploded.groupBy(
            "conv_id", F.xxhash64("sent_text").alias("_sh"),
            "arg0", "arg1", "label",
        )
        .agg(
            F.max("sent_text").alias("sent_text"),
            F.max_by(F.col("conf"), F.col("s1") * 1000 + F.col("s2")).alias("conf"),
        )
        .select("conv_id", "sent_text", "arg0", "arg1", "label", "conf")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-r3", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    turns = TT.turns_from_documents(spark, sf_dir, with_ts=False).localCheckpoint()
    turns.count()
    ed = TT.entity_dict(spark)

    variants = {
        "A_triples_cur": lambda: EX.emit_triples(turns).count(),
        "B_triples_r1": lambda: emit_triples_r1(turns).count(),
        "C_kg_edges_agg": lambda: GR.aggregate_edges(
            GR.build_edges(turns, ed)
        ).count(),
    }
    # warm-up every variant once (JIT/codegen)
    for fn in variants.values():
        fn()
    walls = {k: [] for k in variants}
    for _ in range(CYCLES):
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
    out = {
        name: {"walls": w, "best": min(w), "median": sorted(w)[len(w) // 2]}
        for name, w in walls.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
