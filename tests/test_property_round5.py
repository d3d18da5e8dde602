"""Property-based cross-checks for the round-5 operators: each Spark
operator vs an independent brute-force pure-Python model over
hypothesis-generated inputs (third implementation besides the DataFrame
plan and the DuckDB oracle — disagreement on ANY case is a real bug)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from dygiepp_spark.operators.graph import kcore_fixpoint
from dygiepp_spark.operators.kg_eval import partial_span_score, refind_tokens

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------- partial span score model


def _refind_py(span: str) -> list[str]:
    """The reference's refind_span (eval_metrics.py:30-38), verbatim
    semantics: lowercase, strip 'a ' then 'the ', replace the three
    digraphs, split on single space."""
    s = span.lower()
    if s.startswith("a "):
        s = s[2:]
    if s.startswith("the "):
        s = s[4:]
    s = s.replace(") ", " ").replace("- ", " ").replace("( ", " ")
    return s.split(" ")


def _partial_py(a: str, b: str) -> float:
    ta, tb = _refind_py(a), _refind_py(b)
    common = [x for x in ta if x in tb]
    return len(common) / max(len(ta), len(tb))


words = st.sampled_from(
    ["a", "the", "spark", "engine", "fast", "(", ")", "-", "The", "A", "x1"]
)
spans = st.lists(words, min_size=1, max_size=6).map(" ".join)


@given(pairs=st.lists(st.tuples(spans, spans), min_size=1, max_size=16))
@settings(**SETTINGS)
def test_partial_span_score_matches_reference_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(
        "a", "b", partial_span_score(F.col("a"), F.col("b")).alias("s")
    ).collect()
    for r in got:
        assert abs(r["s"] - _partial_py(r["a"], r["b"])) < 1e-12, (
            r["a"], r["b"], r["s"],
        )


@given(vals=st.lists(spans, min_size=1, max_size=16))
@settings(**SETTINGS)
def test_refind_tokens_matches_reference_model(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "a string")
    got = df.select("a", refind_tokens(F.col("a")).alias("t")).collect()
    for r in got:
        assert list(r["t"]) == _refind_py(r["a"]), r["a"]


# ----------------------------------------------------- k-core fixpoint model


def _kcore_py(edges: set[tuple[str, str]], k: int) -> dict[str, int]:
    """Sequential peel to fixpoint; returns node -> in-core degree."""
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


nodes = st.sampled_from([f"n{i}" for i in range(9)])


@given(
    raw=st.lists(st.tuples(nodes, nodes), min_size=1, max_size=24),
    k=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_kcore_fixpoint_matches_sequential_peel(spark, raw, k):
    edges = spark.createDataFrame(
        [(u, "p", v) for u, v in raw],
        "subj_id string, pred string, obj_id string",
    )
    got = {
        r["node_id"]: r["deg"]
        for r in kcore_fixpoint(edges, k=k, max_rounds=50).collect()
    }
    want = _kcore_py({(u, v) for u, v in raw}, k)
    assert got == want
