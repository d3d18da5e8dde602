"""Property-based cross-check: emit_triples vs an independent pure-Python
model of the decode semantics (third implementation besides the Spark
DataFrame plan and the DuckDB oracle), over hypothesis-generated corpora.

The Python model mirrors predict.py's dict semantics directly; disagreement
on ANY generated corpus is a real bug in one of the three.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dygiepp_spark import tables as TT
from dygiepp_spark.operators import extraction as EX

VOCAB = TT.VOCAB
ENTS = set(TT.ENTITY_VOCAB)
LABELS = TT.RELATION_LABELS
MAX_DIST = TT.RELATION_MAX_DIST


def python_model_triples(convs: dict[str, list[list[str]]]) -> dict:
    """Reference semantics in plain Python (predict.py:22-42 +
    template.libsonnet:99 beam)."""
    out: dict = {}
    for conv_id, turns in convs.items():
        for tokens in turns:
            toks = [t for t in tokens if t != ""]
            n = len(toks)
            if n == 0:
                continue
            text = " ".join(toks)
            ments = [(i, t) for i, t in enumerate(toks) if t in ENTS]
            k = max(1, math.ceil(0.5 * n))
            beamed = ments[:k]
            for ai, (pa, ta) in enumerate(beamed):
                for pb, tb in beamed[ai + 1 :]:
                    d = pb - pa
                    if 0 < d <= MAX_DIST:
                        lab = LABELS[(len(ta) + 2 * len(tb)) % len(LABELS)]
                        # dict overwrite: last (s1, s2) pair wins
                        out[(conv_id, text, ta, tb, lab)] = 1.0 / (1.0 + d)
    return out


tokens_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=25
)
corpus_strategy = st.dictionaries(
    keys=st.sampled_from([f"c{i}" for i in range(6)]),
    values=st.lists(tokens_strategy, min_size=1, max_size=5),
    min_size=1,
    max_size=4,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_emit_triples_matches_python_model(sess, corpus):
    rows = [
        (cid, ix, "user", " ".join(toks), None)
        for cid, turns in corpus.items()
        for ix, toks in enumerate(turns)
    ]
    turns = sess.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["conv_id"], r["sent_text"], r["arg0"], r["arg1"], r["label"]): r["conf"]
        for r in EX.emit_triples(turns).collect()
    }
    want = python_model_triples(corpus)
    assert got == want


# --------------------------------------------------------------------------
# round-2 property tests (pure-python kernels)
# --------------------------------------------------------------------------

@given(
    a=st.lists(st.sampled_from("abcde"), max_size=7),
    b=st.lists(st.sampled_from("abcde"), max_size=7),
)
@settings(max_examples=200, deadline=None)
def test_rouge_lcs_property(a, b):
    """_rouge_l_f_py's DP LCS equals the brute-force subsequence maximum,
    and the F formula is symmetric in its inputs only through P/R."""
    import itertools

    from dygiepp_spark.operators.kg_eval import _rouge_l_f_py

    def brute_lcs(x, y):
        best = 0
        for r in range(len(x), 0, -1):
            for sub in itertools.combinations(x, r):
                it = iter(y)
                if all(tok in it for tok in sub):
                    return r
        return best

    sa, sb = " ".join(a), " ".join(b)
    got = _rouge_l_f_py(sa, sb)
    if not a or not b:
        assert got == 0.0
        return
    llcs = brute_lcs(a, b)
    p, r = llcs / len(a), llcs / len(b)
    beta = p / (r + 1e-12)
    expect = ((1 + beta**2) * r * p) / ((r + beta**2 * p) + 1e-8)
    assert got == expect


@given(
    w=st.lists(
        st.lists(st.fractions(min_value=0, max_value=3), min_size=1, max_size=4),
        min_size=1,
        max_size=4,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1)
)
@settings(max_examples=150, deadline=None)
def test_hungarian_optimality_property(w):
    """Exact Kuhn-Munkres total equals the brute-force permutation max."""
    import itertools
    from fractions import Fraction

    from dygiepp_spark.kernels.assignment import max_weight_assignment

    got = max_weight_assignment(w)
    got_total = sum((w[i][j] for i, j in got), Fraction(0))
    n_r, n_c = len(w), len(w[0])
    best = Fraction(0)
    for r_sel in range(min(n_r, n_c), -1, -1):
        for rows in itertools.combinations(range(n_r), r_sel):
            for perm in itertools.permutations(range(n_c), r_sel):
                t = sum((w[i][j] for i, j in zip(rows, perm)), Fraction(0))
                best = max(best, t)
    assert got_total == best
    # validity: one-to-one
    assert len({i for i, _ in got}) == len(got)
    assert len({j for _, j in got}) == len(got)
