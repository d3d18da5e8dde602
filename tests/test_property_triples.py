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
