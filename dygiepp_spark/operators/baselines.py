"""K9 baseline relation generators (eval_utils.py:388-463).

The reference ships two uninformed baselines used to contextualize the
model's P/R numbers:

* ``allpairs_base`` — per sentence, take the candidate spans (spaCy noun
  chunks / NER entities) and emit EVERY ordered pair as a relation.
* ``depparse_base`` — a dependency-parse heuristic: pair an ``nsubj``
  span with its verb's ``dobj``/``pobj`` span.

No parser exists in this environment, so the span inventory substitutes
honestly (documented boundary, same as the K1 ``head`` metric):

* candidate spans = the planted-entity mentions (our NER stand-in);
* the "verb" pivot of the dep-parse heuristic = the planted trigger
  tokens — subject is a mention LEFT of the trigger, object a mention
  RIGHT of it, mirroring nsubj -> head-verb -> dobj/pobj.

Both are pure relational plans: mention/trigger detection is a narrow
token explode, pair generation an equi-join on (conv_id, turn_idx) with
inequality predicates evaluated at the probe — no beam, no cap (baselines
are deliberately exhaustive), so costs are quadratic per sentence by
SPEC, bounded by the corpus's short turns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dygiepp_spark.operators.extraction import detect_mentions, detect_triggers


def allpairs_baseline(turns: DataFrame) -> DataFrame:
    """K9 ``allpairs_base`` (eval_utils.py:388-412): every ordered pair of
    candidate spans in a sentence, BOTH directions (the reference unions
    ``combinations(spans, 2)`` with ``combinations(spans[::-1], 2)``),
    deduped per (conv, arg0, arg1). Output: (conv_id, arg0, arg1)."""
    m = detect_mentions(turns)
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
            F.col("a.start") != F.col("b.start"),
        ],
    ).select(
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.surface").alias("arg0"),
        F.col("b.surface").alias("arg1"),
    )
    return pairs.distinct()


def depparse_baseline(turns: DataFrame) -> DataFrame:
    """K9 ``depparse_base`` (eval_utils.py:414-463) with the trigger-pivot
    stand-in: (subject mention, object mention) pairs bridged by a trigger
    token between them — subject left of the pivot, object right, like
    nsubj -> verb -> dobj/pobj. Deduped per (conv, arg0, arg1).
    Output: (conv_id, arg0, arg1)."""
    m = detect_mentions(turns)
    t = detect_triggers(turns)
    s = m.alias("s")
    o = m.alias("o")
    tr = t.alias("t")
    pairs = (
        s.join(
            tr,
            on=[
                F.col("s.conv_id") == F.col("t.conv_id"),
                F.col("s.turn_idx") == F.col("t.turn_idx"),
                F.col("s.start") < F.col("t.trigger_ix"),
            ],
        )
        .join(
            o,
            on=[
                F.col("t.conv_id") == F.col("o.conv_id"),
                F.col("t.turn_idx") == F.col("o.turn_idx"),
                F.col("o.start") > F.col("t.trigger_ix"),
            ],
        )
        .select(
            F.col("s.conv_id").alias("conv_id"),
            F.col("s.surface").alias("arg0"),
            F.col("o.surface").alias("arg1"),
        )
    )
    return pairs.distinct()
