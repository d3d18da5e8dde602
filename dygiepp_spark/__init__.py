"""dygiepp_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of tomhoper/dygiepp.

The reference (/root/reference) is a span-based joint IE pipeline
(NER / relations / coreference / events) plus a COVID-KG triple-emission and
triple-evaluation layer. This package re-expresses every stage as idiomatic
Spark DataFrame operators plus vectorized pandas/Arrow UDF kernels:

    turns (conv_id, turn_idx, role, text, tool, ts)
      -> doc assembly (window-ordered groupBy, skew-salted)
      -> tokenize / span enumeration
      -> scoring + top-k beam pruning + decode (mentions, triples, events)
      -> entity linking (broadcast join)
      -> coref / canonicalization (connected components)
      -> KG node/edge materialization with per-partition lineage

No per-row Python UDFs anywhere; kernels are Arrow-batched pandas UDFs, and
everything relational stays in Catalyst/whole-stage-codegen land.
"""

__version__ = "0.1.0"

from dygiepp_spark.session import get_spark  # noqa: F401
