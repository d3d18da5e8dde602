"""Stage 1 — document assembly: turns -> documents / offset-annotated turns.

Reference semantics being re-expressed:

* A1 doc->sentence explode / A2 sentence->doc assemble
  (``fields_to_batches``/``batches_to_fields``,
  /root/reference/dygie/models/shared.py:28-63; ``Document.to_json``
  document.py:167-181).
* A3 sentence-offset computation — shifted cumulative sum of sentence
  lengths (document.py:113-117; tensorized ``cumsum_shifted``
  shared.py:8-16).
* B1 document-contiguous ordering — the reference's batch iterator asserts
  sentences of a doc arrive contiguous and in order
  (dygie/data/iterators/batch_iterator.py:45-55). Our invariant: per-turn
  text equality under stable turn ordering (the pytest gate).
* A4 document splitting — ``Document.split`` (document.py:184-236) greedily
  chunks long docs at ``max_tokens_per_doc`` so no single group blows up a
  kernel; our analog bounds the per-group row count fed to applyInPandas.

Scale notes (100 TB):

* ``with_sentence_offsets`` is ONE window over (conv_id, turn_idx) — a
  single hash-partition shuffle on conv_id. Skewed conversations only hurt
  if one conv exceeds an executor's partition budget; the chunking in
  :func:`assign_chunks` bounds that before any per-doc kernel runs.
* ``assemble_documents`` (full doc rows) is only used for doc-level passes
  (coref); the main extraction path stays on per-turn rows and never
  materializes whole documents through a shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_token_counts(turns: DataFrame) -> DataFrame:
    """Add ``n_tokens`` (whitespace tokens, empties excluded) — narrow op."""
    return turns.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
    )


def with_sentence_offsets(turns: DataFrame) -> DataFrame:
    """A3: doc-level token offset of each turn (shifted cumsum).

    ``sentence_start`` = sum of token counts of all previous turns of the
    same conversation — exactly the reference's
    ``np.cumsum(sentence_lengths); rolled[1:] = cumsum[:-1]; rolled[0] = 0``
    (document.py:113-117).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return with_token_counts(turns).withColumn(
        "sentence_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("int")
    )


def assemble_documents(turns: DataFrame) -> DataFrame:
    """A2: one row per conversation with ordered turn structs.

    ``sort_array(collect_list(struct(turn_idx, ...)))`` gives the stable
    turn ordering without a window (struct sort is by leading field);
    map-side partial aggregation keeps the shuffle to one pass.
    """
    assembled = turns.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
        ).alias("turns"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )
    return assembled.withColumn(
        "doc_text", F.array_join(F.transform(F.col("turns"), lambda t: t["text"]), " ")
    )


def assemble_documents_salted(turns: DataFrame, n_salts: int = 8) -> DataFrame:
    """A2 with SALTED two-phase aggregation — the skew defusal the north
    rule prescribes for long-conversation tails.

    A plain ``groupBy(conv_id).collect_list`` sends every turn of a hot
    conversation (the Zipf head: one conv can be 10^6 turns) through ONE
    reducer task. Salting splits phase 1 on ``(conv_id, turn_idx % n)``,
    so the collect+sort work of a hot conversation spreads over ``n``
    reducers; phase 2 merges the n pre-sorted partial arrays per conv —
    its shuffle carries one combined row per (conv, salt), i.e. n rows
    per conversation regardless of length, and ``array_sort`` over the
    flattened structs is the merge. Output is IDENTICAL to
    :func:`assemble_documents` (same schema, same ordering) — asserted by
    tests on the skewed synthetic corpus.

    The final per-doc row still lands on one task (it IS one row); what
    salting bounds is the shuffle fan-in and sort cost per task. At
    10^12 turns, pick n_salts ~ ceil(p99 conv length / target rows per
    task).
    """
    part = turns.groupBy(
        "conv_id", F.pmod(F.col("turn_idx"), F.lit(n_salts)).alias("_salt")
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
        ).alias("t"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = part.groupBy("conv_id").agg(
        F.array_sort(F.flatten(F.collect_list("t"))).alias("turns"),
        F.sum("n").cast("int").alias("n_turns"),
    )
    return merged.withColumn(
        "doc_text", F.array_join(F.transform(F.col("turns"), lambda t: t["text"]), " ")
    )


def explode_documents(docs: DataFrame) -> DataFrame:
    """A1: inverse of assemble_documents — back to per-turn rows."""
    return docs.select(
        "conv_id", F.inline(F.col("turns"))
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def assign_chunks(turns: DataFrame, max_tokens_per_chunk: int = 500) -> DataFrame:
    """A4: bound per-group size for downstream per-doc kernels.

    The reference refuses to run a document longer than
    ``max_tokens_per_doc`` through the model and greedily splits it
    (document.py:184-236, normalize.py:33-68: 500-token chunks, doc_key
    suffixed ``_SPLIT_i``). We assign ``chunk_id = floor(cumulative_tokens /
    max)`` over the turn order — a fixed-width approximation of the greedy
    rule that needs only the A3 window (no per-doc Python). Kernels then
    group by (conv_id, chunk_id): a million-turn conversation becomes many
    bounded groups instead of one straggler task.

    Coref pointers only ever go backward (coref.py:451-506), so chunk-local
    coref followed by the global connected-components pass remains correct
    for clusters that stay within a chunk, and the CC pass stitches
    cross-chunk edges produced by the linking stage.
    """
    off = with_sentence_offsets(turns)
    return off.withColumn(
        "chunk_id",
        (F.col("sentence_start") / F.lit(max_tokens_per_chunk)).cast("int"),
    ).withColumn(
        "chunk_key",
        F.concat_ws("#", F.col("conv_id"), F.col("chunk_id")),
    )


def split_documents(
    turns: DataFrame,
    max_tokens_per_doc: int = 500,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """A4 EXACT ``Document.split`` semantics (document.py:184-236,
    normalize.py:39-68) — the opt-in precise variant of
    :func:`assign_chunks` (which keeps the cheap fixed-width window form).

    Reference contract, reproduced exactly:

    * a document whose total token count is <= ``max_tokens_per_doc`` is
      passed through UNCHANGED — original doc_key, no ``_SPLIT`` suffix
      (document.py:195-197);
    * otherwise sentences are grouped GREEDILY in order: a sentence joins
      the current group iff ``group_length + len(sentence) <= max``, else
      it starts a new group (:203-226);
    * split docs get ``doc_key = <orig>_SPLIT_<i>`` (:229) and each
      sentence's ``sentence_start`` / ``sentence_ix`` are rebased by the
      ORIGINAL offsets of its group's first sentence (:217-224 — the
      offsets are captured before the group-starter is itself rebased);
    * a single sentence longer than ``max`` raises (:206-208);
    * coreference annotations present -> refuse with NotImplementedError
      (:191-193).

    The greedy restart-cumsum is inherently sequential per document, so it
    runs as an Arrow ``applyInPandas`` kernel keyed on conv_id over the
    narrow (lengths + offsets + text) projection — rows are tiny, and the
    per-group state is three integers, so even a million-turn conversation
    is one cheap task (this operator's OUTPUT is what bounds every other
    per-doc kernel's group size).
    """
    if clusters is not None:
        raise NotImplementedError(
            "Splitting documents with coreference annotations not implemented."
        )  # document.py:191-193

    off = with_sentence_offsets(turns).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        "n_tokens", "sentence_start",
    )
    out_schema = (
        "doc_key string, conv_id string, orig_turn_idx int, turn_idx int, "
        "sentence_start int, n_tokens int, role string, text string, tool string"
    )

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
        n_tok = pdf["n_tokens"].to_numpy()
        starts = pdf["sentence_start"].to_numpy()
        ixs = pdf["turn_idx"].to_numpy()
        conv = pdf["conv_id"].iloc[0]
        too_long = n_tok > max_tokens_per_doc
        if too_long.any():
            bad = pdf["text"].iloc[int(too_long.argmax())]
            raise ValueError(
                f'Sentence "{bad}" has more than {max_tokens_per_doc} '
                "tokens. Please split this sentence."
            )  # document.py:206-208
        if int(n_tok.sum()) <= max_tokens_per_doc:
            keys = [conv] * len(pdf)
            new_ix, new_start = ixs, starts
        else:
            keys, new_ix, new_start = [], [], []
            g, group_len, tok_off, ix_off = 0, 0, 0, 0
            for i in range(len(pdf)):
                length = int(n_tok[i])
                if group_len + length <= max_tokens_per_doc:
                    group_len += length
                else:
                    g += 1
                    tok_off, ix_off = int(starts[i]), int(ixs[i])
                    group_len = length
                keys.append(f"{conv}_SPLIT_{g}")
                new_ix.append(int(ixs[i]) - ix_off)
                new_start.append(int(starts[i]) - tok_off)
        return pd.DataFrame(
            {
                "doc_key": keys,
                "conv_id": pdf["conv_id"],
                "orig_turn_idx": ixs,
                "turn_idx": new_ix,
                "sentence_start": new_start,
                "n_tokens": n_tok,
                "role": pdf["role"],
                "text": pdf["text"],
                "tool": pdf["tool"],
            }
        )

    return off.groupBy("conv_id").applyInPandas(fn, out_schema)


def check_dense_turns(turns: DataFrame) -> DataFrame:
    """P6/B1 dense-index validation only (oracle-checkable subset of
    :func:`check_turn_invariant`): conv_ids whose turn_idx sequence is not
    exactly 0..n-1. Returns the violation frame (empty == healthy)."""
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.count_distinct("turn_idx").alias("nd"),
        )
        .filter(
            (F.col("mn") != 0)
            | (F.col("mx") != F.col("n") - 1)
            | (F.col("nd") != F.col("n"))
        )
        .select("conv_id", F.lit("non_dense_turn_idx").alias("violation"))
    )


def split_disjointness(turns: DataFrame, modulus: int = 10, train_cut: int = 8) -> DataFrame:
    """P8 (check_dataset.py:38-45): train/test split disjointness via
    anti-joins. Split rule: hash-free deterministic bucket on the numeric
    part of conv_id. One row out: (n_train, n_test, n_overlap)."""
    convs = turns.select("conv_id").distinct().withColumn(
        "_b", F.pmod(F.col("conv_id").cast("bigint"), F.lit(modulus))
    )
    train = convs.filter(F.col("_b") < train_cut).select("conv_id")
    test = convs.filter(F.col("_b") >= train_cut).select("conv_id")
    overlap = train.join(test, "conv_id")
    spark = turns.sparkSession
    return spark.createDataFrame(
        [(train.count(), test.count(), overlap.count())],
        "n_train bigint, n_test bigint, n_overlap bigint",
    )


def check_turn_invariant(turns: DataFrame) -> DataFrame:
    """P6/B1 validation: turn_idx dense per conv, text round-trips assembly.

    Returns a DataFrame of violations (empty == healthy). Mirrors the
    reference's consistency checks (scripts/data/check_consistency.py:24-43
    and the batch-iterator order assert, batch_iterator.py:52).
    """
    dense = (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.count_distinct("turn_idx").alias("nd"),
        )
        .filter(
            (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1) | (F.col("nd") != F.col("n"))
        )
        .select("conv_id", F.lit("non_dense_turn_idx").alias("violation"))
    )
    round_trip = (
        explode_documents(assemble_documents(turns))
        .select("conv_id", "turn_idx", F.col("text").alias("rt_text"))
        .join(turns.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
        .filter(F.col("rt_text") != F.col("text"))
        .select("conv_id", F.lit("text_mismatch_after_roundtrip").alias("violation"))
    )
    return dense.unionByName(round_trip)
