"""KG triple-evaluation operators (the fork's eval layer, SURVEY.md §2.6).

Re-expressed from /root/reference/eval_utils.py as pure DataFrame ops:

* K1 span matching — ``exact`` (lower+trim equality) and ``substring``
  (either-contains) metrics (eval_utils.py:180-263). ``jaccard`` (token-set
  overlap >= theta) is exposed as a predicate builder too.
* K2 relation matching — arg0 AND arg1 match AND label match
  (eval_utils.py:283-335; ``collapse=False`` keeps label equality).
* K3 ie_eval — global sort by confidence desc, cut at topK (head, not
  rank-ties: ``predrels[:topK]``, eval_utils.py:783-785), per-doc
  cross-product match, dedup of matched pred keys (``good_preds``) and
  matched gold keys (``found_from_gold``); P = TP/topK,
  R = TP_recall/n_gold (eval_utils.py:853-863).
* K4 ie_span_eval — argument-level P/R/F1 ignoring pairing
  (eval_utils.py:620-682).
* K6 transitive closure of gold — add (a, c) when (a, b), (b, c) share a
  doc; confidence = product; dedup on (doc, a, c)
  (``find_transivity_relations``, eval_utils.py:466-496). The reference
  loops to fixpoint with order-dependent first-wins confidence; we run a
  BOUNDED number of expansion rounds with max-confidence dedup so the
  result is deterministic and engine-portable.
* G1 micro P/R/F1 — TP/FP/FN sums then safe-div F1
  (dygie/training/f1.py:6-17).

Scale notes: every join here is an equi-join on conv_id (plus arg
predicates evaluated post-probe); gold/pred sides are triple tables (tiny
relative to the corpus). The global top-k sort in K3 is the only global
exchange — a rank over one window, and only when topK is requested.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from dygiepp_spark.operators.extraction import (
    detect_mentions,
    positional_beam,
    relation_pairs,
)

# --------------------------------------------------------------------------
# K1 span-match predicates
# --------------------------------------------------------------------------

def match_exact(a: Column, b: Column) -> Column:
    """K1 'exact': case-insensitive strip equality (eval_utils.py:183-189)."""
    return F.lower(F.trim(a)) == F.lower(F.trim(b))


def match_substring(a: Column, b: Column) -> Column:
    """K1 'substring': either side contains the other (eval_utils.py:191-199)."""
    la, lb = F.lower(F.trim(a)), F.lower(F.trim(b))
    return la.contains(lb) | lb.contains(la)


def jaccard_ratio(a: Column, b: Column) -> Column:
    """Token-set jaccard ratio (lower+trim, split on single space,
    distinct) — one IEEE double division."""
    ta = F.array_distinct(F.split(F.lower(F.trim(a)), " "))
    tb = F.array_distinct(F.split(F.lower(F.trim(b)), " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return inter / F.greatest(union, F.lit(1.0))


def match_jaccard(a: Column, b: Column, thresh: float = 0.5) -> Column:
    """K1 'jaccard': token-set overlap ratio >= thresh (eval_utils.py:201-215).
    NOTE the reference's ``span_matching`` comparator is strictly greater
    (``if j>thresh``, eval_utils.py:218); the >= here is the documented
    K1 choice carried since round 1 across every grid/agreement cell —
    accept-path consumers that need the strict form compare
    :func:`jaccard_ratio` directly."""
    return jaccard_ratio(a, b) >= thresh


def match_head(a: Column, b: Column) -> Column:
    """K1 'head' (eval_utils.py:221-226): spaCy dependency-parse ROOT token
    equality. HONEST BOUNDARY: no dependency parser exists in this
    environment, so the head is approximated by the LAST whitespace token
    (the head-final heuristic for English noun phrases); swap in a real
    parser UDF in production. JVM-side expression, no Python in the path."""
    ha = F.element_at(F.split(F.lower(F.trim(a)), " "), -1)
    hb = F.element_at(F.split(F.lower(F.trim(b)), " "), -1)
    return ha == hb


def _rouge_l_f_py(a: str, b: str) -> float:
    """rouge-L sentence-level F for one (hyp, ref) pair — the exact
    formula of the ``rouge`` package the reference imports
    (pltrdy/rouge rouge_score.py ``_f_p_r_lcs``: beta = P/R weighted F
    with the package's 1e-12 / 1e-8 stabilizers), tokens = whitespace
    split of lower(trim(x)). Full O(n*m) LCS dynamic program — general,
    not a containment shortcut."""
    ta = [t for t in a.strip().lower().split(" ") if t != ""]
    tb = [t for t in b.strip().lower().split(" ") if t != ""]
    n, m = len(ta), len(tb)
    if n == 0 or m == 0:
        return 0.0
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if ta[i - 1] == tb[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    llcs = prev[m]
    p_lcs = llcs / n          # hyp = span1 = pred
    r_lcs = llcs / m          # ref = span2 = gold
    beta = p_lcs / (r_lcs + 1e-12)
    num = (1 + beta ** 2) * r_lcs * p_lcs
    denom = r_lcs + (beta ** 2) * p_lcs
    return num / (denom + 1e-8)


def rouge_l_f() -> Column:
    """Arrow-batched pandas UDF computing rouge-L F over two string
    columns. Python is unavoidable for the LCS DP (no Spark builtin); the
    batch transfer is Arrow, never row-at-a-time."""

    @F.pandas_udf("double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_rouge_l_f_py(x or "", y or "") for x, y in zip(a, b)],
            dtype="float64",
        )

    return _udf


ROUGE_THRESH = 0.3


def match_rouge(a: Column, b: Column, thresh: float = ROUGE_THRESH) -> Column:
    """K1 'rouge' (eval_utils.py:227-232): rouge-L f STRICTLY greater than
    ``thresh`` (the reference's ``scores[0]['rouge-l']['f'] > thresh``)."""
    return rouge_l_f()(a, b) > F.lit(thresh)


def refind_tokens(c: Column) -> Column:
    """K1 partial-family normalization — the reference's ``refind_span``
    (eval_metrics.py:30-38) as pure JVM string ops: lowercase, strip a
    leading ``'a '`` THEN a leading ``'the '`` (two sequential ifs, so
    ``'a the x'`` reduces to ``'x'`` exactly as the reference does),
    replace the three digraphs ``') '``/``'- '``/``'( '`` with a space,
    split on a single space (empty tokens preserved — the reference does
    no filtering, so a bare span still yields one token and the
    max-length denominator never hits zero)."""
    s = F.lower(c)
    s = F.when(s.startswith("a "), F.substr(s, F.lit(3))).otherwise(s)
    s = F.when(s.startswith("the "), F.substr(s, F.lit(5))).otherwise(s)
    for pat in (") ", "- ", "( "):
        s = F.replace(s, F.lit(pat), F.lit(" "))
    return F.split(s, " ")


#: the reference's token-overlap acceptance ratio (eval_metrics.py:61-63)
PARTIAL_THRESH = 0.3


def partial_span_score(a: Column, b: Column) -> Column:
    """``partial_span_score`` (eval_metrics.py:40-55): count of span-1
    tokens that occur anywhere in span 2 — WITH span-1 multiplicity, the
    reference's ``[x for x in span1_tokens if x in span2_tokens]`` — over
    the LONGER span's token count. Array intrinsics only (filter +
    array_contains), no UDF."""
    ta, tb = refind_tokens(a), refind_tokens(b)
    common = F.size(F.filter(ta, lambda x: F.array_contains(tb, x)))
    return common.cast("double") / F.greatest(
        F.size(ta), F.size(tb)
    ).cast("double")


def match_partial(
    a: Column, b: Column, thresh: float = PARTIAL_THRESH
) -> Column:
    """K1 'partial' (``partial_match_score``, eval_metrics.py:57-64):
    token-overlap ratio >= thresh on the refind-normalized spans.

    The score is ASYMMETRIC (the common count carries span-1's token
    multiplicity) and the reference scores ``(gold, pred)``
    (eval_metrics.py:61-63) while K2's calling convention passes
    ``(pred, gold)`` — so the arguments are swapped INTERNALLY here:
    ``a`` = pred, ``b`` = gold, score = partial_span_score(gold, pred).
    On 'x z w q' vs gold 'x x x y' the multiplicity side matters:
    3/4 (match) the reference way, 1/4 (miss) unswapped."""
    return partial_span_score(b, a) >= F.lit(thresh)


def match_firsttok(a: Column, b: Column) -> Column:
    """K1 'firsttok' (``scierc_partial_match_score``,
    eval_metrics.py:67-75): first refind-normalized token equality."""
    return F.element_at(refind_tokens(a), 1) == F.element_at(
        refind_tokens(b), 1
    )


_METRICS = {
    "exact": match_exact,
    "substring": match_substring,
    "jaccard": match_jaccard,
    "head": match_head,
    "rouge": match_rouge,
    "partial": match_partial,
    "firsttok": match_firsttok,
}


def relation_match_cond(
    metric: str = "exact",
    collapse: bool = False,
    consider_reverse: bool = False,
    reverse_labels: list[str] | None = None,
) -> list[Column]:
    """K2: join predicate pred x gold — arg0, arg1 (and label unless
    collapsed) must match under the chosen span metric.

    ``consider_reverse`` (eval_utils.py:283-335 ``consider_reverse``): a
    pair also matches with its arguments SWAPPED (pred.arg0 vs gold.arg1
    and vice versa). ``reverse_labels`` restricts the reverse branch to
    predictions carrying one of the given labels — the reference's
    ``reverse_on_effect`` hardcodes {'effect', 'EFFECT'}
    (eval_utils.py:325-326); here the label set is a parameter since the
    corpus vocabulary differs. Label equality applies to both branches,
    exactly as the reference checks ``labels[0]==labels[1]`` inside each.
    """
    m = _METRICS[metric]
    fwd = m(F.col("p.arg0"), F.col("g.arg0")) & m(F.col("p.arg1"), F.col("g.arg1"))
    if consider_reverse:
        rev = m(F.col("p.arg0"), F.col("g.arg1")) & m(
            F.col("p.arg1"), F.col("g.arg0")
        )
        if reverse_labels is not None:
            rev = rev & F.col("p.label").isin(*reverse_labels)
        arg_match = fwd | rev
    else:
        arg_match = fwd
    cond = [F.col("p.conv_id") == F.col("g.conv_id"), arg_match]
    if not collapse:
        cond.append(F.col("p.label") == F.col("g.label"))
    return cond


# --------------------------------------------------------------------------
# gold derivation (deterministic rule-gold for the synthetic corpus)
# --------------------------------------------------------------------------

def gold_triples(turns: DataFrame, max_dist: int = 3) -> DataFrame:
    """Deterministic 'gold' triples: the tight-distance subset of the rule
    extractor, deduped per (conv, arg0, arg1) keeping the first occurrence's
    label — mirroring ``goldrels.drop_duplicates(subset=["id","arg0","arg1"])``
    (eval_utils.py:755-756) which keeps the first row in document order.
    """
    from dygiepp_spark.operators.extraction import _beam_filter

    mentions = _beam_filter(
        detect_mentions(turns, with_context=True), 0.5, None, "ceil", "start"
    ).drop("text", "n_tokens")
    pairs = relation_pairs(mentions, max_dist)
    w = Window.partitionBy("conv_id", "arg0", "arg1").orderBy(
        "turn_idx", "s1", "s2"
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "arg0", "arg1", "label", "conf")
    )


def gold_triples_ctx(
    turns: DataFrame, max_dist: int = 3, window: int = 1
) -> DataFrame:
    """Gold triples whose argument surfaces carry ±``window`` tokens of
    sentence context around the mention span.

    The reference evaluates against human-annotated gold whose spans are
    multi-word phrases; the synthetic corpus's mentions are single tokens,
    which would make every fuzzy span metric (substring/jaccard/rouge/
    head) collapse to exact-match. Widening the gold surfaces restores the
    many-to-one matching structure those metrics exist for. Context is
    sliced from the raw whitespace split of the sentence (the same
    position convention as the token frame), clipped at sentence edges.
    Dedup: first occurrence per (conv, arg0, arg1) in document order, like
    :func:`gold_triples` / eval_utils.py:755-756.
    """
    from dygiepp_spark.operators.extraction import _beam_filter

    mentions = _beam_filter(
        detect_mentions(turns, with_context=True), 0.5, None, "ceil", "start"
    ).drop("n_tokens")
    pairs = relation_pairs(mentions, max_dist)
    arr = F.split(F.col("sent_text"), " ")
    n = F.size(arr)

    def ctx(s: Column, e: Column) -> Column:
        start1 = F.greatest(s - window + 1, F.lit(1))  # 1-based max(0, s-w)
        end1 = F.least(n, e + window + 1)              # 1-based min(n-1, e+w)
        return F.array_join(F.slice(arr, start1, end1 - start1 + 1), " ")

    widened = pairs.select(
        "conv_id",
        "turn_idx",
        "s1",
        "s2",
        ctx(F.col("s1"), F.col("e1")).alias("arg0"),
        ctx(F.col("s2"), F.col("e2")).alias("arg1"),
        "label",
        "conf",
    )
    w = Window.partitionBy("conv_id", "arg0", "arg1").orderBy(
        "turn_idx", "s1", "s2"
    )
    return (
        widened.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "arg0", "arg1", "label", "conf")
    )


# --------------------------------------------------------------------------
# K3 / K4 / G1
# --------------------------------------------------------------------------

def _safe_f1(p: Column, r: Column) -> Column:
    return F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))


def ie_eval(
    pred: DataFrame,
    gold: DataFrame,
    metric: str = "exact",
    topk: int | None = None,
    consider_reverse: bool = False,
    reverse_labels: list[str] | None = None,
    aliases: DataFrame | None = None,
) -> DataFrame:
    """K3: global P/R/F1 of predicted triples vs gold (eval_utils.py:753-863).

    ``pred``: (conv_id, arg0, arg1, label, conf); ``gold``: same minus conf.
    Returns ONE row (n_pred, n_gold, tp, tp_recall, precision, recall, f1).
    P = TP / n_pred_kept (the reference's TP/(TP+FP) with FP = topK - TP);
    R = TP_recall / n_gold.
    """
    if topk is not None:
        # reference cut is HEAD-k (predrels[:topK], eval_utils.py:783-785),
        # not rank-ties — deterministic tiebreak on the triple key. Scale-
        # safe: first cut to score >= k-th score distributively (no global
        # window over the corpus), then rank only the ~k survivors; the
        # residual single-task window sees k + ties rows, not the frame.
        from dygiepp_spark.operators.pruning import kth_score_threshold

        thr = kth_score_threshold(pred, "conf", topk)
        survivors = pred.join(
            F.broadcast(thr), on=F.col("conf") >= F.col("_thr"), how="inner"
        ).drop("_thr")
        w = Window.orderBy(
            F.col("conf").desc(), "conv_id", "arg0", "arg1", "label"
        )
        pred = survivors.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= topk
        ).drop("_rn")
    # four scalar actions follow (tp, tp_recall, n_pred, n_gold) — pin the
    # upstream extraction once instead of re-running it per action
    pred = pred.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    gold = gold.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    if aliases is not None:
        # K2 coref/alias expansion (eval_utils.py:265-287
        # ``read_coref_matches`` + the alias loops in relation_matching):
        # try every alias variant of each PRED argument; tp/n_pred still
        # count the ORIGINAL pred keys. The alias dim is tiny -> two
        # broadcast joins, no extra shuffle; unknown surfaces fall back to
        # themselves via the left join + coalesce.
        a0 = F.broadcast(
            aliases.select(
                F.col("name").alias("arg0"), F.col("variant").alias("_v0")
            )
        )
        a1 = F.broadcast(
            aliases.select(
                F.col("name").alias("arg1"), F.col("variant").alias("_v1")
            )
        )
        p_exp = (
            pred.join(a0, "arg0", "left")
            .join(a1, "arg1", "left")
            .select(
                "conv_id",
                "arg0",
                "arg1",
                "label",
                F.coalesce(F.col("_v0"), F.col("arg0")).alias("_m0"),
                F.coalesce(F.col("_v1"), F.col("arg1")).alias("_m1"),
            )
        )
    else:
        p_exp = pred.select(
            "conv_id", "arg0", "arg1", "label",
            F.col("arg0").alias("_m0"), F.col("arg1").alias("_m1"),
        )
    p = p_exp.alias("p")
    g = gold.alias("g")
    m = _METRICS[metric]
    fwd = m(F.col("p._m0"), F.col("g.arg0")) & m(F.col("p._m1"), F.col("g.arg1"))
    if consider_reverse:
        rev = m(F.col("p._m0"), F.col("g.arg1")) & m(F.col("p._m1"), F.col("g.arg0"))
        if reverse_labels is not None:
            rev = rev & F.col("p.label").isin(*reverse_labels)
        arg_match = fwd | rev
    else:
        arg_match = fwd
    cond = [
        F.col("p.conv_id") == F.col("g.conv_id"),
        arg_match,
        F.col("p.label") == F.col("g.label"),
    ]
    matches = p.join(g, on=cond)

    # ONE job over the (possibly expensive, fuzzy-predicate) match join
    # for both distinct counts — two separate .count() actions would run
    # the join twice
    tp_row = matches.agg(
        F.count_distinct("p.conv_id", "p.arg0", "p.arg1").alias("tp"),
        F.count_distinct("g.conv_id", "g.arg0", "g.arg1").alias("tp_recall"),
    ).collect()[0]
    tp, tp_recall = tp_row["tp"], tp_row["tp_recall"]
    n_pred = pred.select("conv_id", "arg0", "arg1").distinct().count()
    n_gold = g.distinct().count()

    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(n_pred, n_gold, tp, tp_recall)],
        "n_pred bigint, n_gold bigint, tp bigint, tp_recall bigint",
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("n_pred"), F.lit(1)).cast("double")
    rec = F.col("tp_recall").cast("double") / F.greatest(F.col("n_gold"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def ie_span_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """K4 (eval_utils.py:620-682): argument-span-level P/R/F1 ignoring
    pairing — explode arg0/arg1 to (conv, text) sets on both sides."""

    def spans_of(df: DataFrame) -> DataFrame:
        return (
            df.select("conv_id", F.col("arg0").alias("span"))
            .unionByName(df.select("conv_id", F.col("arg1").alias("span")))
            .distinct()
        )

    ps = spans_of(pred).localCheckpoint(eager=False)
    gs = spans_of(gold).localCheckpoint(eager=False)
    tp = ps.join(gs, ["conv_id", "span"]).count()
    n_p, n_g = ps.count(), gs.count()
    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(n_p, n_g, tp)], "n_pred_spans bigint, n_gold_spans bigint, tp bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("n_pred_spans"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("n_gold_spans"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def eval_grid(
    pred: DataFrame,
    gold: DataFrame,
    metrics: tuple = ("exact", "substring", "rouge", "partial"),
    topks: tuple = (50, 100, 150, 200),
) -> DataFrame:
    """The reference's evaluation grid sweep (eval_metric.py:142-214):
    one job producing the (match_metric x collapse x topK) stats frame
    that the reference writes to ``stats.tsv`` — relation P/R/F1 per
    (metric, collapse) cell, span-level P/R/F1 per metric, and P@K cells.

    Efficiency contract (the reason this is ONE operator and not a loop
    over :func:`ie_eval`): the expensive fuzzy match join runs ONCE per
    metric — both collapse variants are read off the same join via a
    label-equality flag (reference semantics: ``collapse`` just sets
    ``labels=[1,1]``, eval_utils.py:798-800, i.e. drops label equality) —
    and all four P@K cells are read off ONE ranked join (rank <= k
    conditional counts). Pred/gold are pinned with localCheckpoint so the
    upstream extraction runs once, not once per cell.

    Output rows: (kind='rel', metric, collapse, topk=NULL, full counts +
    P/R/F1), (kind='span', metric, collapse=NULL, ...), and (kind=
    'p_at_k', metric, collapse=false, topk=k, precision only) for EVERY
    metric x k — the reference's ``p_at_k`` loop runs inside each metric
    cell (eval_metric.py:155-163). The rank cut is computed ONCE (shared
    ranked frame); each metric adds one ranked join with per-k
    conditional counts. All joins are conv_id equi-joins; the only global
    exchange is the distributed k-th-score prefilter feeding the ranked
    frame (bounded at max(topks) rows plus ties).
    """
    pred = pred.select(
        "conv_id", "arg0", "arg1", "label", "conf"
    ).localCheckpoint(eager=False)
    gold = gold.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    p_keys = pred.select("conv_id", "arg0", "arg1").distinct().localCheckpoint(
        eager=False
    )
    n_pred = p_keys.count()
    n_gold = gold.distinct().count()

    p = pred.select("conv_id", "arg0", "arg1", "label").distinct().alias("p")
    g = gold.alias("g")
    rows: list[tuple] = []

    def prf(tp, np_, tpr, ng_):
        prec = tp / max(np_, 1)
        rec = tpr / max(ng_, 1)
        f1 = 2.0 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        return prec, rec, f1

    pk = F.struct("p.conv_id", "p.arg0", "p.arg1")
    gk = F.struct("g.conv_id", "g.arg0", "g.arg1")
    for metric in metrics:
        m = _METRICS[metric]
        arg_match = m(F.col("p.arg0"), F.col("g.arg0")) & m(
            F.col("p.arg1"), F.col("g.arg1")
        )
        joined = p.join(
            g, on=[F.col("p.conv_id") == F.col("g.conv_id"), arg_match]
        )
        label_eq = F.col("p.label") == F.col("g.label")
        c = joined.agg(
            F.count_distinct(F.when(label_eq, pk)).alias("tp_nc"),
            F.count_distinct(F.when(label_eq, gk)).alias("tpr_nc"),
            F.count_distinct(pk).alias("tp_c"),
            F.count_distinct(gk).alias("tpr_c"),
        ).collect()[0]
        for collapse, tp, tpr in [
            (False, c["tp_nc"], c["tpr_nc"]),
            (True, c["tp_c"], c["tpr_c"]),
        ]:
            prec, rec, f1 = prf(tp, n_pred, tpr, n_gold)
            rows.append(
                ("rel", metric, collapse, None, n_pred, n_gold, tp, tpr,
                 prec, rec, f1)
            )

    # span level (K4 under each metric): arg multiset -> distinct spans
    def spans_of(df: DataFrame) -> DataFrame:
        return (
            df.select("conv_id", F.col("arg0").alias("span"))
            .unionByName(df.select("conv_id", F.col("arg1").alias("span")))
            .distinct()
        )

    ps = spans_of(pred).localCheckpoint(eager=False)
    gs = spans_of(gold).localCheckpoint(eager=False)
    n_ps, n_gs = ps.count(), gs.count()
    for metric in metrics:
        m = _METRICS[metric]
        sj = ps.alias("p").join(
            gs.alias("g"),
            on=[
                F.col("p.conv_id") == F.col("g.conv_id"),
                m(F.col("p.span"), F.col("g.span")),
            ],
        )
        c = sj.agg(
            F.count_distinct(F.struct("p.conv_id", "p.span")).alias("tp"),
            F.count_distinct(F.struct("g.conv_id", "g.span")).alias("tpr"),
        ).collect()[0]
        prec, rec, f1 = prf(c["tp"], n_ps, c["tpr"], n_gs)
        rows.append(
            ("span", metric, None, None, n_ps, n_gs, c["tp"], c["tpr"],
             prec, rec, f1)
        )

    # P@K cells: one shared ranked frame; per metric one ranked join with
    # conditional counts per k
    from dygiepp_spark.operators.pruning import kth_score_threshold

    max_k = max(topks)
    n_pred_rows = pred.count()
    thr = kth_score_threshold(pred, "conf", max_k)
    survivors = pred.join(
        F.broadcast(thr), on=F.col("conf") >= F.col("_thr"), how="inner"
    ).drop("_thr")
    w = Window.orderBy(F.col("conf").desc(), "conv_id", "arg0", "arg1", "label")
    ranked = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_k)
        .localCheckpoint(eager=False)
        .alias("p")
    )
    for metric in metrics:
        mt = _METRICS[metric]
        tk_join = ranked.join(
            g,
            on=[
                F.col("p.conv_id") == F.col("g.conv_id"),
                mt(F.col("p.arg0"), F.col("g.arg0")),
                mt(F.col("p.arg1"), F.col("g.arg1")),
                F.col("p.label") == F.col("g.label"),
            ],
        )
        c = tk_join.agg(
            *[
                F.count_distinct(F.when(F.col("_rn") <= k, pk)).alias(f"tp_{k}")
                for k in topks
            ]
        ).collect()[0]
        for k in topks:
            k_eff = min(k, n_pred_rows)
            tp = c[f"tp_{k}"]
            rows.append(
                ("p_at_k", metric, False, k, k_eff, None, tp, None,
                 tp / max(k_eff, 1), None, None)
            )

    spark = pred.sparkSession
    return spark.createDataFrame(
        rows,
        "kind string, metric string, collapse boolean, topk int, "
        "n_pred bigint, n_gold bigint, tp bigint, tp_recall bigint, "
        "precision double, recall double, f1 double",
    )


def micro_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """G1 (dygie/training/ner_metrics.py:22-64 + f1.py:6-17): micro P/R/F1
    with exact (arg0, arg1, label) matching, computed distributed — per-conv
    TP via join, global sums, safe division. One output row."""
    p = pred.select("conv_id", "arg0", "arg1", "label").distinct().localCheckpoint(
        eager=False
    )
    g = gold.select("conv_id", "arg0", "arg1", "label").distinct().localCheckpoint(
        eager=False
    )
    tp = p.join(g, ["conv_id", "arg0", "arg1", "label"]).count()
    n_p, n_g = p.count(), g.count()
    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(tp, n_p - tp, n_g - tp)], "tp bigint, fp bigint, fn bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def micro_prf_by_namespace(
    pred: DataFrame, gold: DataFrame, n_namespaces: int = 3
) -> DataFrame:
    """G6 namespace averaging (dygie.py:139-158 label namespaces;
    ``get_metrics``'s per-namespace scores + their mean): per-namespace
    micro P/R/F1 rows plus a ``__mean__`` row averaging the F-scores.

    The transcript corpus is single-dataset, so the namespace is a
    deterministic conversation shard (``conv_id % n``) — the stand-in for
    the reference's per-dataset label namespaces; swap the shard column
    for a real ``dataset`` column when one exists.

    All counts are integer aggregates; the mean row is folded in FIXED
    namespace order (left-associated sum over ns = 0..n-1), so the double
    is reproducible bit-for-bit in any engine. EVERY shard 0..n-1 gets a
    row (zeroed counts when empty) and the mean divides by
    ``n_namespaces`` — the reference averages over its configured
    namespace set, not over whichever shards happen to be non-empty, and
    a fixed shard domain keeps both engines on the same fold even when a
    shard is empty. Rows whose conv_id is non-numeric (NULL namespace)
    are excluded identically on both sides.
    """
    ns = (F.col("conv_id").cast("bigint") % n_namespaces).alias("namespace")
    key = ["conv_id", "arg0", "arg1", "label"]
    p = (
        pred.select(ns, *key).filter(F.col("namespace").isNotNull())
        .distinct().localCheckpoint(eager=False)
    )
    g = (
        gold.select(ns, *key).filter(F.col("namespace").isNotNull())
        .distinct().localCheckpoint(eager=False)
    )
    tp = (
        p.join(g, ["namespace", *key])
        .groupBy("namespace")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    np_ = p.groupBy("namespace").agg(F.count(F.lit(1)).alias("n_pred"))
    ng_ = g.groupBy("namespace").agg(F.count(F.lit(1)).alias("n_gold"))
    observed = {
        r["namespace"]: r
        for r in np_.join(ng_, "namespace", "full_outer")
        .join(tp, "namespace", "left")
        .fillna(0, ["n_pred", "n_gold", "tp"])
        .collect()
    }

    def prf(tp_, n_p, n_g):
        prec = tp_ / max(n_p, 1)
        rec = tp_ / max(n_g, 1)
        f1 = 2.0 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        return prec, rec, f1

    out = []
    acc_p = acc_r = acc_f = 0.0
    for ns_ix in range(n_namespaces):
        r = observed.get(ns_ix)
        tp_, n_p, n_g = (
            (r["tp"], r["n_pred"], r["n_gold"]) if r is not None else (0, 0, 0)
        )
        prec, rec, f1 = prf(tp_, n_p, n_g)
        out.append((str(ns_ix), n_p, n_g, tp_, prec, rec, f1))
        acc_p, acc_r, acc_f = acc_p + prec, acc_r + rec, acc_f + f1
    k = n_namespaces
    out.append(("__mean__", None, None, None, acc_p / k, acc_r / k, acc_f / k))
    spark = pred.sparkSession
    return spark.createDataFrame(
        out,
        "namespace string, n_pred bigint, n_gold bigint, tp bigint, "
        "precision double, recall double, f1 double",
    )


# --------------------------------------------------------------------------
# K5 event-tuple eval + G4 argument multiplicity
# --------------------------------------------------------------------------

def ie_eval_event(pred_bin: DataFrame, gold_bin: DataFrame) -> DataFrame:
    """K5 (eval_utils.py:866-940): (arg0, trigger, arg1) tuple matching —
    match requires arg0, arg1 and the trigger's event type to agree (the
    reference accepts label-or-trigger-text; our event types ARE derived
    from trigger text, so one equality covers both). One output row."""
    key = ["conv_id", "arg0", "event_type", "arg1"]
    p = pred_bin.select(*key).distinct().localCheckpoint(eager=False)
    g = gold_bin.select(*key).distinct().localCheckpoint(eager=False)
    tp = p.join(g, key).count()
    n_p, n_g = p.count(), g.count()
    spark = pred_bin.sparkSession
    row = spark.createDataFrame(
        [(tp, n_p - tp, n_g - tp)], "tp bigint, fp bigint, fn bigint"
    )
    prec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    rec = F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return row.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _safe_f1(prec, rec).alias("f1"),
    )


def event_f1_4way(pred_events: DataFrame, gold_events: DataFrame) -> DataFrame:
    """G3 four-way event metrics (dygie/training/event_metrics.py:25-117).

    The reference scores events on FOUR separate axes:

    * ``trig_id``    — predicted trigger token offset present in the gold
      trigger dict (event_metrics.py:49-52);
    * ``trig_class`` — offset AND event label agree (:53-54);
    * ``arg_id``     — argument entries collapsed through their trigger to
      ``(arg_ix, trigger_LABEL)`` match a gold entry on that 2-tuple — the
      trigger OFFSET need not match (:56-68, ``entry[:2] == gold[:2]``);
    * ``arg_class``  — the 3-tuple ``(arg_ix, trigger_label, role)``
      matches (:79, ``entry == gold``).

    Counting reproduces the reference exactly: trigger dicts are per
    sentence keyed on token offset; argument entries are the dict-collapsed
    LISTS (duplicates kept — two triggers with the same label sharing an
    argument yield two identical entries, each counted, :70-74), every
    predicted entry scores an any-match against the gold list (:77-83,
    NOT one-to-one), and the same matched count feeds both precision and
    recall (f1.py:13-17 ``compute_f1``).

    ``pred_events`` / ``gold_events`` are :func:`~dygiepp_spark.operators.
    extraction.extract_events` frames; as in K5, gold is the extractor at a
    tighter knob, so the trigger inventories genuinely differ (a trigger
    whose only arguments sit at distance 3-4 exists on the pred side only).
    Event labels are text-derived on this corpus, so trig_class == trig_id
    here while the arg axes stay fully four-way (an argument re-attached to
    a *different* same-label trigger can flip its positional role, so
    arg_class < arg_id) — the implementation keys all four axes exactly as
    the reference does.

    One row out. Plan: two broadcast-size distinct frames per side, two
    equi-joins (conv_id, turn_idx keys) + scalar counts — every join key is
    high-cardinality and uniform; scales with the corpus like ie_eval.
    """
    trig_key = ["conv_id", "turn_idx", "trigger_ix"]
    p_trig = (
        pred_events.select(*trig_key, "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    g_trig = (
        gold_events.select(*trig_key, "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # gold trigger dict keyed on offset -> at most one label per offset, so
    # the join below cannot fan out
    g = g_trig.select(*trig_key, F.col("event_type").alias("_g_label"))
    trig_row = (
        p_trig.join(g, trig_key, "left")
        .agg(
            F.count(F.lit(1)).alias("n_pred_trig"),
            F.sum(
                F.when(F.col("_g_label").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("tp_trig_id"),
            F.sum(
                F.when(F.col("_g_label") == F.col("event_type"), 1).otherwise(0)
            ).cast("bigint").alias("tp_trig_class"),
        )
        .collect()[0]
    )
    n_gold_trig = g_trig.count()

    # formatted argument lists: one entry per (trigger, arg) pair row,
    # collapsed to (arg_SPAN, trigger_label, role) with multiplicity kept —
    # the reference's entry key is the full argument span tuple
    # (event_metrics.py:62 ``(trigger_ix, arg_ix)`` where arg_ix is the
    # (start, end) span), so both endpoints participate in identity
    arg_cols = ["conv_id", "turn_idx", "arg_start", "arg_end",
                "event_type", "role"]
    p_arg = pred_events.select(*arg_cols).localCheckpoint(eager=False)
    g_arg = gold_events.select(*arg_cols).localCheckpoint(eager=False)
    # any-match: pre-collapse gold to its distinct id-keys with the role
    # set, so one left join scores both axes without fan-out
    id_key = ["conv_id", "turn_idx", "arg_start", "arg_end", "event_type"]
    g_keys = g_arg.groupBy(*id_key).agg(
        F.collect_set("role").alias("_g_roles")
    )
    arg_row = (
        p_arg.join(g_keys, id_key, "left")
        .agg(
            F.count(F.lit(1)).alias("n_pred_arg"),
            F.sum(
                F.when(F.col("_g_roles").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("tp_arg_id"),
            F.sum(
                F.when(
                    F.array_contains(
                        F.coalesce(
                            F.col("_g_roles"), F.array().cast("array<string>")
                        ),
                        F.col("role"),
                    ),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("tp_arg_class"),
        )
        .collect()[0]
    )
    n_gold_arg = g_arg.count()

    spark = pred_events.sparkSession
    row = spark.createDataFrame(
        [
            (
                trig_row["n_pred_trig"], n_gold_trig,
                trig_row["tp_trig_id"], trig_row["tp_trig_class"],
                arg_row["n_pred_arg"], n_gold_arg,
                arg_row["tp_arg_id"], arg_row["tp_arg_class"],
            )
        ],
        "n_pred_trig bigint, n_gold_trig bigint, tp_trig_id bigint, "
        "tp_trig_class bigint, n_pred_arg bigint, n_gold_arg bigint, "
        "tp_arg_id bigint, tp_arg_class bigint",
    )

    def safe_div(num: Column, denom: Column) -> Column:
        # f1.py:6-10 — 0 when the denominator is 0
        return F.when(denom > 0, num.cast("double") / denom.cast("double")).otherwise(
            F.lit(0.0)
        )

    out_cols = ["*"]
    for axis, tp_c, np_c, ng_c in [
        ("trig_id", "tp_trig_id", "n_pred_trig", "n_gold_trig"),
        ("trig_class", "tp_trig_class", "n_pred_trig", "n_gold_trig"),
        ("arg_id", "tp_arg_id", "n_pred_arg", "n_gold_arg"),
        ("arg_class", "tp_arg_class", "n_pred_arg", "n_gold_arg"),
    ]:
        p = safe_div(F.col(tp_c), F.col(np_c))
        r = safe_div(F.col(tp_c), F.col(ng_c))
        out_cols += [
            p.alias(f"{axis}_precision"),
            r.alias(f"{axis}_recall"),
            safe_div(F.lit(2.0) * p * r, p + r).alias(f"{axis}_f1"),
        ]
    return row.select(*out_cols)


def arg_multiplicity(events: DataFrame) -> DataFrame:
    """G4 (event_metrics.py:120-157): fraction of argument spans used by
    more than one trigger. One aggregation + one row out."""
    per_span = events.groupBy("conv_id", "turn_idx", "arg_start", "arg_end").agg(
        F.count_distinct("trigger_ix").alias("nt")
    )
    return per_span.agg(
        F.count(F.lit(1)).alias("n_args"),
        F.sum(F.when(F.col("nt") > 1, 1).otherwise(0)).cast("bigint").alias("n_shared"),
    ).select(
        "n_args",
        "n_shared",
        (
            F.col("n_shared").cast("double")
            / F.greatest(F.col("n_args"), F.lit(1)).cast("double")
        ).alias("shared_frac"),
    )


# --------------------------------------------------------------------------
# G7 greedy one-to-one matching (diff / annotation_eval)
# --------------------------------------------------------------------------

def greedy_match(
    pred: DataFrame, gold: DataFrame, metric: str = "substring",
    max_rounds: int = 64,
) -> DataFrame:
    """G7 (eval_utils.py:498-563 ``diff`` / :567-617 ``annotation_eval``):
    match pred and gold triples one-to-one with greedy dedup bookkeeping
    (``seen_pred``/``seen_gold``), under a fuzzy span metric that makes the
    candidate graph many-to-many.

    Semantics: the EXACT sequential first-wins greedy over candidates in
    lexicographic (pred key, gold key) order — computed distributively by
    iterated local-minima selection: each round accepts every candidate
    that is simultaneously its pred's first remaining gold AND its gold's
    first remaining pred (both ranked over ALL remaining candidates), then
    removes the touched preds/golds. A candidate is accepted by the
    sequential scan iff no earlier candidate sharing its pred or gold is
    accepted; the round-r accepted set is exactly the r-th wave of that
    recursion, so the fixpoint equals the sequential result (the
    globally-minimal remaining candidate is always locally minimal, so
    every round progresses). Rounds needed = conflict-chain depth —
    bounded by ``max_rounds`` as an engine guard; exhausting the bound
    with candidates remaining raises rather than silently truncating.
    """
    m = _METRICS[metric]
    p = pred.select(
        "conv_id",
        F.col("arg0").alias("p_arg0"),
        F.col("arg1").alias("p_arg1"),
        F.col("label").alias("p_label"),
    ).distinct().alias("p")
    g = gold.select(
        "conv_id",
        F.col("arg0").alias("g_arg0"),
        F.col("arg1").alias("g_arg1"),
        F.col("label").alias("g_label"),
    ).distinct().alias("g")
    cand = p.join(
        g,
        on=[
            F.col("p.conv_id") == F.col("g.conv_id"),
            m(F.col("p_arg0"), F.col("g_arg0")),
            m(F.col("p_arg1"), F.col("g_arg1")),
            F.col("p_label") == F.col("g_label"),
        ],
    ).select(
        F.col("p.conv_id").alias("conv_id"),
        "p_arg0", "p_arg1", "p_label", "g_arg0", "g_arg1", "g_label",
    ).localCheckpoint(eager=True)

    pk = ["p_arg0", "p_arg1", "p_label"]
    gk = ["g_arg0", "g_arg1", "g_label"]
    w_pred = Window.partitionBy("conv_id", *pk).orderBy(*gk)
    w_gold = Window.partitionBy("conv_id", *gk).orderBy(*pk)
    spark = pred.sparkSession
    matched = spark.createDataFrame([], cand.schema)
    for _ in range(max_rounds):
        accepted = (
            cand.withColumn("_rp", F.row_number().over(w_pred))
            .withColumn("_rg", F.row_number().over(w_gold))
            .filter((F.col("_rp") == 1) & (F.col("_rg") == 1))
            .drop("_rp", "_rg")
            .localCheckpoint(eager=True)
        )
        matched = matched.unionByName(accepted)
        cand = (
            cand.join(accepted.select("conv_id", *pk), ["conv_id", *pk], "left_anti")
            .join(accepted.select("conv_id", *gk), ["conv_id", *gk], "left_anti")
            .localCheckpoint(eager=True)
        )
        if cand.limit(1).count() == 0:
            break
    else:
        # exhausting the round budget with candidates left would silently
        # truncate the matching (and diverge from both the sequential
        # semantics and the unrolled oracle) — fail loudly instead
        if cand.limit(1).count() > 0:
            raise RuntimeError(
                f"greedy_match did not converge within {max_rounds} rounds; "
                "conflict chains deeper than the bound — raise max_rounds"
            )
    return matched.select(
        "conv_id", "p_arg0", "p_arg1", "p_label", "g_arg0", "g_arg1", "g_label"
    )


# --------------------------------------------------------------------------
# K6 transitive closure
# --------------------------------------------------------------------------

def transitive_closure(
    gold: DataFrame, rounds: int = 2
) -> DataFrame:
    """K6 (eval_utils.py:466-496): within each conv add (a, c) for every
    (a, b), (b, c); conf = product. ``rounds`` bounded expansion rounds with
    max-conf dedup per (conv, a, c) — deterministic (the reference's
    while-loop confidence is insertion-order-dependent; max over paths is
    the order-free version and agrees when there is a single path).

    Each round = one self-equi-join on (conv_id, join surface) + one
    aggregate; localCheckpoint between rounds cuts lineage like the CC loop.
    """
    closure = gold.select("conv_id", "arg0", "arg1", "conf")
    for _ in range(rounds):
        a = closure.alias("a")
        b = closure.alias("b")
        new = a.join(
            b,
            on=[
                F.col("a.conv_id") == F.col("b.conv_id"),
                F.col("a.arg1") == F.col("b.arg0"),
            ],
        ).select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.arg0").alias("arg0"),
            F.col("b.arg1").alias("arg1"),
            (F.col("a.conf") * F.col("b.conf")).alias("conf"),
        )
        closure = (
            closure.unionByName(new)
            .groupBy("conv_id", "arg0", "arg1")
            .agg(F.max("conf").alias("conf"))
        ).localCheckpoint(eager=False)
    return closure


def ie_errors(
    pred: DataFrame,
    gold: DataFrame,
    docs: DataFrame,
    metric: str = "substring",
    collapse: bool = False,
) -> DataFrame:
    """Error listing for low-agreement documents (``ie_errors``,
    eval_utils.py:946-1020).

    For every document whose matched (gold, pred) pair count is below
    half its prediction count (``found_count / len(preds) < 0.5``,
    eval_utils.py:1003), emit one row per gold relation (pred columns
    blank) and one row per unmatched prediction whose argument pair does
    not shadow a gold pair (gold columns blank) — the frame the reference
    writes to ``errors_non_collapse.tsv`` for manual inspection.

    Inputs: ``pred`` (conv_id, arg0, arg1, label, conf), ``gold``
    (conv_id, arg0, arg1, label) — pass gold through
    :func:`transitive_closure` first to mirror the reference's
    ``transivity=True`` default (note the closure rows carry NO label
    there: ``new_data['rel']: [...]`` at eval_utils.py:484-489 is an
    annotated expression statement, not an assignment, so the added rows
    get NaN labels and only ever match under ``collapse=True``) — and
    ``docs`` (conv_id, doc_text) for the text column carried on every
    row (eval_utils.py:1008-1016 takes the doc's first gold text).

    Documented deviations from the reference loop, both determinism
    fixes: (1) ``pred_matched`` accumulates ACROSS documents there (a
    loop-order artifact that lets doc A's match suppress doc B's error
    row for the same surface pair); matched-ness here is per
    (conv_id, arg0, arg1). (2) duplicate predictions per argument pair
    keep the max-conf row, tie broken on label (the reference keeps the
    first row of the conf-sorted frame, whose order among ties is
    unspecified).

    Scale shape: two equi-joins on conv_id with post-probe span
    predicates (same as K3), two per-doc hash aggregates, semi/anti
    joins on (conv_id, arg0, arg1) — all shuffle on conv_id-rooted keys;
    nothing global, no windows over the corpus (the dedup window is
    partitioned per argument pair).
    """
    m = _METRICS[metric]
    p = pred.select("conv_id", "arg0", "arg1", "label", "conf").localCheckpoint(
        eager=False
    )
    g = gold.select("conv_id", "arg0", "arg1", "label").localCheckpoint(
        eager=False
    )
    arg_match = m(F.col("p.arg0"), F.col("g.arg0")) & m(
        F.col("p.arg1"), F.col("g.arg1")
    )
    cond = [F.col("p.conv_id") == F.col("g.conv_id"), arg_match]
    if not collapse:
        cond.append(F.col("p.label") == F.col("g.label"))
    # reused by the found-count agg AND the matched-pred anti-join — pin it
    matches = (
        p.alias("p")
        .join(g.alias("g"), on=cond)
        .select(
            F.col("p.conv_id").alias("conv_id"),
            F.col("p.arg0").alias("pa0"),
            F.col("p.arg1").alias("pa1"),
            F.col("g.arg0").alias("ga0"),
            F.col("g.arg1").alias("ga1"),
        )
        .localCheckpoint(eager=False)
    )
    # found_count: distinct matched (gold, pred) argument quadruples per doc
    # (seen_pred_gold dedup, eval_utils.py:995-999)
    found = (
        matches.distinct()
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_fc"))
    )
    n_pred = p.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_np"))
    # only docs present in BOTH frames enter the loop (eval_utils.py:974-975);
    # 2*fc < np is the integer form of fc/np < 0.5
    bad = (
        n_pred.join(g.select("conv_id").distinct(), "conv_id")
        .join(found, "conv_id", "left")
        .filter(F.coalesce(F.col("_fc"), F.lit(0)) * 2 < F.col("_np"))
        .select("conv_id")
    )
    blank = F.lit("")
    gold_rows = (
        g.join(bad, "conv_id", "semi")
        # gold is unique per (conv, arg0, arg1) when pre-deduped like
        # gold_triples; the agg is the seen_rels guard for closure-derived
        # duplicates (deterministic: min label)
        .groupBy("conv_id", "arg0", "arg1")
        .agg(F.min("label").alias("gold_label"))
        .select(
            "conv_id",
            blank.alias("arg0_pred"),
            blank.alias("arg1_pred"),
            blank.alias("pred_label"),
            F.col("arg0").alias("arg0_gold"),
            F.col("arg1").alias("arg1_gold"),
            "gold_label",
        )
    )
    dedup_w = Window.partitionBy("conv_id", "arg0", "arg1").orderBy(
        F.col("conf").desc(), "label"
    )
    pred_rows = (
        p.join(bad, "conv_id", "semi")
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        # not matched to any gold of the same doc (pred_matched check)
        .join(
            matches.select(
                "conv_id",
                F.col("pa0").alias("arg0"),
                F.col("pa1").alias("arg1"),
            ).distinct(),
            ["conv_id", "arg0", "arg1"],
            "anti",
        )
        # argument pair must not shadow a gold pair already listed
        # (the shared seen_rels set, eval_utils.py:1010-1016)
        .join(
            g.select("conv_id", "arg0", "arg1"),
            ["conv_id", "arg0", "arg1"],
            "anti",
        )
        .select(
            "conv_id",
            F.col("arg0").alias("arg0_pred"),
            F.col("arg1").alias("arg1_pred"),
            F.col("label").alias("pred_label"),
            blank.alias("arg0_gold"),
            blank.alias("arg1_gold"),
            blank.alias("gold_label"),
        )
    )
    return (
        gold_rows.unionByName(pred_rows)
        .join(docs.select("conv_id", F.col("doc_text").alias("text")), "conv_id")
        .select(
            "conv_id",
            "text",
            "arg0_pred",
            "arg1_pred",
            "pred_label",
            "arg0_gold",
            "arg1_gold",
            "gold_label",
        )
    )


# ---------------------------------------------------------------------------
# prediction-quality ranking + annotator agreement (the consumers sitting on
# top of the eval grid / greedy matching: eval_predictions_quality.py and
# annotation_metric.py in the reference)
# ---------------------------------------------------------------------------


def _method_union(preds_by_method: dict[str, DataFrame]) -> DataFrame:
    """Normalized prediction frame shared by the accept rankings and the
    human-eval sheets: DISTINCT (method, conv_id, arg0, arg1) rows,
    methods in sorted-name order (the Spark twin of the oracle side's
    ``_method_preds_ctes``)."""
    parts = [
        df.select(
            F.lit(name).alias("method"), "conv_id", "arg0", "arg1"
        ).distinct()
        for name, df in sorted(preds_by_method.items())
    ]
    u = parts[0]
    for pp in parts[1:]:
        u = u.unionByName(pp)
    return u


def method_accept_rate(
    preds_by_method: dict[str, DataFrame], gold: DataFrame
) -> DataFrame:
    """Per-method accept-rate ranking (eval_predictions_quality.py:12-27
    ``calc_accept_rate_per_alg``): the reference reads the annotation
    task's ``<doc>__<method>`` doc_key suffix and counts the human
    ``accept`` answers per extraction method. Method provenance is carried
    here as a column on each prediction frame, and the accept answer is
    the deterministic stand-in "the predicted pair appears in gold" (the
    reference's companion ``calc_original_accept_per_alg`` accept-by-code
    path, :104-135) — a predicate both engines compute identically.

    Output: (method, n_samples, n_accept, accept_rate), one row per
    method, samples = DISTINCT (conv, arg0, arg1) pairs per method.

    Scale: one union of the method frames, one (conv, arg0, arg1)-keyed
    left join against the distinct gold pairs (AQE picks broadcast when
    gold fits), one map-side-combinable groupBy on the low-cardinality
    method key. accept_rate is a single IEEE double division of two exact
    integers — portable.
    """
    gp = gold.select("conv_id", "arg0", "arg1").distinct().withColumn(
        "_g", F.lit(1)
    )
    u = _method_union(preds_by_method)
    marked = u.join(gp, ["conv_id", "arg0", "arg1"], "left")
    return marked.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count("_g").alias("n_accept"),
    ).select(
        "method",
        "n_samples",
        "n_accept",
        (
            F.col("n_accept").cast("double") / F.col("n_samples").cast("double")
        ).alias("accept_rate"),
    )


#: deterministic stand-in for the spacy English stopword set the
#: reference filters with (eval_utils.py:13,183-184 ``filter_stopwords``;
#: spacy is not in this environment). Fixed tuple so both engines and
#: every run share the exact vocabulary; extend freely — the list is a
#: constant folded into the JVM expression, never a per-row lookup.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "the", "and", "or", "but", "if", "then", "of", "in", "on",
    "at", "to", "for", "with", "by", "from", "as", "is", "are", "was",
    "were", "be", "been", "being", "it", "its", "this", "that", "these",
    "those", "he", "she", "they", "we", "you", "i", "his", "her", "their",
    "our", "your", "my", "not", "no", "so", "do", "does", "did", "can",
    "could", "will", "would", "should", "may", "might", "must", "have",
    "has", "had", "there", "here", "when", "where", "which", "who", "what",
    "how", "all", "any", "both", "each", "more", "most", "other", "some",
    "such", "only", "own", "same", "than", "too", "very", "just", "about",
    "into", "over", "under", "again", "further", "once", "up", "down",
    "out", "off", "between", "during", "before", "after", "above", "below",
)


def stop_filtered(c: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """``filter_stopwords`` (eval_utils.py:183-184) as a JVM expression:
    lower+trim, split on single space, drop stopword tokens (multiplicity
    and order preserved), re-join with spaces. The reference keeps the
    kept tokens' original case, but every downstream span metric lowers
    its inputs anyway, so lowering here is match-equivalent — and keeps
    the DuckDB twin a one-liner."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.concat_ws(
        " ",
        F.filter(
            F.split(F.lower(F.trim(c)), " "),
            lambda t: ~F.array_contains(sw, t),
        ),
    )


def method_accept_rate_filtered(
    preds_by_method: dict[str, DataFrame],
    gold: DataFrame,
    thresh: float = 0.4,
    consider_reverse: bool = False,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """:func:`method_accept_rate` with the full
    ``calc_original_accept_per_alg`` knob set
    (eval_predictions_quality.py:103-178): accept-by-code = the predicted
    pair FUZZY-matches some gold pair of the same doc — jaccard ratio
    >= ``thresh`` on STOPWORD-FILTERED arguments (``filter_stop=True``,
    ``metric='jaccard'``), with the optional swapped-argument branch
    (``consider_reverse``). Label equality is not gated (the collapse
    semantics): the baseline generators emit unlabeled pairs, exactly the
    situation the reference runs this ranking in.

    HONEST DIVERGENCES, documented: (1) the reference's ``filter_stop``
    branch computes the filtered strings into ``p1``/``p2`` but then
    matches on the UNFILTERED loop variables (``pair1_arg0`` etc.,
    eval_utils.py:313-317) — a dead assignment; we implement the evident
    intent and match on the filtered spans. (2) the reference's
    ``matched_predictions`` gate (eval_predictions_quality.py:131-141)
    skips admitting a pred when the GOLD pair it matched textually equals
    an ALREADY-STORED PRED pair — a sequential-loop artifact that mixes
    the gold and pred key spaces and depends on pandas iteration order,
    so it has no well-defined distributed re-expression; here every pred
    that fuzzy-matches any same-doc gold is accepted, order-independent.

    Output: (method, n_samples, n_accept, accept_rate) — same core shape
    as the unfiltered ranking so consumers can diff the two — plus the
    reference's four-way confusion (:139-178): true/false accept/reject
    of the fuzzy accept-by-code against the ``answer`` column. No human
    answers exist in this corpus, so ``answer`` is the deterministic
    stand-in the r4 ranking already uses — the pair appears EXACTLY in
    gold — making the four-way a fuzzy-vs-exact agreement table (e.g.
    ``n_false_accept`` = pairs only the fuzzy matcher accepts).

    Scale: one union of the method frames, ONE conv_id equi-join against
    the gold pairs with the fuzzy predicate evaluated post-probe (per-doc
    candidate sets are small; the join key does the pruning), a distinct
    on the pred key, one map-side-combinable method rollup.
    """
    u = _method_union(preds_by_method)
    u = u.withColumn("fa0", stop_filtered(F.col("arg0"), stopwords)).withColumn(
        "fa1", stop_filtered(F.col("arg1"), stopwords)
    )
    g = (
        gold.select("conv_id", "arg0", "arg1")
        .distinct()
        .select(
            "conv_id",
            stop_filtered(F.col("arg0"), stopwords).alias("ga0"),
            stop_filtered(F.col("arg1"), stopwords).alias("ga1"),
        )
    )
    # span_matching's comparator is STRICTLY greater (eval_utils.py:218)
    # — the accept path reproduces it, unlike K1's documented >= cells.
    # All-stopword arguments filter to '' and '' vs '' would jaccard to
    # 1.0 (split('') is ['']) — the reference's empty token lists can
    # never match, so an empty side disqualifies the pair outright.
    nonempty = (
        (F.col("fa0") != "") & (F.col("fa1") != "")
        & (F.col("ga0") != "") & (F.col("ga1") != "")
    )
    fwd = (jaccard_ratio(F.col("fa0"), F.col("ga0")) > thresh) & (
        jaccard_ratio(F.col("fa1"), F.col("ga1")) > thresh
    )
    cond = fwd
    if consider_reverse:
        rev = (jaccard_ratio(F.col("fa0"), F.col("ga1")) > thresh) & (
            jaccard_ratio(F.col("fa1"), F.col("ga0")) > thresh
        )
        cond = fwd | rev
    cond = nonempty & cond
    matched = (
        u.join(g, "conv_id")
        .filter(cond)
        .select("method", "conv_id", "arg0", "arg1")
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    exact = (
        gold.select("conv_id", "arg0", "arg1")
        .distinct()
        .withColumn("_a", F.lit(1))
    )
    marked = u.join(
        matched, ["method", "conv_id", "arg0", "arg1"], "left"
    ).join(exact, ["conv_id", "arg0", "arg1"], "left")
    acc, ans = F.col("_m").isNotNull(), F.col("_a").isNotNull()
    return marked.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count("_m").alias("n_accept"),
        F.count(F.when(acc & ans, 1)).alias("n_true_accept"),
        F.count(F.when(acc & ~ans, 1)).alias("n_false_accept"),
        F.count(F.when(~acc & ans, 1)).alias("n_false_reject"),
        F.count(F.when(~acc & ~ans, 1)).alias("n_true_reject"),
    ).select(
        "method",
        "n_samples",
        "n_accept",
        (
            F.col("n_accept").cast("double") / F.col("n_samples").cast("double")
        ).alias("accept_rate"),
        "n_true_accept",
        "n_false_accept",
        "n_false_reject",
        "n_true_reject",
    )


def human_eval_sheet(
    preds_by_method: dict[str, DataFrame],
    docs: DataFrame,
    n_docs: int = 50,
    cap_per_method: int = 2,
) -> DataFrame:
    """Human-eval annotation sheet export (write_human_eval.py:63-175):
    stratify each extraction method's predictions into one interleaved
    annotation sheet.

    Reference semantics, re-expressed deterministically:

    * only docs where EVERY method produced at least one pair qualify
      (the ``interset_ids`` intersection, :91-99);
    * ``n_docs`` of those are sampled — the reference random.shuffles the
      id list and slices ``[:abstract_count]`` (:99-112); here the ids
      are ranked by ``hash60('sheet|' + conv_id)`` so both engines and
      every run pick the same docs;
    * per (doc, method) at most ``cap_per_method`` rows survive — the
      reference shuffles each text group and caps per (text, method) at
      2 (:141-147); the pick order here is the hash of the row key (the
      deterministic shuffle), exposed as ``pick_ix`` so the sheet's
      interleave is reproducible. The reference's grouping unit is the
      prediction's sentence text; this corpus assembles one document
      text per conv, so the unit is the conv (documented mapping).

    Output: (method, arg0, arg1, conv_id, text, pick_ix) — the columns
    of the reference's ``human_annotations2.tsv`` header (:104) plus the
    interleave rank.

    Scale: the doc sample is the only global ordering and it runs on the
    kth_score_threshold survivor set (~n_docs rows + ties), never the
    doc dim; the cap window partitions by (conv_id, method); the text
    join is a conv_id equi-join.
    """
    capped = _sheet_rows(preds_by_method, n_docs, cap_per_method)
    return capped.join(
        docs.select("conv_id", F.col("doc_text").alias("text")), "conv_id"
    ).select("method", "arg0", "arg1", "conv_id", "text", "pick_ix")


def _sheet_rows(
    preds_by_method: dict[str, DataFrame], n_docs: int, cap_per_method: int
) -> DataFrame:
    """The sheet's sampled + interleave-capped prediction rows (shared by
    :func:`human_eval_sheet` and :func:`human_eval_scores`):
    (method, conv_id, arg0, arg1, pick_ix)."""
    from dygiepp_spark.functions.hashing import hash60
    from dygiepp_spark.operators.pruning import kth_score_threshold

    u = _method_union(preds_by_method)
    common = (
        u.groupBy("conv_id")
        .agg(F.count_distinct("method").alias("_nm"))
        .filter(F.col("_nm") == len(preds_by_method))
        .select("conv_id")
    )
    hashed = common.withColumn(
        "_h", hash60(F.concat_ws("|", F.lit("sheet"), "conv_id"))
    ).withColumn("_s", -F.col("_h"))
    thr = kth_score_threshold(hashed, "_s", n_docs)
    surv = hashed.join(
        F.broadcast(thr), on=F.col("_s") >= F.col("_thr"), how="inner"
    )
    ws = Window.orderBy(F.col("_h").asc(), F.col("conv_id").asc())
    sampled = (
        surv.withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") <= n_docs)
        .select("conv_id")
    )
    rows = u.join(sampled, "conv_id", "left_semi")
    wp = Window.partitionBy("conv_id", "method").orderBy(
        hash60(F.concat_ws("|", "method", "arg0", "arg1")).asc(),
        F.col("arg0").asc(),
        F.col("arg1").asc(),
    )
    return rows.withColumn("pick_ix", F.row_number().over(wp)).filter(
        F.col("pick_ix") <= cap_per_method
    )


def _raw_toks(c: Column) -> Column:
    """The reference's bare ``.split()``: whitespace split, empties
    dropped, CASE-SENSITIVE (span_score's jaccard path does not lower,
    eval_utils.py:243-245)."""
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def _raw_jaccard(a: Column, b: Column) -> Column:
    """``jaccard_similarity`` (eval_utils.py:174-178): token-SET overlap
    of the raw splits, one IEEE double division. Union is floored at 1
    (module convention, see jaccard_ratio) so two whitespace-only spans
    score 0.0, not NULL from a 0/0."""
    ta, tb = F.array_distinct(_raw_toks(a)), F.array_distinct(_raw_toks(b))
    return F.size(F.array_intersect(ta, tb)).cast("double") / F.greatest(
        F.size(F.array_union(ta, tb)).cast("double"), F.lit(1.0)
    )


def human_eval_scores(
    preds_by_method: dict[str, DataFrame],
    gold: DataFrame,
    n_docs: int = 50,
    cap_per_method: int = 2,
) -> DataFrame:
    """The scores sheet ``write_human_eval`` emits alongside the
    annotation TSV (``human_annotations_scores2.tsv``,
    write_human_eval.py:104,148-160): for every sampled+capped prediction
    row, its per-argument similarity to every gold pair of the same doc
    (``get_relation_scores``, eval_utils.py:29-37), keeping (gold, pred)
    combinations where some metric scores BOTH arguments nonzero.

    Metrics mirror ``span_score`` (eval_utils.py:236-262): jaccard =
    token-set overlap of the RAW case-sensitive whitespace split;
    substring = raw case-sensitive containment 0/1. The reference's third
    column (rouge-L f) is omitted from this frame — for multi-token spans
    the LCS is not SQL-expressible bit-identically (the ie_eval rouge
    twin relies on its single-token degeneration) — but its effect on
    the KEEP-filter is reproduced exactly: rouge tokenizes
    case-INSENSITIVELY, so its f is nonzero iff the spans share a token
    after lowering, and the filter tests that overlap directly (raw
    jaccard alone would silently drop rows overlapping only
    case-insensitively). Production adds the rouge column back via the
    existing pandas-UDF ``rouge_l_f`` when the sheet is for humans, not
    the parity gate.

    Output: (method, conv_id, gold_arg0, gold_arg1, pred_arg0, pred_arg1,
    jac0, jac1, sub0, sub1).

    Scale: the capped sheet frame is ~n_docs * methods * cap rows; the
    gold join is a conv_id equi-join with per-doc products.
    """
    capped = _sheet_rows(preds_by_method, n_docs, cap_per_method)
    g = gold.select(
        "conv_id",
        F.col("arg0").alias("gold_arg0"),
        F.col("arg1").alias("gold_arg1"),
    ).distinct()
    scored = capped.join(g, "conv_id").select(
        "method",
        "conv_id",
        "gold_arg0",
        "gold_arg1",
        F.col("arg0").alias("pred_arg0"),
        F.col("arg1").alias("pred_arg1"),
        _raw_jaccard(F.col("gold_arg0"), F.col("arg0")).alias("jac0"),
        _raw_jaccard(F.col("gold_arg1"), F.col("arg1")).alias("jac1"),
        (
            F.col("gold_arg0").contains(F.col("arg0"))
            | F.col("arg0").contains(F.col("gold_arg0"))
        ).cast("int").alias("sub0"),
        (
            F.col("gold_arg1").contains(F.col("arg1"))
            | F.col("arg1").contains(F.col("gold_arg1"))
        ).cast("int").alias("sub1"),
    )
    # rouge's nonzero-ness stand-in: case-insensitive token overlap
    # (subsumes jac > 0, which is the case-sensitive overlap)
    def ci_overlap(x: Column, y: Column) -> Column:
        return F.arrays_overlap(
            F.array_distinct(_raw_toks(F.lower(x))),
            F.array_distinct(_raw_toks(F.lower(y))),
        )

    keep = (
        (
            ci_overlap(F.col("gold_arg0"), F.col("pred_arg0"))
            & ci_overlap(F.col("gold_arg1"), F.col("pred_arg1"))
        )
        | ((F.col("sub0") == 1) & (F.col("sub1") == 1))
    )
    return scored.filter(keep).distinct()


def grid_best_cell(grid: DataFrame) -> DataFrame:
    """Best-cell selection over the :func:`eval_grid` stats frame — the
    ``find_max_score`` consumer (eval_predictions_quality.py:29-63) lifted
    to the grid: per result ``kind``, the winning (metric x collapse /
    topk) configuration by score (f1 for rel/span cells, precision for
    P@K cells), ties broken to the lexicographically first cell.

    The grid is a driver-materialized ~21-row frame, so the single-
    partition window is free; the doubles it ranks are IEEE-identical in
    both engines (eval_grid's own parity pins them).
    """
    score = F.when(F.col("kind") == "p_at_k", F.col("precision")).otherwise(
        F.col("f1")
    )
    w = Window.partitionBy("kind").orderBy(
        score.desc(),
        F.col("metric").asc(),
        F.col("collapse").asc_nulls_first(),
        F.col("topk").asc_nulls_first(),
    )
    return (
        grid.withColumn("best_score", score)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("kind", "metric", "collapse", "topk", "best_score")
    )


#: the reference's annotator-agreement grid (annotation_metric.py:29-45):
#: substring at the nominal threshold, jaccard at 0.5 / 0.4 / 0.3, each
#: with and without label collapse
AGREEMENT_CELLS: tuple[tuple[str, bool, float], ...] = tuple(
    (metric, collapse, thresh)
    for metric in ("substring", "jaccard")
    for collapse in (False, True)
    for thresh in ((0.5,) if metric == "substring" else (0.5, 0.4, 0.3))
)


def agreement_report(
    preds_by_annotator: dict[str, DataFrame],
    gold: DataFrame,
    max_rounds: int = 64,
) -> DataFrame:
    """Annotator agreement report — ``annotation_eval``
    (eval_utils.py:567-617) swept over the (metric x collapse x threshold)
    grid of ``agreement_accuracy_calculation`` (annotation_metric.py:16-45)
    in ONE job.

    Per (annotator, cell): predictions and gold are greedily matched
    one-to-one (``seen_pred``/``seen_gold`` bookkeeping keyed on the
    label-FREE (doc, arg0, arg1) pairs, exactly the reference's seen keys)
    under the cell's span metric; label equality gates candidacy unless
    ``collapse``. accuracy = 2 * matched / common, where common counts
    gold rows whose sentence text occurs among the prediction texts plus
    prediction rows whose text occurs among the gold texts (:599-612),
    and is 0-guarded (:613-614).

    The sequential product-order greedy is re-expressed as the iterated
    local-minima greedy of :func:`greedy_match` (lexicographic candidate
    order — deterministic, engine-portable), fused across ALL cells: the
    candidate frame carries the cell key, every window/join partitions on
    it, so the loop runs once with rounds = the max conflict-chain depth
    over cells instead of once per cell. One fuzzy pred x gold join per
    annotator (built under the LOOSEST predicate; each cell filters it,
    the eval_grid trick); the loop's joins are all keyed on
    (cell, conv_id, span pair).

    Output: (annotator, metric, collapse, thresh, n_matched, n_common,
    accuracy), one row per annotator x cell.
    """
    spark = gold.sparkSession
    jmin = min(t for (_, _, t) in AGREEMENT_CELLS)
    cells = spark.createDataFrame(
        list(AGREEMENT_CELLS), "metric string, collapse boolean, thresh double"
    )

    g = (
        gold.select(
            "conv_id",
            F.col("arg0").alias("g_arg0"),
            F.col("arg1").alias("g_arg1"),
            F.col("label").alias("g_label"),
            F.col("sent_text").alias("g_text"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    g_texts = g.select(F.col("g_text").alias("t")).distinct()

    def jac(a: Column, b: Column) -> Column:
        ta = F.array_distinct(F.split(F.lower(F.trim(a)), " "))
        tb = F.array_distinct(F.split(F.lower(F.trim(b)), " "))
        inter = F.size(F.array_intersect(ta, tb)).cast("double")
        union = F.size(F.array_union(ta, tb)).cast("double")
        return inter / F.greatest(union, F.lit(1.0))

    cand_parts = []
    commons: list[tuple[str, int]] = []
    for name, pred in sorted(preds_by_annotator.items()):
        p = (
            pred.select(
                "conv_id",
                F.col("arg0").alias("p_arg0"),
                F.col("arg1").alias("p_arg1"),
                F.col("label").alias("p_label"),
                F.col("sent_text").alias("p_text"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        p_texts = p.select(F.col("p_text").alias("t")).distinct()
        n_gold_common = g.join(
            p_texts, g["g_text"] == p_texts["t"], "left_semi"
        ).count()
        n_pred_common = p.join(
            g_texts, p["p_text"] == g_texts["t"], "left_semi"
        ).count()
        commons.append((name, n_gold_common + n_pred_common))

        sub0 = match_substring(F.col("p_arg0"), F.col("g_arg0"))
        sub1 = match_substring(F.col("p_arg1"), F.col("g_arg1"))
        j0 = jac(F.col("p_arg0"), F.col("g_arg0"))
        j1 = jac(F.col("p_arg1"), F.col("g_arg1"))
        joined = p.join(
            g,
            on=[
                p["conv_id"] == g["conv_id"],
                (sub0 & sub1) | ((j0 >= jmin) & (j1 >= jmin)),
            ],
        ).select(
            F.lit(name).alias("annotator"),
            p["conv_id"].alias("conv_id"),
            "p_arg0", "p_arg1", "g_arg0", "g_arg1",
            (sub0 & sub1).alias("_sub"),
            j0.alias("_j0"),
            j1.alias("_j1"),
            (F.col("p_label") == F.col("g_label")).alias("_lab_eq"),
        )
        cell_cond = F.when(
            F.col("metric") == "substring", F.col("_sub")
        ).otherwise(
            (F.col("_j0") >= F.col("thresh")) & (F.col("_j1") >= F.col("thresh"))
        ) & (F.col("collapse") | F.col("_lab_eq"))
        cand_parts.append(
            joined.join(F.broadcast(cells), cell_cond)
            .select(
                "annotator", "metric", "collapse", "thresh",
                "conv_id", "p_arg0", "p_arg1", "g_arg0", "g_arg1",
            )
            .distinct()
        )

    cand = cand_parts[0]
    for c in cand_parts[1:]:
        cand = cand.unionByName(c)
    cand = cand.localCheckpoint(eager=True)

    cell_key = ["annotator", "metric", "collapse", "thresh"]
    pk = ["p_arg0", "p_arg1"]
    gk = ["g_arg0", "g_arg1"]
    w_pred = Window.partitionBy(*cell_key, "conv_id", *pk).orderBy(*gk)
    w_gold = Window.partitionBy(*cell_key, "conv_id", *gk).orderBy(*pk)
    matched = spark.createDataFrame([], cand.schema)
    for _ in range(max_rounds):
        accepted = (
            cand.withColumn("_rp", F.row_number().over(w_pred))
            .withColumn("_rg", F.row_number().over(w_gold))
            .filter((F.col("_rp") == 1) & (F.col("_rg") == 1))
            .drop("_rp", "_rg")
            .localCheckpoint(eager=True)
        )
        matched = matched.unionByName(accepted)
        cand = (
            cand.join(
                accepted.select(*cell_key, "conv_id", *pk),
                [*cell_key, "conv_id", *pk],
                "left_anti",
            )
            .join(
                accepted.select(*cell_key, "conv_id", *gk),
                [*cell_key, "conv_id", *gk],
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        if cand.limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"agreement_report: greedy matching did not converge in "
            f"{max_rounds} rounds"
        )

    spine = spark.createDataFrame(
        [(a,) for a, _ in commons], "annotator string"
    ).crossJoin(cells)
    common_df = spark.createDataFrame(
        commons, "annotator string, n_common bigint"
    )
    counts = matched.groupBy(*cell_key).agg(
        F.count(F.lit(1)).alias("_m")
    )
    acc = (
        F.lit(2.0) * F.col("n_matched").cast("double")
        / F.col("n_common").cast("double")
    )
    return (
        spine.join(counts, cell_key, "left")
        .join(common_df, "annotator")
        .select(
            *cell_key,
            F.coalesce(F.col("_m"), F.lit(0)).cast("bigint").alias("n_matched"),
            "n_common",
        )
        .withColumn(
            "accuracy",
            F.when(F.col("n_common") > 0, acc).otherwise(F.lit(0.0)),
        )
    )


def calibration_bins(pred: DataFrame, gold: DataFrame, bins: int = 10) -> DataFrame:
    """Confidence-calibration table for extracted triples — the
    reliability-diagram input behind threshold selection (the same
    question the reference's accept-rate-by-threshold analyses answer,
    eval_predictions_quality.py:103-178, asked of the extractor's own
    confidence): bin predictions by ``floor(conf * bins)`` (top edge
    folded into the last bin) and report per bin how many there are and
    how many hit gold exactly.

    Output: ``(bin, n_pred, n_correct, accuracy)``. Counts are BIGINT;
    the bin index is one IEEE double multiply + floor (identical in any
    engine); accuracy is a single exact-integer division — no float
    summation anywhere.

    Scale: one key-grouped max-conf dedup, one left join against the
    gold keys, one map-side-combinable rollup over at most ``bins``
    groups.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    keys = ["conv_id", "arg0", "arg1", "label"]
    p = pred.groupBy(*keys).agg(F.max("conf").alias("conf"))
    g = gold.select(*keys).distinct().withColumn("_hit", F.lit(1))
    j = p.join(g, keys, "left")
    b = F.least(
        F.floor(F.col("conf") * bins).cast("bigint"),
        F.lit(bins - 1).cast("bigint"),
    )
    return (
        j.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_pred"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "bin", "n_pred", "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_pred").cast("double")
            ).alias("accuracy"),
        )
    )
