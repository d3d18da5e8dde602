"""Exact maximum-weight bipartite assignment (Kuhn–Munkres) for the
CEAF coreference metric (G5).

The reference scores coref with the CoNLL average of MUC, B³ and CEAF-φ4
(/root/reference/dygie/models/coref.py:15-16 imports allennlp's
``ConllCorefScores``, whose CEAF-e solves an optimal one-to-one alignment
of predicted to gold clusters under the φ4 similarity
``2·|p∩g| / (|p|+|g|)``).

This kernel runs PER CONVERSATION inside an ``applyInPandas`` group (the
cluster-count per document is small — bounded by the mention beam), so an
O(n³) driver-free exact algorithm is the right tool. Arithmetic is exact
rational (``fractions.Fraction``): float potentials could mis-rank two
assignments whose φ4 sums differ by less than an ulp, making the emitted
sufficient statistics nondeterministic across partitionings.

Implementation: the classic potentials formulation of the Hungarian
algorithm (minimization form over the negated weights, square-padded with
zeros so unmatched clusters cost nothing). Deterministic: ties are
resolved by the fixed column scan order.
"""

from __future__ import annotations

from fractions import Fraction


def max_weight_assignment(weights: list[list[Fraction]]) -> list[tuple[int, int]]:
    """Maximum-total-weight one-to-one assignment.

    ``weights[i][j]`` = weight of matching row ``i`` to column ``j``
    (any exact numeric; Fractions preserved). Returns the matched
    ``(row, col)`` pairs whose weight is strictly positive — zero-weight
    matches are equivalent to leaving both sides unmatched under CEAF.
    """
    n_rows = len(weights)
    n_cols = len(weights[0]) if n_rows else 0
    n = max(n_rows, n_cols)
    if n == 0:
        return []
    zero = Fraction(0)
    # square cost matrix, minimizing the negated weight; padding rows/cols
    # carry zero weight (an unmatched real row/col)
    a = [
        [
            -(weights[i][j]) if i < n_rows and j < n_cols else zero
            for j in range(n)
        ]
        for i in range(n)
    ]
    inf = None  # sentinel: "+infinity" in comparisons below

    u = [zero] * (n + 1)
    v = [zero] * (n + 1)
    p = [0] * (n + 1)   # p[j] = row matched to column j (1-indexed)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv: list = [inf] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, j1, delta = p[j0], -1, inf
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = a[i0 - 1][j - 1] - u[i0] - v[j]
                if minv[j] is None or cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if delta is None or (minv[j] is not None and minv[j] < delta):
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                elif minv[j] is not None:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    out = []
    for j in range(1, n + 1):
        i = p[j]
        if 1 <= i <= n_rows and 1 <= j <= n_cols and weights[i - 1][j - 1] > 0:
            out.append((i - 1, j - 1))
    return sorted(out)


def ceafe_phi4(n_pg: int, n_p: int, n_g: int) -> Fraction:
    """φ4 cluster similarity: 2·|p∩g| / (|p|+|g|) as an exact rational."""
    return Fraction(2 * n_pg, n_p + n_g)
