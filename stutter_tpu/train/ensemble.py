"""Weighted soft-vote stacking over out-of-fold probabilities.

The reference's soft-vote Ensemble (sklearn VotingClassifier, ref
main.py:905-913) weights its members uniformly and UNDERPERFORMS its best
single model (65.3 vs 67.4 % CV).  Weighting fixes that: a coarse simplex
search over member weights, fit per held-out fold on the OTHER folds' OOF
predictions only (nested protocol — no weight is ever fit on the fold it
scores), lifts the TPU head trio (mixup CNN + CNN-BiLSTM + MLP) to 74.0 %
5-fold CV on the reference corpus (uniform: 73.5; best single: 70.5 —
measured, docs/experiments_r2_stack.json).
"""

from __future__ import annotations

import itertools

import numpy as np


def _simplex_grid(n: int, step: float) -> list[tuple[float, ...]]:
    """All weight vectors on the n-simplex with coordinates in step multiples."""
    k = round(1.0 / step)
    return [
        tuple(c / k for c in comb)
        for comb in itertools.product(range(k + 1), repeat=n)
        if sum(comb) == k
    ]


def nested_weighted_vote(
    probas: dict[str, np.ndarray],
    y: np.ndarray,
    folds: list[tuple[np.ndarray, np.ndarray]],
    step: float = 0.05,
) -> tuple[np.ndarray, np.ndarray, list[dict]]:
    """OOF probabilities per member [N, C] -> nested weighted-vote predictions.

    For each fold f, the member weights are chosen to maximize accuracy on
    the OOF predictions of all OTHER folds, then applied to fold f's rows.
    Returns (y_pred [N], y_proba [N, C] renormalized, per-fold weights).
    """
    names = sorted(probas)
    N = len(y)
    fold_of = np.full(N, -1, np.int32)
    for i, (_, te) in enumerate(folds):
        fold_of[te] = i
    if (fold_of < 0).any():
        raise ValueError("folds do not cover all rows")

    grid = _simplex_grid(len(names), step)
    stack = np.stack([probas[n] for n in names])  # [M, N, C]

    y_proba = np.zeros_like(stack[0])
    picked: list[dict] = []
    for f in range(len(folds)):
        fit = fold_of != f
        te = fold_of == f
        yf = y[fit]
        best, best_acc = None, -1.0
        for w in grid:
            p = np.tensordot(w, stack[:, fit], axes=1)
            acc = float((p.argmax(-1) == yf).mean())
            if acc > best_acc:
                best, best_acc = w, acc
        y_proba[te] = np.tensordot(best, stack[:, te], axes=1)
        picked.append({n: float(wi) for n, wi in zip(names, best)})
    y_proba /= np.maximum(y_proba.sum(-1, keepdims=True), 1e-12)
    return y_proba.argmax(-1), y_proba, picked
