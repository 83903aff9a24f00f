"""Golden ROC/AUC parity against the reference's committed auc_after.csv.

Reproduces the reference's engine-A 'after' evaluation (pipeline1.py:462-565)
from the committed feature cache and checks our evals.roc_curve/auc_score
against the committed per-class AUC rows (auc_after.csv:8-10) — proving the
whole chain (cache load, label encode, scaler, split, SVM, ROC) is
reference-compatible row-for-row.
"""

import csv

import numpy as np
import pytest

from tests.conftest import GOLDEN_AVAILABLE, REFERENCE


@pytest.mark.skipif(not GOLDEN_AVAILABLE, reason="reference golden data not mounted")
def test_golden_svm_after_auc_matches_committed_csv():
    pytest.importorskip("sklearn")
    from stutter_tpu import evals
    from stutter_tpu.data import load_cached_corpus
    from stutter_tpu.models.host_baselines import reference_model_zoo
    from stutter_tpu.models.scaler import LabelEncoder, StandardScaler
    from stutter_tpu.train.splits import stratified_train_test_split

    corpus = load_cached_corpus(root=str(REFERENCE), suffixes=("clean",))
    X, labels = corpus["X_clean"], corpus["labels"]
    assert corpus["missing_clean"] == 0 and X.shape == (905, 149)

    le = LabelEncoder.fit(labels)
    y = le.transform(labels)
    Xs = StandardScaler.fit(X).transform(X)
    tr, te = stratified_train_test_split(y, 0.2, seed=42)

    svm = reference_model_zoo("pipeline1", 42)["SVM"]
    svm.fit(Xs[tr], y[tr])
    proba = svm.predict_proba(Xs[te])

    committed = {}
    with open(REFERENCE / "output_results" / "auc_after.csv") as f:
        for row in csv.DictReader(f):
            if row["model"] == "SVM":
                committed[row["class"]] = float(row["auc"])
    assert len(committed) == 3

    for c, cls in enumerate(le.classes_):
        ours = evals.auc_score(np.asarray(y[te]) == c, proba[:, c])
        assert abs(ours - committed[cls]) < 1e-3, (cls, ours, committed[cls])
