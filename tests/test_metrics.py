"""Metric parity: numpy reimplementations vs sklearn/statsmodels and the
reference's score.py formulas."""

import numpy as np
import pytest

from msa_tpu.metrics import (
    ACC7, accuracy_score, f1_score_weighted, mcnemar_test, misa_report,
    multiclass_acc, pearson_corr,
)
from msa_tpu.metrics import test_ce_score as ce_score
from msa_tpu.metrics import test_mse_score as mse_score

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    truth = np.clip(rng.normal(0, 1.5, 200), -3, 3)
    truth[rng.uniform(size=200) < 0.05] = 0.0
    preds = truth + rng.normal(0, 1.0, 200)
    return truth, preds


def test_accuracy_matches_sklearn(data):
    truth, preds = data
    yt = (truth > 0).astype(int)
    yp = (preds > 0).astype(int)
    assert accuracy_score(yt, yp) == pytest.approx(
        sklearn_metrics.accuracy_score(yt, yp))


def test_f1_weighted_matches_sklearn(data):
    truth, preds = data
    yt = (truth > 0).astype(int)
    yp = (preds > 0).astype(int)
    assert f1_score_weighted(yt, yp) == pytest.approx(
        sklearn_metrics.f1_score(yt, yp, average="weighted"))


def test_f1_weighted_multiclass_matches_sklearn():
    rng = np.random.default_rng(3)
    yt = rng.integers(0, 5, 300)
    yp = rng.integers(0, 5, 300)
    assert f1_score_weighted(yt, yp) == pytest.approx(
        sklearn_metrics.f1_score(yt, yp, average="weighted"))


def test_pearson_matches_numpy(data):
    truth, preds = data
    assert pearson_corr(preds, truth) == pytest.approx(
        np.corrcoef(preds, truth)[0][1])


def test_mcnemar_closed_form():
    """Pin mcnemar(exact=False) to its closed form -- statistic
    (|b-c|-1)^2/(b+c) with continuity correction, pvalue chi2.sf(stat, 1)
    = erfc(sqrt(stat/2)) -- so the check runs even on hosts without
    statsmodels (where the parity test below skips)."""
    import math

    for tf, ft in [(40, 25), (10, 10), (0, 7)]:
        ours = mcnemar_test(50, tf, ft, 60)
        stat = (abs(tf - ft) - 1) ** 2 / (tf + ft)
        assert ours["statistic"] == pytest.approx(stat, rel=1e-12)
        assert ours["pvalue"] == pytest.approx(
            math.erfc(math.sqrt(stat / 2.0)), rel=1e-9)


def test_mcnemar_matches_statsmodels(data):
    statsmodels = pytest.importorskip("statsmodels.stats.contingency_tables")
    truth, preds = data
    bt = truth > 0
    bp = preds > 0
    tt = int(np.sum(bp & bt)); ft = int(np.sum(bp & ~bt))
    tf = int(np.sum(~bp & bt)); ff = int(np.sum(~bp & ~bt))
    ref = statsmodels.mcnemar([[tt, tf], [ft, ff]], exact=False)
    ours = mcnemar_test(tt, tf, ft, ff)
    assert ours["statistic"] == pytest.approx(ref.statistic)
    assert ours["pvalue"] == pytest.approx(ref.pvalue, abs=1e-10)


def test_acc7_reference_bucketing():
    """Pin the reference's asymmetric buckets (score.py:7-42)."""
    vals = np.array([-2.5, -2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5])
    same = ACC7(vals.copy(), vals.copy())
    assert same == 1.0
    # -2 maps to bucket -2 but 2 maps to bucket 2; 1.0 -> 1 (0 < v <= 1)
    assert ACC7(np.array([1.0]), np.array([0.9])) == 1.0
    assert ACC7(np.array([-1.0]), np.array([-0.9])) == 1.0
    assert ACC7(np.array([0.0]), np.array([0.1])) == 0.0


def test_acc7_does_not_mutate_inputs():
    a = np.array([2.5, -2.5])
    b = np.array([2.5, -2.5])
    ACC7(a, b)
    assert list(a) == [2.5, -2.5]


def test_multiclass_acc():
    assert multiclass_acc(np.array([1.4, 2.6]), np.array([1.0, 3.0])) == 1.0


def test_classification_report_matches_sklearn(data):
    """Per-class precision/recall/F1/support + macro/weighted avgs match
    sklearn.classification_report(output_dict=True) (ref prints this table,
    score.py:109,118)."""
    from msa_tpu.metrics import classification_report_dict
    truth, preds = data
    for yt, yp in [
        ((truth > 0).astype(int), (preds > 0).astype(int)),
        ((truth >= 0).astype(int), (preds >= 0).astype(int)),
        # degenerate: predictions constant
        ((truth > 0).astype(int), np.ones(len(truth), int)),
    ]:
        ours = classification_report_dict(yt, yp)
        theirs = sklearn_metrics.classification_report(
            yt, yp, output_dict=True, zero_division=0)
        assert set(ours) == set(theirs)
        for key, row in theirs.items():
            if key == "accuracy":
                assert ours[key] == pytest.approx(row)
                continue
            for field in ("precision", "recall", "f1-score", "support"):
                assert ours[key][field] == pytest.approx(row[field]), \
                    (key, field)


def test_classification_report_in_misa(data, capsys):
    truth, preds = data
    rep = misa_report(truth, preds, verbose=True)
    printed = capsys.readouterr().out
    assert "Classification Report (pos/neg)" in printed
    assert "weighted avg" in printed
    for name in ("report_posneg", "report_nonneg"):
        table = rep[name]
        assert set(table) >= {"0", "1", "accuracy", "macro avg",
                              "weighted avg"}
    # the flat f1/acc2 fields agree with the nested table
    assert rep["f1_posneg"] == pytest.approx(
        rep["report_posneg"]["weighted avg"]["f1-score"])
    assert rep["acc2_posneg"] == pytest.approx(
        rep["report_posneg"]["accuracy"])


def test_misa_report_keys(data):
    truth, preds = data
    rep = misa_report(truth, preds)
    for k in ("mae", "corr", "mult_acc7", "acc7", "acc2_posneg", "f1_posneg",
              "acc2_nonneg", "f1_nonneg", "mcnemar_p"):
        assert k in rep
    assert 0 <= rep["acc2_posneg"] <= 1
    # accuracy symmetric: swap_binary must not change it
    rep2 = misa_report(truth, preds, swap_binary=True)
    assert rep["acc2_posneg"] == pytest.approx(rep2["acc2_posneg"])


def test_trainer_scorers(data):
    truth, preds = data
    acc, mae, f1 = mse_score(preds, truth)
    assert mae == pytest.approx(np.mean(np.abs(preds - truth)))
    assert acc == pytest.approx(
        sklearn_metrics.accuracy_score(truth >= 0, preds >= 0))
    yt = (truth > 0).astype(int)
    yp = (preds > 0).astype(int)
    acc_ce, _, f1_ce = ce_score(yp, yt)
    assert acc_ce == pytest.approx(sklearn_metrics.accuracy_score(yt, yp))
    assert f1_ce == pytest.approx(
        sklearn_metrics.f1_score(yt, yp, average="weighted"))
