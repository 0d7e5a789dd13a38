"""Model evaluation metrics computed as streaming aggregations.

Counterpart of /root/reference/packages/vaex-ml/vaex/ml/metrics.py (482 LoC):
accuracy/precision/recall/f1/confusion-matrix/MAE/MSE/R² over expression
pairs — each metric is one fused aggregation pass on the TPU, never
materializing predictions.
"""

from __future__ import annotations

import numpy as np


def _strs(df, a, b):
    from ..dataframe import _ensure_string_expression
    return _ensure_string_expression(a), _ensure_string_expression(b)


def accuracy_score(df, y_true, y_pred, selection=None):
    y_true, y_pred = _strs(df, y_true, y_pred)
    correct = df.sum(f"_astype(({y_true}) == ({y_pred}), 'int64')", selection=selection)
    total = df.count(y_true, selection=selection)
    return float(correct) / float(total)


def confusion_matrix(df, y_true, y_pred, selection=None, array_type=None):
    """Binned 2-D count grid over (true, predicted) codes."""
    y_true, y_pred = _strs(df, y_true, y_pred)
    labels = sorted(set(df.unique(y_true)) | set(df.unique(y_pred)), key=str)
    n = len(labels)
    if all(isinstance(l, (int, np.integer)) for l in labels) and labels == list(range(n)):
        counts = df.count(binby=[y_true, y_pred], limits=[[0, n], [0, n]], shape=n, selection=selection)
        return np.asarray(counts, dtype=np.int64)
    matrix = np.zeros((n, n), dtype=np.int64)
    for i, lt in enumerate(labels):
        for j, lp in enumerate(labels):
            sel = f"(({y_true}) == {lt!r}) & (({y_pred}) == {lp!r})"
            matrix[i, j] = int(df.count(selection=sel if selection is None else f"({sel}) & ({df._selection_expression(selection)})"))
    return matrix


def _binary_counts(df, y_true, y_pred, selection=None):
    y_true, y_pred = _strs(df, y_true, y_pred)
    tp = df.count(selection=f"(({y_true}) != 0) & (({y_pred}) != 0)", delay=True)
    fp = df.count(selection=f"(({y_true}) == 0) & (({y_pred}) != 0)", delay=True)
    fn = df.count(selection=f"(({y_true}) != 0) & (({y_pred}) == 0)", delay=True)
    df.execute()
    return float(tp.get()), float(fp.get()), float(fn.get())


def precision_score(df, y_true, y_pred, selection=None, average="binary"):
    if average == "binary":
        tp, fp, fn = _binary_counts(df, y_true, y_pred, selection)
        return tp / (tp + fp) if (tp + fp) else 0.0
    return precision_recall_f1_score(df, y_true, y_pred, selection=selection, average=average)[0]


def recall_score(df, y_true, y_pred, selection=None, average="binary"):
    if average == "binary":
        tp, fp, fn = _binary_counts(df, y_true, y_pred, selection)
        return tp / (tp + fn) if (tp + fn) else 0.0
    return precision_recall_f1_score(df, y_true, y_pred, selection=selection, average=average)[1]


def f1_score(df, y_true, y_pred, selection=None, average="binary"):
    if average == "binary":
        p = precision_score(df, y_true, y_pred, selection)
        r = recall_score(df, y_true, y_pred, selection)
        return 2 * p * r / (p + r) if (p + r) else 0.0
    return precision_recall_f1_score(df, y_true, y_pred, selection=selection, average=average)[2]


def precision_recall_f1_score(df, y_true, y_pred, selection=None, average="macro"):
    matrix = confusion_matrix(df, y_true, y_pred, selection=selection).astype(np.float64)
    tp = np.diag(matrix)
    fp = matrix.sum(axis=0) - tp
    fn = matrix.sum(axis=1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0)
        recall = np.where(tp + fn > 0, tp / (tp + fn), 0)
        f1 = np.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0)
    if average == "macro":
        return float(precision.mean()), float(recall.mean()), float(f1.mean())
    weights = matrix.sum(axis=1) / matrix.sum()
    return (float((precision * weights).sum()), float((recall * weights).sum()), float((f1 * weights).sum()))


def matthews_correlation_coefficient(df, y_true, y_pred, selection=None):
    tp, fp, fn = _binary_counts(df, y_true, y_pred, selection)
    total = float(df.count(selection=selection if selection else None))
    tn = total - tp - fp - fn
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return ((tp * tn) - (fp * fn)) / denom if denom else 0.0


def mean_absolute_error(df, y_true, y_pred, selection=None):
    y_true, y_pred = _strs(df, y_true, y_pred)
    return float(df.mean(f"abs(({y_true}) - ({y_pred}))", selection=selection))


def mean_squared_error(df, y_true, y_pred, selection=None):
    y_true, y_pred = _strs(df, y_true, y_pred)
    return float(df.mean(f"(({y_true}) - ({y_pred}))**2", selection=selection))


def r2_score(df, y_true, y_pred, selection=None):
    y_true, y_pred = _strs(df, y_true, y_pred)
    ss_res = float(df.sum(f"(({y_true}) - ({y_pred}))**2", selection=selection))
    mean_true = float(df.mean(y_true, selection=selection))
    ss_tot = float(df.sum(f"(({y_true}) - {mean_true!r})**2", selection=selection))
    return 1 - ss_res / ss_tot if ss_tot else 0.0
