"""Meters + evaluation metrics.

Covers the reference's metric/observability surface (SURVEY.md §5):
AverageMeter / Metric accuracy accumulator (src/utils/utils.py:239-273),
mAP / AUC / d-prime (extras/mast_new/mast/utilities/stats.py:11-60), and
NMI via sklearn where available.
"""
from __future__ import annotations

import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Accuracy:
    """Streaming accuracy over boolean prediction-correctness arrays
    (the reference's `Metric`)."""

    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, correct_mask: np.ndarray):
        self.correct += int(np.sum(correct_mask))
        self.total += int(np.size(correct_mask))

    @property
    def avg(self) -> float:
        return self.correct / max(self.total, 1)


def accuracy_topk(logits: np.ndarray, labels: np.ndarray, ks=(1,)) -> list[float]:
    order = np.argsort(-logits, axis=1)
    out = []
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out.append(float(hit.mean()))
    return out


def mean_average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """Macro mAP over classes (multi-label), average_precision per class."""
    aps = []
    for c in range(targets.shape[1]):
        t = targets[:, c]
        if t.sum() == 0:
            continue
        order = np.argsort(-scores[:, c])
        t_sorted = t[order]
        cum_pos = np.cumsum(t_sorted)
        precision = cum_pos / (np.arange(len(t_sorted)) + 1)
        aps.append(float((precision * t_sorted).sum() / t_sorted.sum()))
    return float(np.mean(aps)) if aps else 0.0


def auc_roc(scores: np.ndarray, targets: np.ndarray) -> float:
    """Macro ROC-AUC over classes (rank statistic form)."""
    aucs = []
    for c in range(targets.shape[1]):
        t = targets[:, c]
        pos, neg = t.sum(), (1 - t).sum()
        if pos == 0 or neg == 0:
            continue
        ranks = scores[:, c].argsort().argsort().astype(np.float64) + 1
        auc = (ranks[t > 0].sum() - pos * (pos + 1) / 2) / (pos * neg)
        aucs.append(float(auc))
    return float(np.mean(aucs)) if aucs else 0.0


def d_prime(auc: float) -> float:
    """d' from AUC (stats.py:55-60)."""
    from scipy.stats import norm

    return float(norm.ppf(auc) * np.sqrt(2.0))


def nmi(labels_a: np.ndarray, labels_b: np.ndarray) -> float:
    from sklearn.metrics import normalized_mutual_info_score

    return float(normalized_mutual_info_score(labels_a, labels_b))
