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


class TrainMeter:
    """Step timing with ETA (mvit/utils/meters.py:110-127 equivalent)."""

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self.time = AverageMeter()
        self.step = 0

    def update(self, step_seconds: float):
        self.time.update(step_seconds)
        self.step += 1

    @property
    def eta_seconds(self) -> float:
        return self.time.avg * max(self.total_steps - self.step, 0)


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


def calc_recalls(s: np.ndarray) -> dict[str, float]:
    """Cross-modal recall@{1,5,10} from a square similarity matrix
    (reference: extras/mast_new/mast/utilities/util.py:9-67; rows = audio,
    columns = images/captions; the match for row i is column i)."""
    n = s.shape[0]
    assert s.shape == (n, n)
    a2i_rank_cols = np.argsort(-s, axis=0)[:10]  # top-10 rows per column
    i2a_rank_rows = np.argsort(-s, axis=1)[:, :10]  # top-10 cols per row
    out = {}
    a_found = np.full(n, -1)
    i_found = np.full(n, -1)
    for i in range(n):
        hits_a = np.where(i2a_rank_rows[i] == i)[0]
        hits_i = np.where(a2i_rank_cols[:, i] == i)[0]
        if hits_a.size:
            a_found[i] = hits_a[0]
        if hits_i.size:
            i_found[i] = hits_i[0]
    for k in (1, 5, 10):
        out[f"A_r{k}"] = float(np.mean((a_found >= 0) & (a_found < k)))
        out[f"I_r{k}"] = float(np.mean((i_found >= 0) & (i_found < k)))
    return out
