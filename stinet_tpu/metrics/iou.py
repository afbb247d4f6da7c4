"""Confusion matrix and IoU metrics for semantic segmentation — parity with
/root/reference/utils/metrics/{confusionmatrix.py,iou.py,metrics_dcm.py}:
accumulated confusion matrix, per-class IoU with ignore_index, mean IoU,
precision and overall accuracy. The per-batch accumulation is a jit-friendly
bincount; the final reductions run on host."""
import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(predicted, target, num_classes, valid_mask=None):
    """[N] int predictions/targets -> [C, C] counts (rows = target, cols =
    predicted), jit-compatible."""
    idx = target * num_classes + predicted
    w = None if valid_mask is None else valid_mask.astype(jnp.float32)
    counts = jnp.zeros(num_classes * num_classes, jnp.float32)
    counts = counts.at[idx].add(1.0 if w is None else w, mode="drop")
    return counts.reshape(num_classes, num_classes)


class ConfusionMatrix:
    def __init__(self, num_classes, normalized=False):
        self.num_classes = num_classes
        self.normalized = normalized
        self.reset()

    def reset(self):
        self.conf = np.zeros((self.num_classes, self.num_classes),
                             dtype=np.float64)

    def add(self, predicted, target, valid_mask=None):
        self.conf += np.asarray(confusion_matrix_update(
            jnp.asarray(predicted), jnp.asarray(target), self.num_classes,
            None if valid_mask is None else jnp.asarray(valid_mask)))

    def add_matrix(self, conf):
        self.conf += np.asarray(conf, dtype=np.float64)

    def value(self):
        if self.normalized:
            rows = self.conf.sum(axis=1, keepdims=True)
            return self.conf / np.maximum(rows, 1e-12)
        return self.conf


class IoU:
    """IoU = TP / (TP + FP + FN) per class from the accumulated confusion
    matrix; `value()` returns (per_class_iou, mean_iou) with ignored classes
    set to NaN and excluded from the mean (reference iou.py:60-100)."""

    def __init__(self, num_classes, normalized=False, ignore_index=None):
        self.conf_metric = ConfusionMatrix(num_classes, normalized)
        if ignore_index is None:
            self.ignore_index = ()
        elif isinstance(ignore_index, int):
            self.ignore_index = (ignore_index,)
        else:
            self.ignore_index = tuple(ignore_index)

    def reset(self):
        self.conf_metric.reset()

    def add(self, predicted, target, valid_mask=None):
        self.conf_metric.add(predicted, target, valid_mask)

    def add_matrix(self, conf):
        self.conf_metric.add_matrix(conf)

    def value(self):
        conf = self.conf_metric.value().copy()
        for i in self.ignore_index:
            conf[:, i] = 0
            conf[i, :] = 0
        tp = np.diag(conf)
        fp = conf.sum(0) - tp
        fn = conf.sum(1) - tp
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = tp / (tp + fp + fn)
        for i in self.ignore_index:
            iou[i] = np.nan
        return iou, np.nanmean(iou)

    def precision(self):
        conf = self.conf_metric.value().copy()
        for i in self.ignore_index:
            conf[:, i] = 0
            conf[i, :] = 0
        tp = np.diag(conf)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = tp / conf.sum(0)
        for i in self.ignore_index:
            prec[i] = np.nan
        return prec, np.nanmean(prec)

    def overall_accuracy(self):
        conf = self.conf_metric.value().copy()
        for i in self.ignore_index:
            conf[:, i] = 0
            conf[i, :] = 0
        total = conf.sum()
        return float(np.diag(conf).sum() / max(total, 1e-12))
