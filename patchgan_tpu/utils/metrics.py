"""Segmentation quality metrics (IoU, Dice, boundary F1).

The reference computes no quality metrics at all; the driver's north
star requires "equal IoU" (BASELINE.json), so the framework provides
them: per-class intersection-over-union, Dice, and boundary-F1 over
one-hot or probability masks, batch-meaned, as pure-jnp functions
usable inside jit and in the Trainer's validation loop.
"""

import jax
import jax.numpy as jnp


def _harden(y_pred, threshold):
    """Probabilities -> {0,1} per-class masks: arg-maxed over channels
    when C > 1, binarised at ``threshold`` when C == 1 (mirroring the
    inference postprocessing, reference infer.py:61-68)."""
    c = y_pred.shape[-1]
    if c > 1:
        return jnp.equal(
            jnp.argmax(y_pred, axis=-1)[..., None],
            jnp.arange(c)[None, None, None, :]).astype(jnp.float32)
    return (y_pred >= threshold).astype(jnp.float32)


def iou(y_true, y_pred, threshold=0.5, eps=1e-7):
    """Per-class IoU, averaged over classes and batch.

    y_true: (N, H, W, C) one-hot ground truth.
    y_pred: (N, H, W, C) probabilities (see _harden).
    Returns a scalar mean IoU (classes absent from both prediction and
    truth are excluded from the mean).
    """
    y_true = y_true.astype(jnp.float32)
    hard = _harden(y_pred, threshold)

    inter = jnp.sum(hard * y_true, axis=(1, 2))          # (N, C)
    union = jnp.sum(hard, axis=(1, 2)) + jnp.sum(y_true, axis=(1, 2)) \
        - inter
    per_class = inter / (union + eps)
    # classes with empty union are perfect by convention -> exclude
    present = (union > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(per_class * present) / denom


def dice(y_true, y_pred, threshold=0.5, eps=1e-7):
    """Per-class Dice coefficient 2|A∩B|/(|A|+|B|), averaged over
    classes and batch with the same present-class convention as iou().
    Related to IoU by d = 2i/(1+i) per class."""
    y_true = y_true.astype(jnp.float32)
    hard = _harden(y_pred, threshold)

    inter = jnp.sum(hard * y_true, axis=(1, 2))          # (N, C)
    size_sum = jnp.sum(hard, axis=(1, 2)) + jnp.sum(y_true, axis=(1, 2))
    per_class = 2.0 * inter / (size_sum + eps)
    present = (size_sum > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(per_class * present) / denom


def _erode(m):
    """3x3 binary erosion of (N, H, W, C) {0,1} masks; edge padding so
    pixels on the image border are not automatically boundary."""
    p = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    return jax.lax.reduce_window(
        p, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 1, 1, 1), 'VALID')


def _dilate(m, radius):
    """(2r+1)-square binary dilation (zero padding)."""
    if radius <= 0:
        return m
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), 'SAME')


def boundary_f1(y_true, y_pred, threshold=0.5, tolerance=2, eps=1e-7):
    """Boundary F1 (BF) score: how well predicted mask contours align
    with ground-truth contours within ``tolerance`` pixels.

    Boundaries are mask minus its 3x3 erosion; precision counts
    predicted-boundary pixels within ``tolerance`` of a true boundary
    (via dilation), recall symmetrically; F1 is their harmonic mean,
    averaged over (class, sample) pairs where either boundary is
    non-empty. Complements area metrics (IoU/Dice), which are
    insensitive to contour misplacement on large regions.
    """
    y_true = y_true.astype(jnp.float32)
    hard = _harden(y_pred, threshold)

    tb = y_true - _erode(y_true)                         # true boundary
    pb = hard - _erode(hard)                             # pred boundary
    n_pb = jnp.sum(pb, axis=(1, 2))                      # (N, C)
    n_tb = jnp.sum(tb, axis=(1, 2))
    prec = jnp.sum(pb * _dilate(tb, tolerance), axis=(1, 2)) / \
        (n_pb + eps)
    rec = jnp.sum(tb * _dilate(pb, tolerance), axis=(1, 2)) / \
        (n_tb + eps)
    f1 = 2.0 * prec * rec / (prec + rec + eps)
    present = ((n_pb + n_tb) > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(f1 * present) / denom


def confusion_matrix(true_labels, pred_labels, n_classes):
    """(..., ) integer label maps -> (n_classes, n_classes) confusion
    counts (rows = truth, cols = prediction)."""
    t = true_labels.reshape(-1).astype(jnp.int32)
    p = pred_labels.reshape(-1).astype(jnp.int32)
    idx = t * n_classes + p
    counts = jnp.bincount(idx, length=n_classes * n_classes)
    return counts.reshape(n_classes, n_classes)


def iou_from_confusion(cm, eps=1e-7):
    """Per-class IoU vector from a confusion matrix."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    return tp / (tp + fp + fn + eps)
