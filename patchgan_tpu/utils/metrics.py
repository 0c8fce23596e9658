"""Segmentation quality metrics (IoU).

The reference computes no quality metrics at all; the driver's north
star requires "equal IoU" (BASELINE.json), so the framework provides
them: per-class intersection-over-union over one-hot or probability
masks, batch-meaned, as a pure-jnp function usable inside jit and in the
Trainer's validation loop.
"""

import jax.numpy as jnp


def iou(y_true, y_pred, threshold=0.5, eps=1e-7):
    """Per-class IoU, averaged over classes and batch.

    y_true: (N, H, W, C) one-hot ground truth.
    y_pred: (N, H, W, C) probabilities; binarised at ``threshold`` when
      C == 1, arg-maxed over channels when C > 1 (mirroring the
      inference postprocessing, infer.py:61-68).
    Returns a scalar mean IoU (classes absent from both prediction and
    truth are excluded from the mean).
    """
    y_true = y_true.astype(jnp.float32)
    c = y_pred.shape[-1]
    if c > 1:
        hard = jnp.equal(
            jnp.argmax(y_pred, axis=-1)[..., None],
            jnp.arange(c)[None, None, None, :]).astype(jnp.float32)
    else:
        hard = (y_pred >= threshold).astype(jnp.float32)

    inter = jnp.sum(hard * y_true, axis=(1, 2))          # (N, C)
    union = jnp.sum(hard, axis=(1, 2)) + jnp.sum(y_true, axis=(1, 2)) \
        - inter
    per_class = inter / (union + eps)
    # classes with empty union are perfect by convention -> exclude
    present = (union > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(per_class * present) / denom


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
