"""Segmentation metric tests (utils/metrics.py)."""

import numpy as np

from patchgan_tpu.utils.metrics import (boundary_f1, confusion_matrix,
                                        dice, iou, iou_from_confusion)


def test_binary_iou_perfect():
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, :4] = 1.0
    assert float(iou(y, y)) > 0.999


def test_binary_iou_half_overlap():
    y_true = np.zeros((1, 8, 8, 1), np.float32)
    y_true[0, :4] = 1.0          # top half
    y_pred = np.zeros((1, 8, 8, 1), np.float32)
    y_pred[0, 2:6] = 1.0         # middle half
    # intersection 2 rows, union 6 rows -> 1/3
    np.testing.assert_allclose(float(iou(y_true, y_pred)), 1 / 3,
                               atol=1e-5)


def test_multiclass_iou_argmax():
    # 2 classes, prediction probabilities argmax to the exact truth
    y_true = np.zeros((1, 4, 4, 2), np.float32)
    y_true[..., 0] = 1.0
    y_true[0, :2, :, 0] = 0.0
    y_true[0, :2, :, 1] = 1.0
    y_pred = np.where(y_true > 0, 0.9, 0.1).astype(np.float32)
    assert float(iou(y_true, y_pred)) > 0.999


def test_absent_class_excluded():
    # class 1 never appears in truth or prediction -> excluded from mean
    y_true = np.zeros((1, 4, 4, 1), np.float32)
    y_pred = np.zeros((1, 4, 4, 1), np.float32)
    # both empty: union 0 everywhere -> convention: no present classes
    v = float(iou(y_true, y_pred))
    assert np.isfinite(v)


def test_confusion_matrix_and_iou():
    t = np.array([0, 0, 1, 1, 2, 2])
    p = np.array([0, 1, 1, 1, 2, 0])
    cm = np.asarray(confusion_matrix(t, p, 3))
    assert cm[0, 0] == 1 and cm[0, 1] == 1
    assert cm[1, 1] == 2
    assert cm[2, 2] == 1 and cm[2, 0] == 1
    ious = np.asarray(iou_from_confusion(cm))
    # class 1: tp=2, fp=1, fn=0 -> 2/3
    np.testing.assert_allclose(ious[1], 2 / 3, atol=1e-5)


def test_dice_perfect_and_disjoint():
    a = np.zeros((1, 8, 8, 1), np.float32)
    a[0, :4] = 1.0
    b = np.zeros((1, 8, 8, 1), np.float32)
    b[0, 4:] = 1.0
    assert float(dice(a, a)) > 0.999
    assert float(dice(a, b)) < 1e-5


def test_dice_iou_relation():
    # per-class with one present class: d = 2i/(1+i)
    y_true = np.zeros((1, 8, 8, 1), np.float32)
    y_true[0, :4] = 1.0
    y_pred = np.zeros((1, 8, 8, 1), np.float32)
    y_pred[0, 2:6] = 1.0
    i = float(iou(y_true, y_pred))
    d = float(dice(y_true, y_pred))
    np.testing.assert_allclose(d, 2 * i / (1 + i), atol=1e-5)


def test_boundary_f1_perfect():
    y = np.zeros((1, 16, 16, 1), np.float32)
    y[0, 4:12, 4:12] = 1.0
    assert float(boundary_f1(y, y)) > 0.999


def test_boundary_f1_tolerance():
    # same square shifted by 2px: within the 2px tolerance -> F1 == 1;
    # with tolerance 0 only the two overlapping edges match partially
    y_true = np.zeros((1, 16, 16, 1), np.float32)
    y_true[0, 4:12, 4:12] = 1.0
    y_pred = np.zeros((1, 16, 16, 1), np.float32)
    y_pred[0, 6:14, 6:14] = 1.0
    assert float(boundary_f1(y_true, y_pred, tolerance=2)) > 0.999
    assert float(boundary_f1(y_true, y_pred, tolerance=0)) < 0.5


def test_boundary_f1_area_blind_case():
    # a big predicted blob whose contour is far off: IoU stays high but
    # boundary F1 punishes the contour displacement
    y_true = np.zeros((1, 32, 32, 1), np.float32)
    y_true[0, 4:28, 4:28] = 1.0             # 24x24 square
    y_pred = np.zeros((1, 32, 32, 1), np.float32)
    y_pred[0, 0:32, 0:32] = 1.0             # whole image
    assert float(iou(y_true, y_pred)) > 0.5
    assert float(boundary_f1(y_true, y_pred, tolerance=1)) < \
        float(iou(y_true, y_pred))


def test_boundary_f1_multiclass_jit():
    import jax
    y_true = np.zeros((2, 16, 16, 3), np.float32)
    y_true[..., 0] = 1.0
    y_true[:, 4:12, 4:12, 0] = 0.0
    y_true[:, 4:12, 4:12, 1] = 1.0
    y_pred = np.where(y_true > 0, 0.8, 0.1).astype(np.float32)
    v = float(jax.jit(boundary_f1)(y_true, y_pred))
    assert v > 0.999


def test_trainer_eval_iou(tmp_path, rng):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train import Trainer
    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=2, use_pallas=False)
    trainer = Trainer(gen, disc, str(tmp_path / 'ckpt'))
    trainer.compute_iou = True
    x = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(2, 128, 128, 1)) > 0.5).astype(np.float32)
    losses = trainer.batch(x, y, train=False)
    assert 'iou' in losses
    assert 0.0 <= losses['iou'] <= 1.0
    # reference keys still lead in order
    assert list(losses)[:6] == ['gen', 'gen_loss', 'gdisc', 'discr',
                                'discf', 'disc']
