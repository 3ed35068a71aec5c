import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from pmf_tpu.metrics import IOUEval, confusion_matrix, topk_accuracy, AccEval


def _np_conf(pred, gt, C):
    conf = np.zeros((C, C), dtype=np.int64)
    for p, g in zip(pred.ravel(), gt.ravel()):
        conf[p, g] += 1
    return conf


def test_confusion_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    C = 7
    pred = rng.integers(0, C, size=(3, 16, 16))
    gt = rng.integers(0, C, size=(3, 16, 16))
    conf = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), C))
    np.testing.assert_allclose(conf, _np_conf(pred, gt, C))


def test_confusion_matrix_valid_mask():
    rng = np.random.default_rng(1)
    C = 5
    pred = rng.integers(0, C, size=200)
    gt = rng.integers(0, C, size=200)
    valid = rng.random(200) > 0.3
    conf = np.asarray(confusion_matrix(
        jnp.asarray(pred), jnp.asarray(gt), C, jnp.asarray(valid)))
    np.testing.assert_allclose(conf, _np_conf(pred[valid], gt[valid], C))


def test_iou_eval_golden():
    # hand-computed case: 3 classes, ignore class 0
    ev = IOUEval(n_classes=3, ignore=[0])
    pred = np.array([1, 1, 2, 2, 1, 0])
    gt = np.array([1, 2, 2, 2, 1, 1])
    ev.addBatch(pred, gt)
    # after zeroing ignore row/col:
    # conf[1,1]=2, conf[1,2]=1, conf[2,2]=2 (conf[0,1]=1 zeroed)
    # class1: tp=2 fp=1 fn=0 -> iou=2/3 ; class2: tp=2 fp=0 fn=1 -> 2/3
    miou, iou = ev.getIoU()
    np.testing.assert_allclose(miou, 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(iou[1:], [2.0 / 3.0, 2.0 / 3.0], rtol=1e-6)
    macc, acc = ev.getAcc()
    np.testing.assert_allclose(acc[1], 2.0 / 3.0, rtol=1e-6)  # precision
    np.testing.assert_allclose(acc[2], 1.0, rtol=1e-6)
    mrec, rec = ev.getRecall()
    np.testing.assert_allclose(rec[1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(rec[2], 2.0 / 3.0, rtol=1e-6)


def test_iou_eval_accumulates():
    rng = np.random.default_rng(2)
    C = 4
    ev = IOUEval(n_classes=C, ignore=[0])
    all_p, all_g = [], []
    for _ in range(3):
        p = rng.integers(0, C, size=100)
        g = rng.integers(0, C, size=100)
        ev.addBatch(p, g)
        all_p.append(p)
        all_g.append(g)
    ev2 = IOUEval(n_classes=C, ignore=[0])
    ev2.addBatch(np.concatenate(all_p), np.concatenate(all_g))
    np.testing.assert_allclose(ev.getIoU()[0], ev2.getIoU()[0], rtol=1e-6)


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.05, 0.15], [0.2, 0.3, 0.5]])
    target = jnp.asarray([1, 2, 2])
    np.testing.assert_allclose(float(topk_accuracy(logits, target, 1)), 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(topk_accuracy(logits, target, 2)), 1.0, rtol=1e-6)

    ev = AccEval(topk=1)
    ev.addBatch(logits, target)
    ev.addBatch(logits, target)
    np.testing.assert_allclose(ev.getAcc(), 2.0 / 3.0)
