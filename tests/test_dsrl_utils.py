"""DSRL training-utility parity tests
(`/root/reference/model/modeling/DSRL/utils/{calculate_weights,loss,
lr_scheduler,metrics}.py`), with torch as the loss oracle."""
import math

import numpy as np
import pytest

from csbsr_tpu.utils.dsrl_utils import (
    Evaluator,
    SegmentationLosses,
    class_balance_weights,
    confusion_matrix,
    dsrl_lr_schedule,
    head_lr_transform,
    label_counts,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def test_class_balance_weights_formula():
    counts = np.array([900.0, 90.0, 10.0])
    w = np.asarray(class_balance_weights(counts))
    freq = counts / counts.sum()
    np.testing.assert_allclose(w, 1.0 / np.log(1.02 + freq), rtol=1e-6)


def test_label_counts_ignores_out_of_range():
    lab = np.array([[0, 1, 2, 255], [1, 1, -1, 0]])
    c = np.asarray(label_counts(lab, 3))
    np.testing.assert_array_equal(c, [2, 3, 1])


@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_matches_torch(weighted):
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(0)
    logits = r.randn(2, 5, 5, 4).astype(np.float32)
    target = r.randint(0, 4, size=(2, 5, 5))
    target[0, 0, :2] = 255  # ignored
    w = np.array([1.0, 2.0, 0.5, 1.5], np.float32) if weighted else None

    crit = torch.nn.CrossEntropyLoss(
        weight=None if w is None else torch.tensor(w), ignore_index=255)
    expected = crit(torch.tensor(logits).permute(0, 3, 1, 2),
                    torch.tensor(target).long()).item() / 2  # batch_average

    got = SegmentationLosses(weight=w).build_loss("ce")(logits, target)
    assert abs(float(got) - expected) < 1e-5


def test_focal_matches_reference_formula():
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(1)
    logits = r.randn(2, 4, 4, 3).astype(np.float32)
    target = r.randint(0, 3, size=(2, 4, 4))

    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    logpt = -crit(torch.tensor(logits).permute(0, 3, 1, 2),
                  torch.tensor(target).long()).item()
    pt = math.exp(logpt)
    expected = -((1 - pt) ** 2) * (0.5 * logpt) / 2

    got = SegmentationLosses().build_loss("focal")(logits, target)
    assert abs(float(got) - expected) < 1e-5


def test_lr_schedule_modes():
    ipe, epochs, base = 10, 4, 0.1
    n = ipe * epochs
    cos = dsrl_lr_schedule("cos", base, epochs, ipe)
    assert abs(float(cos(0)) - base) < 1e-7
    assert abs(float(cos(n // 2)) - 0.5 * base) < 1e-7
    poly = dsrl_lr_schedule("poly", base, epochs, ipe)
    assert abs(float(poly(10)) - base * (1 - 10 / n) ** 0.9) < 1e-7
    step = dsrl_lr_schedule("step", base, epochs, ipe, lr_step=2)
    assert abs(float(step(0)) - base) < 1e-6
    assert abs(float(step(2 * ipe)) - base * 0.1) < 1e-6
    warm = dsrl_lr_schedule("poly", base, epochs, ipe, warmup_epochs=1)
    assert abs(float(warm(5)) - float(poly(5)) * 0.5) < 1e-7
    with pytest.raises(ValueError):
        dsrl_lr_schedule("step", base, epochs, ipe)


def test_head_lr_transform_10x():
    import jax.numpy as jnp
    import optax

    params = {"backbone": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    grads = {"backbone": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    tx = head_lr_transform(lambda s: 0.1, head_fn=lambda p: p[0] == "head",
                           momentum=0.0)
    state = tx.init(params)
    upd, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(upd["backbone"]["w"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["head"]["w"]), -1.0, rtol=1e-6)


def test_confusion_matrix_and_scores():
    gt = np.array([[0, 0, 1, 1, 2, 255]])
    pred = np.array([[0, 1, 1, 1, 0, 2]])
    cm = np.asarray(confusion_matrix(gt, pred, 3))
    np.testing.assert_array_equal(cm, [[1, 1, 0], [0, 2, 0], [1, 0, 0]])

    ev = Evaluator(3)
    ev.add_batch(gt, pred)
    ev.add_batch(gt, pred)
    assert abs(ev.pixel_accuracy() - 3 / 5) < 1e-9
    # per-class acc: 1/2, 2/2, 0/1 -> mean 1/2
    assert abs(ev.pixel_accuracy_class() - 0.5) < 1e-9
    # IoU: 1/3, 2/3, 0/1 -> mIoU 1/3
    assert abs(ev.mean_iou() - 1 / 3) < 1e-9
    freq = np.array([2, 2, 1]) / 5
    fw = (freq * np.array([1 / 3, 2 / 3, 0])).sum()
    assert abs(ev.fw_iou() - fw) < 1e-9
    ev.reset()
    assert ev.matrix.sum() == 0
