import jax.numpy as jnp
import numpy as np

from saspa_tpu.fgvc.metrics import (
    AverageMeter,
    MeanClassAccuracy,
    TopKAccuracy,
    per_class_stats,
    topk_correct,
)


def test_topk_correct_hand_case():
    logits = jnp.asarray([
        [0.1, 0.9, 0.0, 0.0],  # pred 1, label 1 -> top1 hit
        [0.5, 0.4, 0.05, 0.05],  # pred 0, label 1 -> top1 miss, top2 hit
        [0.0, 0.1, 0.2, 0.7],  # pred 3, label 0 -> top1,2,3 miss; top4 hit
    ])
    labels = jnp.asarray([1, 1, 0])
    counts = np.asarray(topk_correct(logits, labels, ks=(1, 2)))
    assert counts.tolist() == [1, 2]


def test_topk_accumulator_percentages():
    acc = TopKAccuracy(ks=(1, 5))
    acc.update(np.array([1, 2]), batch_size=4)
    acc.update(np.array([3, 4]), batch_size=4)
    assert np.allclose(acc.value, [50.0, 75.0])


def test_per_class_stats_and_mean_class_acc():
    logits = jnp.asarray([
        [1.0, 0.0], [1.0, 0.0],  # both predicted class 0
        [0.0, 1.0],              # predicted class 1
    ])
    labels = jnp.asarray([0, 1, 1])
    corrects, counts = per_class_stats(logits, labels, 2)
    assert np.asarray(corrects).tolist() == [1, 1]  # class0: 1/1, class1: 1/2
    assert np.asarray(counts).tolist() == [1, 2]

    mca = MeanClassAccuracy(2)
    mca.update(np.asarray(corrects), np.asarray(counts))
    assert np.isclose(mca.value, (1.0 + 0.5) / 2 * 100)
    assert np.isclose(mca.total_accuracy(), 2 / 3)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.value == 3.0


def test_accuracy_per_class_and_plot(tmp_path):
    """Per-class accuracy vector + the samples-vs-accuracy scatter helper
    (reference fgvc/util.py:102-105,112-135)."""
    from saspa_tpu.fgvc.metrics import MeanClassAccuracy
    from saspa_tpu.fgvc.plots import plot_samples_per_class_vs_accuracy

    mca = MeanClassAccuracy(4)
    mca.update(np.array([2, 0, 1, 0]), np.array([2, 3, 2, 0]))
    per = mca.accuracy_per_class()
    np.testing.assert_allclose(per, [1.0, 0.0, 0.5, 0.0])

    fig = plot_samples_per_class_vs_accuracy(
        {0: 10, 1: 3, 2: 7, 3: 0}, dict(enumerate(per)), epoch=2,
        output_folder=str(tmp_path / "plots"),
    )
    assert fig is not None
    out = tmp_path / "plots" / "num_samples_per_class_vs_class_accuracy_epoch_2.png"
    assert out.exists() and out.stat().st_size > 0
