"""Schedules (the rebuilt clr_callback/PolyOptimizer semantics) and the
eval report writers."""
import csv
import os

import numpy as np
import jax.numpy as jnp

from wsss_tpu.eval import reports
from wsss_tpu.train import schedules


def test_cyclic_lr_triangular_wave():
    """Keras-CLR triangular semantics (missing clr_callback.CyclicLR,
    01_train/demo.py:90-110): base at cycle ends, max at half-cycle,
    linear in between."""
    sched = schedules.cyclic_lr(0.001, 0.006, step_size=100)
    tol = 1e-6
    assert abs(float(sched(0)) - 0.001) < tol
    assert abs(float(sched(100)) - 0.006) < tol
    assert abs(float(sched(200)) - 0.001) < tol
    assert abs(float(sched(50)) - 0.0035) < tol        # ascending mid
    assert abs(float(sched(150)) - 0.0035) < tol       # descending mid
    assert abs(float(sched(300)) - 0.006) < tol        # second cycle


def test_step_decay():
    """0.5x every 4 epochs (03a model.py:38-39,493)."""
    sched = schedules.step_decay(0.1, 0.5, 4)
    assert sched(0) == 0.1
    assert sched(3) == 0.1
    assert abs(sched(4) - 0.05) < 1e-12
    assert abs(sched(11) - 0.025) < 1e-12


def test_poly_decay():
    """lr * (1 - step/max)^0.9 (missing torchutils.PolyOptimizer,
    train_irn.py:87-90), clamped at max_step."""
    sched = schedules.poly_decay(0.1, 100)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    want = 0.1 * (1 - 0.5) ** 0.9
    assert abs(float(sched(50)) - want) < 1e-6
    assert float(sched(100)) == 0.0
    assert float(sched(150)) == 0.0                    # clamped


def test_sgd_nesterov_updates():
    tx = schedules.sgd_nesterov(0.1, weight_decay=1e-4)
    params = {'w': jnp.ones((3,))}
    state = tx.init(params)
    grads = {'w': jnp.ones((3,))}
    updates, _ = tx.update(grads, state, params)
    assert float(updates['w'][0]) < 0                  # descent direction


def test_iou_and_metrics_csv_roundtrip(tmp_path):
    names = ['bg', 'cat', 'dog']
    iou = np.array([0.9, 0.5, np.nan])
    p = str(tmp_path / 'run_iou.csv')
    miou = reports.write_iou_csv(p, names, iou,
                                 precision=np.array([1, .5, 0.]),
                                 recall=np.array([.9, .4, 0.]))
    assert abs(miou - 0.7) < 1e-9                      # nanmean
    rows = list(csv.reader(open(p)))
    assert rows[0] == ['class', 'iou', 'precision', 'recall']
    assert rows[1][0] == 'bg' and rows[1][1] == '0.90000'
    assert rows[-1][0] == 'miou'

    reports.write_metrics_csv(str(tmp_path / 'm.csv'), names,
                              {'tpr': np.array([1., .5, .2]),
                               'f1': np.array([.9, .4, .1])})
    rows = list(csv.reader(open(tmp_path / 'm.csv')))
    assert rows[0] == ['class', 'tpr', 'f1']
    assert rows[2] == ['cat', '0.50000', '0.40000']


def test_colorize_and_overlay():
    palette = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    labels = np.array([[0, 1], [1, 0]])
    color = reports.colorize(labels, palette)
    assert color.shape == (2, 2, 3)
    np.testing.assert_array_equal(color[0, 1], [255, 0, 0])
    img = np.full((2, 2, 3), 100, np.uint8)
    over = reports.overlay(img, color)
    assert over.shape == (2, 2, 3) and over.dtype == np.uint8


def test_plots_write_files(tmp_path):
    conf = np.array([[5, 1], [2, 8]])
    reports.confusion_heatmap(str(tmp_path / 'cm.png'), conf,
                              ['a', 'b'])
    assert (tmp_path / 'cm.png').stat().st_size > 0
    rng = np.random.default_rng(0)
    reports.plot_rocs(str(tmp_path / 'roc.png'),
                      (rng.random((50, 3)) > 0.5).astype(np.float32),
                      rng.random((50, 3)).astype(np.float32),
                      ['a', 'b', 'c'])
    assert (tmp_path / 'roc.png').stat().st_size > 0


def test_extract_eval_walks_tree(tmp_path):
    d = tmp_path / 'SEC' / 'runA'
    d.mkdir(parents=True)
    reports.write_iou_csv(str(d / 'val_iou.csv'), ['a', 'b'],
                          np.array([0.4, 0.6]))
    d2 = tmp_path / 'IRN' / 'runB'
    d2.mkdir(parents=True)
    reports.write_iou_csv(str(d2 / 'test_iou.csv'), ['a', 'b'],
                          np.array([0.2, 0.2]))
    rows = reports.extract_eval(str(tmp_path))
    assert len(rows) == 2
    by_run = {r['run']: float(r['miou']) for r in rows}
    assert abs(by_run[os.path.join('SEC', 'runA', 'val_iou.csv')]
               - 0.5) < 1e-6
