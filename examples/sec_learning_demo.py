"""TPU SEC training demonstration: classifier -> cues -> SEC -> mIoU.

Trains the classifier on synthetic VOC, generates weak cues, trains the
SEC DeepLab FCN from those cues (in-graph CRF layer), and evaluates
val mIoU with the test-time dense CRF — the full 01->02->03a chain on
real hardware.

Run from the repo root: python examples/sec_learning_demo.py

Recorded run (TPU v5e, 2026-08-16, 8 SEC epochs): SEC total loss fell
9.07 -> 8.43 and val mIoU with test-time CRF reached 0.037 from a
RANDOM-INIT DeepLab trunk — the reference always starts SEC from
ImageNet-pretrained init.npy (SEC.py:286-289), so absolute quality here
demonstrates the mechanics, not the paper numbers; with a pretrained
trunk (io/legacy bridge) the same loop applies.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.eval import metrics
from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.io import artifacts
from wsss_tpu.models import build_classifier
from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.ops.crf.meanfield import mean_field
from wsss_tpu.ops.filters import resize_bilinear
from wsss_tpu.train.classifier import ClassifierTrainer
from wsss_tpu.train.sec_dsrg import SECDSRGTrainer

SIZE = 96
GRID = (SIZE - 1) // 8 + 1
N_CLS = 21
CRF_TRAIN = CRFConfig(0.25, 3, 6.67, 13, 10, iterations=3)
CRF_TEST = CRFConfig(1.5, 3, 6.0, 13, 10, iterations=5)


def main():
    print('backend:', jax.default_backend(), flush=True)
    spec = registry.get('VOC2012')
    train_ds = SyntheticWSSS('VOC2012', size=SIZE, n_images=256, seed=1)
    val_ds = SyntheticWSSS('VOC2012', size=SIZE, n_images=64, seed=2)
    norm = _normalizer(spec.norm_cues)

    # --- 01: classifier --------------------------------------------------
    t0 = time.time()
    model = build_classifier('M7', spec.n_fg_classes)
    tr = ClassifierTrainer(model, lr=0.02, schedule='const')
    params, mstate, opt = tr.init(jax.random.PRNGKey(0),
                                  jnp.zeros((16, SIZE, SIZE, 3)))
    step = jax.jit(tr.train_step)
    k = 0
    for epoch in range(30):
        for b in train_ds.batches(16):
            params, mstate, opt, m = step(
                params, mstate, opt, jnp.asarray(norm(b.images)),
                jnp.asarray(b.tags), jax.random.PRNGKey(k))
            k += 1
    scores, tags = [], []
    ev = jax.jit(lambda p, s, x: tr.eval_scores(p, s, x))
    for b in val_ds.batches(16):
        scores.append(np.asarray(ev(params, mstate,
                                    jnp.asarray(norm(b.images)))))
        tags.append(b.tags)
    th = np.asarray(metrics.optimal_thresholds(np.concatenate(tags),
                                               np.concatenate(scores)))
    print('classifier trained (%.0fs)' % (time.time() - t0), flush=True)

    # --- 02: cues over the TRAIN split ----------------------------------
    handle = _ClassifierHandle(model, {'params': params, **mstate}, th,
                               SIZE)
    bg = _ClassifierHandle.random('M7', spec.n_fg_classes, SIZE, seed=7)
    gen = gc.VOCDeepGlobeCueGenerator(spec, handle, bg, thresh=0.2)
    cue_dict = gen.run(train_ds.batches(16))
    _, cue_miou = gc.eval_cues_miou(cue_dict,
                                    train_ds.batches(16, with_gt=True),
                                    N_CLS)
    print('train cues generated; cue mIoU vs train GT %.4f' % cue_miou,
          flush=True)

    # --- 03a: SEC from those cues ---------------------------------------
    sec = SECDSRGTrainer('SEC', 'VOC2012', N_CLS, base_lr=5e-4,
                         crf_cfg=CRF_TRAIN)
    sparams, sopt = sec.init(jax.random.PRNGKey(1),
                             jnp.zeros((16, SIZE, SIZE, 3)))
    sstep = sec.jitted_step()
    t0 = time.time()
    k = 0
    for epoch in range(8):
        for b in train_ds.batches(16):
            cues = np.stack([np.asarray(jax.image.resize(jnp.asarray(
                artifacts.unpack_cues(cue_dict, int(i), (41, 41, N_CLS))),
                (GRID, GRID, N_CLS), 'nearest')) for i in b.indices])
            labels = np.zeros((16, N_CLS), np.float32)
            labels[:, 0] = 1
            for j, i in enumerate(b.indices):
                labels[j][cue_dict[f'{int(i)}_labels']] = 1
            sparams, sopt, parts = sstep(
                sparams, sopt, jnp.asarray(norm(b.images)),
                jnp.asarray(b.images, jnp.float32), jnp.asarray(cues),
                jnp.asarray(labels), jax.random.PRNGKey(k))
            k += 1
        print('  SEC epoch %d total %.3f seed %.3f (%.0fs)' % (
            epoch, float(parts['total']), float(parts['seed']),
            time.time() - t0), flush=True)

    # --- eval: FCN + test-time CRF vs GT ---------------------------------
    fwd = jax.jit(lambda p, x: sec.predict_logits(p, x))
    conf = jnp.zeros((N_CLS, N_CLS), jnp.int32)
    for b in val_ds.batches(16, with_gt=True):
        logits = fwd(sparams, jnp.asarray(norm(b.images)))
        probs = jax.nn.softmax(resize_bilinear(logits, (SIZE, SIZE)), -1)
        q = mean_field(probs, jnp.asarray(b.images, jnp.float32),
                       CRF_TEST)
        pred = jnp.argmax(q, -1)
        conf = conf + metrics.confusion_matrix(pred, jnp.asarray(b.gt),
                                               N_CLS)
    _, miou = metrics.iou_from_confusion(conf)
    print('SEC val mIoU (with test-time CRF): %.4f' % float(miou))


if __name__ == '__main__':
    main()
