"""TPU learning demonstration: train the classifier on synthetic data and
show downstream cue / HSN quality rise far above the random-init baseline.

Recorded run (TPU v5e, 2026-08-16):
    trained classifier: mean val F1 0.787 (480 steps, 162s)
    TRAINED: cue mIoU 0.5628 | HSN mIoU 0.4353
    random : cue mIoU 0.0835 | HSN mIoU 0.0061

Run from the repo root: python examples/learning_demo.py
"""
import time, numpy as np, jax, jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)
from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.eval import metrics
from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods import hsn
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.models import build_classifier
from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.train.classifier import ClassifierTrainer

SIZE = 96
spec = registry.get('VOC2012')
train_ds = SyntheticWSSS('VOC2012', size=SIZE, n_images=256, seed=1)
val_ds = SyntheticWSSS('VOC2012', size=SIZE, n_images=64, seed=2)
norm = _normalizer(spec.norm_cues)

model = build_classifier('M7', spec.n_fg_classes)
tr = ClassifierTrainer(model, lr=0.02, schedule='const')
params, mstate, opt = tr.init(jax.random.PRNGKey(0), jnp.zeros((16, SIZE, SIZE, 3)))
step = jax.jit(tr.train_step)
t0 = time.time()
k = 0
for epoch in range(30):
    for b in train_ds.batches(16):
        params, mstate, opt, m = step(params, mstate, opt,
                                      jnp.asarray(norm(b.images)),
                                      jnp.asarray(b.tags), jax.random.PRNGKey(k))
        k += 1
    if epoch % 10 == 9:
        print('epoch %d loss %.4f f1 %.3f (%.0fs)' % (
            epoch, float(m['loss']), float(m['f1']), time.time() - t0), flush=True)

# calibrate on val
scores, tags = [], []
ev = jax.jit(lambda p, s, x: tr.eval_scores(p, s, x))
for b in val_ds.batches(16):
    scores.append(np.asarray(ev(params, mstate, jnp.asarray(norm(b.images)))))
    tags.append(b.tags)
scores, tags = np.concatenate(scores), np.concatenate(tags)
th = np.asarray(metrics.optimal_thresholds(tags, scores))
f1 = np.nanmean(metrics.thresholded_metrics(tags, scores, th)['f1'])
print('trained classifier: mean val F1 %.3f (%d steps, %.0fs)' % (f1, k, time.time()-t0), flush=True)

def downstream(handle, label):
    gen = gc.VOCDeepGlobeCueGenerator(
        spec, handle, _ClassifierHandle.random('M7', 20, SIZE, seed=7), thresh=0.2)
    cues = gen.run(val_ds.batches(16))
    _, cue_miou = gc.eval_cues_miou(cues, val_ds.batches(16, with_gt=True), 21)
    seg = hsn.HSNSegmenter(spec, handle,
                           _ClassifierHandle.random('M7', 20, SIZE, seed=7),
                           cfg=CRFConfig(1.5, 3, 6.0, 13, 10, iterations=5))
    conf = jnp.zeros((21, 21), jnp.int32)
    for b in val_ds.batches(16, with_gt=True):
        pred = seg.segment_batch(b.images)
        conf = conf + metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(b.gt), 21)
    _, hsn_miou = metrics.iou_from_confusion(conf)
    print('%s: cue mIoU %.4f | HSN mIoU %.4f' % (label, cue_miou, float(hsn_miou)), flush=True)

trained = _ClassifierHandle(model, {'params': params, **mstate}, th, SIZE)
downstream(trained, 'TRAINED')
downstream(_ClassifierHandle.random('M7', 20, SIZE, seed=3), 'random  ')
