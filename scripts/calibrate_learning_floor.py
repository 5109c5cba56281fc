"""One-off calibration for tests/test_learning_floor.py: measure cue
mIoU (trained vs random) at candidate tiny configs on CPU, to pick
floors that are robustly separated yet fast enough for CI.

Run: JAX_PLATFORMS=cpu python scripts/calibrate_learning_floor.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.models import build_classifier
from wsss_tpu.train.classifier import ClassifierTrainer


def run(size, n_train, n_val, epochs, lr):
    t0 = time.time()
    spec = registry.get('VOC2012')
    train_ds = SyntheticWSSS('VOC2012', size=size, n_images=n_train, seed=1)
    val_ds = SyntheticWSSS('VOC2012', size=size, n_images=n_val, seed=2)
    norm = _normalizer(spec.norm_cues)
    model = build_classifier('M7', spec.n_fg_classes)
    tr = ClassifierTrainer(model, lr=lr, schedule='const')
    params, mstate, opt = tr.init(jax.random.PRNGKey(0),
                                  jnp.zeros((16, size, size, 3)))
    step = jax.jit(tr.train_step)
    k = 0
    for _ in range(epochs):
        for b in train_ds.batches(16):
            params, mstate, opt, m = step(params, mstate, opt,
                                          jnp.asarray(norm(b.images)),
                                          jnp.asarray(b.tags),
                                          jax.random.PRNGKey(k))
            k += 1
    t_train = time.time() - t0

    def cue_miou(handle):
        gen = gc.VOCDeepGlobeCueGenerator(
            spec, handle, _ClassifierHandle.random('M7', 20, size, seed=7),
            thresh=0.2)
        cues = gen.run(val_ds.batches(16))
        _, miou = gc.eval_cues_miou(cues, val_ds.batches(16, with_gt=True),
                                    21)
        return miou

    th = np.full((spec.n_fg_classes,), 0.5, np.float32)
    trained = _ClassifierHandle(model, {'params': params, **mstate},
                                th, size)
    m_tr = cue_miou(trained)
    m_rn = cue_miou(_ClassifierHandle.random('M7', 20, size, seed=3))
    print(f'size={size} n_train={n_train} epochs={epochs} steps={k} '
          f'lr={lr}: trained={m_tr:.4f} random={m_rn:.4f} '
          f'loss={float(m["loss"]):.4f} '
          f'(train {t_train:.0f}s, total {time.time()-t0:.0f}s)',
          flush=True)


if __name__ == '__main__':
    run(48, 64, 32, 8, 0.02)
    run(48, 64, 32, 16, 0.02)
