"""Integration: the full WSSS chain on synthetic data, in memory.

train classifier -> calibrate -> generate cues -> SEC training steps ->
HSN segmentation -> IRNet (cam -> ir_label -> train -> random walk) ->
mIoU evals. Small shapes; asserts the data contracts between stages.
"""
import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.eval import metrics
from wsss_tpu.io import artifacts
from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods import hsn, irnet
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.models import build_classifier
from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.train.classifier import ClassifierTrainer
from wsss_tpu.train.sec_dsrg import SECDSRGTrainer

SIZE = 48
CFG = CRFConfig(1.0, 2, 3.0, 30, 4, iterations=2)


def test_full_chain():
    spec = registry.get('VOC2012')
    ds = SyntheticWSSS('VOC2012', size=SIZE, n_images=4)

    # --- stage 1: classifier training + threshold calibration ----------
    model = build_classifier('M7', spec.n_fg_classes)
    trainer = ClassifierTrainer(model, lr=0.05, schedule='const')
    norm = _normalizer(spec.norm_cues)
    params, mstate, opt = trainer.init(jax.random.PRNGKey(0),
                                       jnp.zeros((4, SIZE, SIZE, 3)))
    step = trainer.jitted_step()
    scores0 = None
    for i, b in enumerate(ds.batches(4)):
        imgs = jnp.asarray(norm(b.images))
        params, mstate, opt, m = step(params, mstate, opt, imgs,
                                      jnp.asarray(b.tags),
                                      jax.random.PRNGKey(i))
    b = next(ds.batches(4))
    scores = trainer.eval_scores(params, mstate,
                                 jnp.asarray(norm(b.images)))
    th = np.asarray(metrics.optimal_thresholds(b.tags, np.asarray(scores)))
    assert th.shape == (spec.n_fg_classes,)

    # --- stage 2: cue generation with the trained model ----------------
    variables = {'params': params, **mstate}
    fg = _ClassifierHandle(model, variables, th, SIZE)
    bg = _ClassifierHandle.random('M7', spec.n_fg_classes, SIZE, seed=9)
    gen = gc.VOCDeepGlobeCueGenerator(spec, fg, bg, thresh=0.2)
    cue_dict = gen.run(ds.batches(4))
    assert '0_cues' in cue_dict and cue_dict['0_cues'].shape[0] == 3

    # --- stage 3a: SEC training from those cues ------------------------
    sec = SECDSRGTrainer('SEC', 'VOC2012', spec.n_seg_classes,
                         base_lr=1e-3, crf_cfg=CFG)
    sparams, sopt = sec.init(jax.random.PRNGKey(1),
                             jnp.zeros((4, SIZE, SIZE, 3)))
    grid = (SIZE - 1) // 8 + 1
    cues = np.stack([
        np.asarray(jax.image.resize(jnp.asarray(
            artifacts.unpack_cues(cue_dict, i, (41, 41,
                                                spec.n_seg_classes))),
            (grid, grid, spec.n_seg_classes), 'nearest'))
        for i in range(4)])
    labels = np.zeros((4, spec.n_seg_classes), np.float32)
    labels[:, 0] = 1
    for i in range(4):
        labels[i][cue_dict[f'{i}_labels']] = 1
    sstep = sec.jitted_step()
    losses = []
    for i in range(3):
        sparams, sopt, parts = sstep(
            sparams, sopt, jnp.asarray(norm(b.images)),
            jnp.asarray(b.images, jnp.float32), jnp.asarray(cues),
            jnp.asarray(labels), jax.random.PRNGKey(i))
        losses.append(float(parts['total']))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    # --- stage 3c: HSN segmentation with the trained classifier --------
    seg = hsn.HSNSegmenter(spec, fg, bg, cfg=CFG)
    pred = np.asarray(seg.segment_batch(b.images))
    assert pred.shape == (4, SIZE, SIZE)
    conf = metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(b.gt),
                                    spec.n_seg_classes)
    _, miou = metrics.iou_from_confusion(conf)
    assert 0.0 <= float(miou) <= 1.0

    # --- stage 3b: IRNet cam -> ir_label -> train -> random walk -------
    ci = irnet.CAMInference(fg, spec, 'M7', scales=(1.0,))
    d = ci.make_cam(b.images[0], b.tags[0])
    if d['keys'].size:
        ir = irnet.cam_to_ir_label(b.images[0], d, 'VOC2012',
                                   conf_fg_thres=0.5, cfg=CFG)
        assert ir.shape == (SIZE, SIZE)
        tr = irnet.IRNTrainer('m7', spec.n_seg_classes, crop_size=SIZE,
                              radius=3, max_step=4)
        variables, opt_state = tr.init(jax.random.PRNGKey(2))
        lab4 = ir[::4, ::4].astype(np.int64)
        bgp, fgp, ngp = (jnp.asarray(x[None]) for x in
                         irnet.affinity_labels(lab4, tr.path_index,
                                               spec.n_seg_classes))
        istep = tr.jitted_step()
        variables, opt_state, parts = istep(
            variables, opt_state,
            jnp.asarray(norm(b.images[:1])), bgp, fgp, ngp)
        assert np.isfinite(float(parts['total']))
        from wsss_tpu.models.irn import edge_displacement_inference
        edge, disp = edge_displacement_inference(
            lambda v, x: tr.net.apply(v, x), variables,
            jnp.asarray(norm(b.images[:1])), np.zeros(2))
        sem = irnet.make_sem_seg(edge, d, 'VOC2012', (SIZE, SIZE),
                                 exp_times=1)
        assert sem.shape == (SIZE, SIZE)
