"""IRNet pipeline steps on tiny synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.methods import irnet
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle
from wsss_tpu.models.irn import edge_displacement_inference
from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.ops.random_walk import PathIndex


def test_strided_sizes():
    assert irnet.get_strided_size((512, 512), 4) == (128, 128)
    assert irnet.get_strided_size((321, 321), 4) == (81, 81)
    assert irnet.get_strided_up_size((321, 321), 16) == (336, 336)


def test_make_cam_voc_shapes():
    spec = registry.get('VOC2012')
    h = _ClassifierHandle.random('VGG16', 20, 64, seed=0)
    ci = irnet.CAMInference(h, spec, 'VGG16', scales=(1.0, 0.5))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    tags = np.zeros(20, np.float32)
    tags[[3, 7]] = 1
    d = ci.make_cam(img, tags)
    assert list(d['keys']) == [3, 7]
    assert d['cam'].shape == (2, 16, 16)       # strided /4
    assert d['high_res'].shape == (2, 64, 64)
    assert d['cam'].max() <= 1.0 + 1e-5        # max-normalized
    # no tags and nothing passing -> argmax fallback gives one key
    h.thresholds = jnp.ones_like(h.thresholds)  # nothing passes
    d0 = ci.make_cam(img, None)
    assert len(d0['keys']) == 1


def test_make_cam_adp_bg_channels():
    spec = registry.get('ADP-morph')
    h = _ClassifierHandle.random('X1.7', 51, 64, seed=1)
    ci = irnet.CAMInference(h, spec, 'X1.7', scales=(1.0,),
                            adp_htt='morph')
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    tags = np.zeros(28, np.float32)
    tags[[0, 5]] = 1
    d = ci.make_cam(img, tags)
    # keys = [bg] + fg+1
    assert d['keys'][0] == 0
    assert set(d['keys'][1:]) == {1, 6}
    assert d['cam'].shape[0] == 3


def test_cam_to_ir_label_voc():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    hr = np.zeros((2, 32, 32), np.float32)
    hr[0, :16] = 0.9   # class keys[0] confident on top half
    hr[1, 16:] = 0.9
    cam_dict = {'keys': np.array([4, 9]), 'cam': hr[:, ::4, ::4],
                'high_res': hr}
    cfg = CRFConfig(1.5, 2, 3.0, 30, 4, iterations=2)
    conf = irnet.cam_to_ir_label(img, cam_dict, 'VOC2012',
                                 conf_fg_thres=0.5, conf_bg_thres=0.05,
                                 cfg=cfg)
    assert conf.shape == (32, 32)
    assert set(np.unique(conf)).issubset({0, 5, 10, 255})


def test_affinity_labels_partition():
    pi = PathIndex(radius=3)
    lab = np.zeros((12, 12), np.int64)
    lab[:, 6:] = 1
    lab[0, :] = 255  # ignore row
    bg_pos, fg_pos, neg = irnet.affinity_labels(lab, pi, 21)
    # every pair is in exactly one of the three sets or invalid
    total = bg_pos + fg_pos + neg
    assert total.max() <= 1
    assert bg_pos.sum() > 0 and fg_pos.sum() > 0 and neg.sum() > 0


def test_irn_trainer_step_and_calibration():
    tr = irnet.IRNTrainer('m7', num_classes=21, crop_size=32, radius=3,
                          max_step=10)
    variables, opt_state = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    lab = rng.integers(0, 2, (2, 8, 8)).astype(np.int64)
    packs = [irnet.affinity_labels(l, tr.path_index, 21) for l in lab]
    bg, fg, ng = (jnp.asarray(np.stack(z)) for z in zip(*packs))
    step = tr.jitted_step()
    losses = []
    for i in range(4):
        variables, opt_state, parts = step(variables, opt_state, imgs,
                                           bg, fg, ng)
        losses.append(float(parts['total']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    mean = tr.calibrate_disp_mean(variables, [np.asarray(imgs)])
    assert mean.shape == (2,)
    # trunk must stay frozen
    p0, _ = tr.init(jax.random.PRNGKey(0))
    t_new = jax.tree_util.tree_leaves(variables['params']['trunk'])
    t_old = jax.tree_util.tree_leaves(p0['params']['trunk'])
    assert all(np.allclose(a, b) for a, b in zip(t_new, t_old))


def test_make_sem_seg_voc():
    rng = np.random.default_rng(4)
    edge = jnp.asarray(rng.random((16, 16)).astype(np.float32) * 0.5)
    cam = np.zeros((2, 16, 16), np.float32)
    cam[0, :, :8] = 1.0
    cam[1, :, 8:] = 1.0
    d = {'keys': np.array([2, 6]), 'cam': cam, 'high_res': cam}
    out = irnet.make_sem_seg(edge, d, 'VOC2012', (64, 64),
                             exp_times=2, sem_seg_bg_thres=0.3)
    assert out.shape == (64, 64)
    assert set(np.unique(out)).issubset({0, 3, 7})
    # empty keys -> all background
    d0 = {'keys': np.empty(0), 'cam': np.empty(0), 'high_res': np.empty(0)}
    out0 = irnet.make_sem_seg(edge, d0, 'VOC2012', (64, 64))
    assert (out0 == 0).all()


def test_edge_displacement_inference_runs():
    tr = irnet.IRNTrainer('m7', num_classes=21, crop_size=32, radius=3)
    variables, _ = tr.init(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 32, 32, 3))
    edge, disp = edge_displacement_inference(
        lambda v, x: tr.net.apply(v, x), variables, img,
        disp_mean=np.zeros(2))
    assert edge.shape == (16, 16)   # m7 edge at /2
    assert disp.shape == (8, 8, 2)  # dp at /4


def test_irn_trainer_resnet50_smoke():
    """resnet50 IRN head (resnet50_irn.py:7-137 — legacy in the
    reference's dispatch, func_sample.py:40-41): init + forward + one
    training step produce finite losses and a frozen trunk."""
    tr = irnet.IRNTrainer('resnet50', num_classes=4, crop_size=32,
                          radius=3, max_step=4)
    variables, opt_state = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32))
    lab = rng.integers(0, 2, (1, 8, 8)).astype(np.int64)
    packs = [irnet.affinity_labels(l, tr.path_index, 4) for l in lab]
    bg, fg, ng = (jnp.asarray(np.stack(z)) for z in zip(*packs))
    step = tr.jitted_step()
    variables, opt_state, parts = step(variables, opt_state, imgs,
                                       bg, fg, ng)
    assert np.isfinite(float(parts['total']))
    # edge and disp both live on the /4 grid like vgg16 (the trainer's
    # path-index gathers assume it)
    edge, disp = tr.net.apply(variables, imgs)
    assert edge.shape == (1, 8, 8, 1)
    assert disp.shape == (1, 8, 8, 2)
    # trunk frozen
    p0, _ = tr.init(jax.random.PRNGKey(0))
    t_new = jax.tree_util.tree_leaves(variables['params']['trunk'])
    t_old = jax.tree_util.tree_leaves(p0['params']['trunk'])
    assert all(np.allclose(a, b) for a, b in zip(t_new, t_old))
