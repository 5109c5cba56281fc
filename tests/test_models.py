import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsss_tpu.models import (DSRGNet, IRNet, SECNet, VGG16Classifier,
                             M7Classifier, build_classifier, sp_softmax)


def _init_apply(m, x):
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: m.apply(v, x))(vs, x)
    return vs, out


def test_vgg16_classifier_shapes():
    m = VGG16Classifier(num_classes=20)
    x = jnp.zeros((2, 64, 64, 3))
    _, (scores, feats) = _init_apply(m, x)
    assert scores.shape == (2, 20)
    assert feats.shape == (2, 8, 8, 1024)  # stride 8
    assert np.all((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1))


def test_m7_classifier_shapes():
    m = M7Classifier(num_classes=31)
    x = jnp.zeros((2, 64, 64, 3))
    _, (scores, feats) = _init_apply(m, x)
    assert scores.shape == (2, 31)
    assert feats.shape == (2, 16, 16, 256)  # stride 4 (layer3_p1 grid)


def test_build_classifier_dispatch():
    assert isinstance(build_classifier('X1.7', 51), M7Classifier)
    assert isinstance(build_classifier('VGG16', 20), VGG16Classifier)
    with pytest.raises(ValueError):
        build_classifier('resnet99', 3)


def test_sec_dsrg_seed_grid():
    # 321x321 input must land on the 41x41 seed grid (03a model.py:34-35);
    # DSRG shares the trunk, checked at a smaller size (1-core CPU CI)
    m = SECNet(num_classes=21)
    _, logits = _init_apply(m, jnp.zeros((1, 321, 321, 3)))
    assert logits.shape == (1, 41, 41, 21)
    m = DSRGNet(num_classes=21)
    _, logits = _init_apply(m, jnp.zeros((1, 161, 161, 3)))
    assert logits.shape == (1, 21, 21, 21)
    sm = sp_softmax(logits)
    np.testing.assert_allclose(np.asarray(sm.sum(-1)), 1.0, rtol=1e-5)
    assert float(sm.min()) >= 1e-4 * 0.9  # min_prob floor


@pytest.mark.parametrize('backbone,esize,dsize', [
    ('vgg16', 16, 16),   # edge /4, dp /4
    ('m7', 32, 16),      # edge /2, dp /4
])
def test_irnet_grids(backbone, esize, dsize):
    m = IRNet(backbone=backbone)
    x = jnp.zeros((1, 64, 64, 3))
    _, (edge, disp) = _init_apply(m, x)
    assert edge.shape == (1, esize, esize, 1)
    assert disp.shape == (1, dsize, dsize, 2)


def test_irnet_trunk_frozen():
    m = IRNet(backbone='m7')
    x = jnp.ones((1, 32, 32, 3))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    def loss(params):
        edge, disp = m.apply({**vs, 'params': params}, x)
        return jnp.sum(edge ** 2) + jnp.sum(disp ** 2)

    g = jax.jit(jax.grad(loss))(vs['params'])
    trunk_norm = sum(float(jnp.abs(v).sum())
                     for v in jax.tree_util.tree_leaves(g['trunk']))
    head_norm = sum(float(jnp.abs(v).sum())
                    for k, v in g.items() if k != 'trunk'
                    for v in jax.tree_util.tree_leaves(v))
    assert trunk_norm == 0.0
    assert head_norm > 0.0


def test_resnet50_cam():
    from wsss_tpu.models.resnet50 import ResNet50CAM
    m = ResNet50CAM(num_classes=20)
    x = jnp.zeros((1, 64, 64, 3))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(lambda v, x: m.apply(v, x))(vs, x)
    assert logits.shape == (1, 20)
    cam = jax.jit(lambda v, x: m.apply(v, x, method='cam'))(vs, x)
    # reference strides (resnet50.py:61-69): conv1 /2 + pool /2 (=/4),
    # layer1 stride 1, layers 2-3 stride 2, layer4 stride 1 dilated
    # -> /16 grid (the resnet50_cam geometry)
    assert cam.shape == (1, 4, 4, 20)
    assert float(cam.min()) >= 0.0


def test_timing_utils():
    from wsss_tpu.utils.timing import AverageMeter, Timer, MetricsLogger
    import tempfile, os
    am = AverageMeter()
    am.add({'loss': 2.0}); am.add({'loss': 4.0})
    assert am.pop('loss') == 3.0
    t = Timer(); t.update_progress(0.5)
    assert ':' in t.str_estimated_complete()
    with tempfile.TemporaryDirectory() as d:
        ml = MetricsLogger(os.path.join(d, 'log.jsonl'))
        ml.log(1, miou=0.5); ml.log(2, miou=0.6)
        recs = ml.read()
        assert len(recs) == 2 and recs[1]['miou'] == 0.6


def test_m_variant_family():
    from wsss_tpu.models.backbones import build_classifier, \
        MVariantClassifier, M_VARIANT_CFGS
    x = jnp.zeros((1, 64, 64, 3))
    for name in M_VARIANT_CFGS:
        if name == 'M7':
            continue  # dispatches to M7Classifier
        m = build_classifier(name, 10)
        assert isinstance(m, MVariantClassifier), name
        if name != 'M4':
            continue  # compile one representative variant (1-core CPU CI)
        vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        scores, feats = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
        assert scores.shape == (1, 10), name
    # VGG16fg / VGG16fg_bn batchnorm switches (01_train/demo.py:24,28-31)
    fg = build_classifier('VGG16fg', 5)
    assert fg.batchnorm is False
    fgbn = build_classifier('VGG16fg_bn', 5)
    assert fgbn.batchnorm is True
