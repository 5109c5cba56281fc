"""Classifier -> IRNet trunk transplant (net/common_cnn.py:25-42 parity):
the transplanted trunk must compute exactly the classifier's features."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsss_tpu.models import build_classifier
from wsss_tpu.models.backbones import VGG16Backbone
from wsss_tpu.models.irn import IRNet, M7Stages
from wsss_tpu.models.transplant import transplant_classifier_trunk


def _init(model, size, seed=0):
    x = jnp.zeros((1, size, size, 3))
    return jax.jit(model.init)(jax.random.PRNGKey(seed), x)


@pytest.mark.parametrize('backbone,model_type,size',
                         [('vgg16', 'VGG16', 32), ('m7', 'M7', 32)])
def test_trunk_activations_match_classifier(backbone, model_type, size):
    clf = build_classifier(model_type, 5)
    clf_vars = _init(clf, size, seed=3)
    net = IRNet(backbone=backbone)
    net_vars = _init(net, size, seed=0)

    new_vars = transplant_classifier_trunk(clf_vars, net_vars, backbone)
    # sanity: the graft actually changed the trunk (some leaves, e.g. BN
    # biases, are zero-init in both — any() over all leaves)
    olds = jax.tree_util.tree_leaves(net_vars['params']['trunk'])
    news = jax.tree_util.tree_leaves(new_vars['params']['trunk'])
    assert any(not np.allclose(np.asarray(o), np.asarray(n))
               for o, n in zip(olds, news))

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, size, size, 3)).astype(np.float32))
    trunk_vars = {c: t['trunk'] for c, t in new_vars.items()
                  if 'trunk' in t}
    if backbone == 'vgg16':
        feats = jax.jit(VGG16Backbone(batchnorm=True).apply)(
            trunk_vars, x)
        ref = jax.jit(lambda v, x: clf.apply(
            v, x, method=lambda m, xx, train=False: m.backbone(xx)))(
                clf_vars, x)
        for f, r in zip(feats, ref):
            np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                       atol=1e-5)
    else:
        feats = jax.jit(M7Stages(batchnorm=True).apply)(trunk_vars, x)
        # classifier's layer3_p1 activation == stage-3 pre-pool features
        ref = jax.jit(lambda v, x: clf.apply(v, x)[1])(clf_vars, x)
        # M7Stages stage3 output has an extra 2x2 pool; compare stage2
        # against the classifier's layer2 trace instead for exactness
        ref2 = jax.jit(lambda v, x: clf.apply(
            v, x, method=lambda m, xx, train=False: m.layer2(
                m.layer1(xx))))(clf_vars, x)
        np.testing.assert_allclose(np.asarray(feats[1]),
                                   np.asarray(ref2), atol=1e-5)
        # and stage3 == maxpool(classifier layer3_p1 features)
        import flax.linen as nn
        pooled = nn.max_pool(ref, (2, 2), strides=(2, 2))
        np.testing.assert_allclose(np.asarray(feats[2]),
                                   np.asarray(pooled), atol=1e-5)


def test_shape_mismatch_rejected():
    clf = build_classifier('VGG16', 5)
    clf_vars = _init(clf, 32)
    net = IRNet(backbone='m7')
    net_vars = _init(net, 32)
    with pytest.raises(ValueError):
        transplant_classifier_trunk(clf_vars, net_vars, 'm7')


def test_irn_training_keeps_transplanted_trunk_frozen():
    """End-to-end: transplant then one IRNTrainer step; the trunk must not
    move (vgg16_irn.py:192-196 freeze semantics)."""
    from wsss_tpu.methods.irnet import IRNTrainer
    clf = build_classifier('VGG16', 5)
    clf_vars = _init(clf, 32, seed=1)
    tr = IRNTrainer('vgg16', 6, crop_size=32, max_step=4)
    variables, opt_state = tr.init(jax.random.PRNGKey(0))
    variables = transplant_classifier_trunk(clf_vars, variables, 'vgg16')
    grid = (8, 8)
    lab = np.zeros(grid, np.int64)
    from wsss_tpu.methods.irnet import affinity_labels
    bg, fg, ng = affinity_labels(lab, tr.path_index, 6)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 32, 32, 3)).astype(np.float32))
    before = jax.tree_util.tree_leaves(variables['params']['trunk'])[0]
    variables2, _, parts = jax.jit(tr.train_step)(
        variables, opt_state, imgs, jnp.asarray(bg)[None],
        jnp.asarray(fg)[None], jnp.asarray(ng)[None])
    after = jax.tree_util.tree_leaves(variables2['params']['trunk'])[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert np.isfinite(float(parts['total']))
