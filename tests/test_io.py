"""Checkpoint + legacy bridge round trips."""
import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.io import checkpoint, legacy
from wsss_tpu.models import M7Classifier


def test_orbax_roundtrip(tmp_path):
    state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
             'step': jnp.asarray(7)}
    checkpoint.save_checkpoint(str(tmp_path), 7, state)
    checkpoint.save_checkpoint(str(tmp_path), 12, state)
    assert checkpoint.latest_step(str(tmp_path)) == 12
    restored, step = checkpoint.restore_checkpoint(str(tmp_path), state)
    assert step == 12
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.arange(6.0).reshape(2, 3))


def test_triplet_roundtrip(tmp_path):
    params = {'head': {'kernel': jnp.ones((4, 2)),
                       'bias': jnp.zeros((2,))}}
    th = np.array([0.4, 0.6], np.float32)
    checkpoint.export_triplet(str(tmp_path), 'sess', {'model': 'M7'},
                              params, th)
    arch, restored, th2 = checkpoint.import_triplet(str(tmp_path), 'sess',
                                                    params)
    assert arch == {'model': 'M7'}
    np.testing.assert_array_equal(np.asarray(restored['head']['kernel']),
                                  np.ones((4, 2)))
    np.testing.assert_allclose(th2, th)


def _keras_style_h5(tmp_path, arrays):
    """Write arrays as a Keras save_weights-layout h5."""
    import h5py
    path = str(tmp_path / 'w.h5')
    with h5py.File(path, 'w') as f:
        names = []
        for i, arr in enumerate(arrays):
            lname = f'layer_{i:03d}'
            names.append(lname.encode())
            g = f.create_group(lname)
            wn = f'{lname}/w:0'
            g.create_dataset(wn, data=arr)
            g.attrs['weight_names'] = [wn.encode()]
        f.attrs['layer_names'] = names
    return path


def test_keras_bridge_m7(tmp_path):
    """In-order pour of keras-style weights into M7 (bn) + count assert."""
    model = M7Classifier(num_classes=5, batchnorm=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 3)))
    # build the expected keras order from the model structure itself:
    # per conv: kernel,bias then bn gamma,beta,mean,var; finally dense
    rng = np.random.default_rng(0)
    slots = legacy._conv_bn_dense_slots(variables['params'])
    stats = legacy._bn_stat_slots(variables['batch_stats'])
    arrays = []
    si = 0
    i = 0
    while i < len(slots):
        path, leaf = slots[i]
        name = getattr(path[-1], 'key', str(path[-1]))
        if name == 'scale':
            for (p, l) in (slots[i], slots[i + 1], stats[si],
                           stats[si + 1]):
                arrays.append(rng.normal(size=np.asarray(l).shape)
                              .astype(np.float32))
            i += 2
            si += 2
        else:
            arrays.append(rng.normal(size=np.asarray(leaf).shape)
                          .astype(np.float32))
            i += 1
    path = _keras_style_h5(tmp_path, arrays)
    weights = legacy.read_keras_h5(path)
    assert len(weights) == len(arrays)
    new_vars = legacy.load_keras_weights_into(variables, weights)
    # first conv kernel took the first h5 array
    got = np.asarray(new_vars['params']['layer1']['Conv_0']['kernel'])
    np.testing.assert_array_equal(got, arrays[0])
    # weight-count assert fires on mismatch (common_cnn.py:51-52)
    import pytest
    with pytest.raises(ValueError, match='count mismatch'):
        legacy.load_keras_weights_into(variables, weights[:-1])


def test_slot_order_interleaves_conv_bn():
    model = M7Classifier(num_classes=3, batchnorm=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 16, 16, 3)))
    slots = legacy._conv_bn_dense_slots(variables['params'])
    names = ['/'.join(getattr(p, 'key', str(p)) for p in path)
             for path, _ in slots]
    i_conv = names.index('layer1/Conv_0/kernel')
    i_bn = names.index('layer1/BatchNorm_0/scale')
    i_conv2 = names.index('layer1/Conv_1/kernel')
    assert i_conv < i_bn < i_conv2


def test_thresholds_mat(tmp_path):
    import scipy.io as sio
    p = str(tmp_path / 't.mat')
    sio.savemat(p, {'optimalScoreThresh': np.array([[0.1, 0.5, 0.9]])})
    t = legacy.load_thresholds_mat(p, 3)
    np.testing.assert_allclose(t, [1 / 3, 0.5, 0.9])  # clamped to >= 1/3
    t2 = legacy.load_thresholds_mat(str(tmp_path / 'missing.mat'), 3)
    np.testing.assert_allclose(t2, [0.5, 0.5, 0.5])


def test_deeplab_init_npy(tmp_path):
    """Reference init.npy contract -> SECNet params (03a model.py:78-81)."""
    from wsss_tpu.models import SECNet
    net = SECNet(num_classes=4)
    vs = jax.jit(net.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 72, 72, 3)))
    params = vs['params']
    rng = np.random.default_rng(0)
    init = {}
    for stage, (n, w) in enumerate([(2, 64), (2, 128), (3, 256),
                                    (3, 512), (3, 512)], start=1):
        for i in range(1, n + 1):
            k = params['trunk'][f'conv{stage}_{i}']['kernel']
            init[f'conv{stage}_{i}'] = {
                'w': rng.normal(size=k.shape).astype(np.float32),
                'b': rng.normal(size=k.shape[-1]).astype(np.float32)}
    for n, shape in (('6', params['head']['fc6']['kernel'].shape),
                     ('7', params['head']['fc7']['kernel'].shape),
                     ('8', params['head']['fc8']['kernel'].shape)):
        init[f'fc{n}'] = {
            'w': rng.normal(size=shape).astype(np.float32),
            'b': rng.normal(size=shape[-1]).astype(np.float32)}
    path = str(tmp_path / 'init.npy')
    np.save(path, init, allow_pickle=True)
    new = legacy.load_deeplab_init_npy(path, params)
    np.testing.assert_array_equal(
        np.asarray(new['trunk']['conv3_2']['kernel']),
        init['conv3_2']['w'])
    np.testing.assert_array_equal(
        np.asarray(new['head']['fc7']['bias']), init['fc7']['b'])
    # fc8 stays random-init (SEC.py:329-336)
    np.testing.assert_array_equal(
        np.asarray(new['head']['fc8']['kernel']),
        np.asarray(params['head']['fc8']['kernel']))
