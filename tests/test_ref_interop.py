"""Reference-artifact interop: byte-level round-trips in BOTH directions
for the on-disk contracts the stacks exchange (VERDICT round-2 item 9).

  * localization_cues.pickle — written by 02_cues/demo.py:217-222
    (np.array(np.where(onehot)) [3,N] rows = (class,row,col)), read back
    with pickle.load(..., encoding='iso-8859-1')
    (03a_sec-dsrg/model.py:178, 02_cues/demo.py:404).
  * cam dict .npy — np.save of {'keys','cam','high_res'}
    (make_cam.py:78-88), read via np.load(...).item() (eval_cam.py:48).
  * optimalScoreThresh .mat — scipy.io semantics (01_train/demo.py:189-192,
    02_cues/demo.py:104-123).
"""
import os
import pickle

import numpy as np
import pytest

from wsss_tpu.io import artifacts


def _ref_style_cue_dict(rng, n_imgs=3, n_cls=6, seed=41):
    """Build a dict exactly the way 02_cues/utilities.py:231-234 does."""
    cues = {}
    onehots = []
    for i in range(n_imgs):
        lab = rng.integers(-1, n_cls, (seed, seed))
        onehot = np.zeros((n_cls, seed, seed), np.int64)
        for k in range(n_cls):
            onehot[k] = lab == k
        cues['%d_labels' % i] = np.where(onehot.any((1, 2)))[0]
        cues['%d_cues' % i] = np.array(np.where(onehot))
        onehots.append(onehot)
    return cues, onehots


def test_reference_written_pickle_reads_back(tmp_path):
    """A pickle produced by the REFERENCE writer loads through our
    reader and unpacks to the same dense one-hot."""
    rng = np.random.default_rng(0)
    cues, onehots = _ref_style_cue_dict(rng)
    path = str(tmp_path / 'localization_cues.pickle')
    pickle.dump(cues, open(path, 'wb'))          # demo.py:319 verbatim

    got = artifacts.read_cue_pickle(path)
    assert set(got) == set(cues)
    for i, onehot in enumerate(onehots):
        dense = artifacts.unpack_cues(got, i, (41, 41, onehot.shape[0]))
        np.testing.assert_array_equal(
            dense.transpose(2, 0, 1).astype(np.int64), onehot)


def test_our_pickle_reads_like_the_reference(tmp_path):
    """A pickle produced by OUR writer must satisfy the reference's
    loader contract: pickle.load(..., encoding='iso-8859-1'), '%s_cues'
    -> [3,N] with rows (class,row,col) scatterable via
    cues[cues_i[1], cues_i[2], cues_i[0]] = 1 (03a model.py:244-245)."""
    rng = np.random.default_rng(1)
    n_cls, seed = 5, 41
    onehot_hwc = (rng.random((2, seed, seed, n_cls)) < 0.1).astype(
        np.float32)
    out = {}
    artifacts.pack_cues(onehot_hwc, [np.array([1, 2]), np.array([0])],
                        [0, 1], out)
    path = str(tmp_path / 'localization_cues.pickle')
    artifacts.write_cue_pickle(path, out)

    loaded = pickle.load(open(path, 'rb'), encoding='iso-8859-1')
    for i in range(2):
        cues_i = loaded['%s_cues' % i]
        assert cues_i.shape[0] == 3
        dense = np.zeros((seed, seed, n_cls))
        dense[cues_i[1], cues_i[2], cues_i[0]] = 1.0   # model.py:245
        np.testing.assert_array_equal(dense, onehot_hwc[i])
        assert list(loaded['%s_labels' % i]) == (
            [1, 2] if i == 0 else [0])


def test_reference_written_cam_npy_reads_back(tmp_path):
    """np.save of the reference dict (make_cam.py:80-88) loads through
    read_cam_npy, including the no-high_res DeepGlobe flavor and the
    empty-keys flavor."""
    rng = np.random.default_rng(2)
    full = {'keys': np.array([1, 4]),
            'cam': rng.random((2, 10, 10)).astype(np.float32),
            'high_res': rng.random((2, 40, 40)).astype(np.float32)}
    p1 = str(tmp_path / 'a.npy')
    np.save(p1, full)                              # make_cam.py:80 verbatim
    got = artifacts.read_cam_npy(p1)
    for k in full:
        np.testing.assert_array_equal(got[k], full[k])

    dg = {'keys': np.array([0, 3]),
          'cam': rng.random((2, 10, 10)).astype(np.float32)}
    p2 = str(tmp_path / 'b.npy')
    np.save(p2, dg)                                # make_cam.py:84
    got = artifacts.read_cam_npy(p2)
    np.testing.assert_array_equal(got['cam'], dg['cam'])
    assert got.get('high_res') is None or 'high_res' not in got

    empty = {'keys': np.empty(0), 'cam': np.empty(0),
             'high_res': np.empty(0)}
    p3 = str(tmp_path / 'c.npy')
    np.save(p3, empty)                             # make_cam.py:87
    got = artifacts.read_cam_npy(p3)
    assert got['keys'].size == 0


def test_our_cam_npy_reads_like_the_reference(tmp_path):
    """write_cam_npy output must load via the reference's
    np.load(...).item() and argmax-index exactly (eval_cam.py:48-62)."""
    rng = np.random.default_rng(3)
    keys = np.array([2, 5], np.int64)
    cam = rng.random((2, 8, 8)).astype(np.float32)
    hi = rng.random((2, 32, 32)).astype(np.float32)
    path = str(tmp_path / 'x.npy')
    artifacts.write_cam_npy(path, keys, cam, hi)

    d = np.load(path, allow_pickle=True).item()    # eval_cam.py:48
    assert isinstance(d, dict)
    np.testing.assert_array_equal(d['keys'], keys)
    np.testing.assert_array_equal(d['cam'], cam)
    np.testing.assert_array_equal(d['high_res'], hi)
    _ = d['keys'][np.argmax(d['high_res'], axis=0)]


def test_thresholds_mat_scipy_interop(tmp_path):
    """The triplet's .mat must interoperate with scipy.io (the loader
    the reference uses, 02_cues/demo.py:104-123) when scipy exists."""
    scipy_io = pytest.importorskip('scipy.io')
    from wsss_tpu.io import checkpoint
    thr = np.linspace(0.1, 0.9, 21).astype(np.float64)
    out = str(tmp_path)
    checkpoint.export_triplet(
        out, 'sess', arch={'model': 'VGG16'},
        params={'w': np.zeros(3, np.float32)}, thresholds=thr)
    mat = scipy_io.loadmat(os.path.join(out, 'sess.mat'))
    got = np.asarray(mat['optimalScoreThresh']).reshape(-1)
    np.testing.assert_allclose(got, thr, rtol=1e-6)
