"""Shared CLI plumbing: settings, session ids, model-handle loading.

Mirrors the reference's layered config (SURVEY.md §5.6): settings.ini for
roots (settings.ini:1-7), argparse per stage, and the dataclass registry
for everything per-dataset.
"""
from __future__ import annotations

import argparse
import configparser
import os
from typing import Optional

import numpy as np

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import open_dataset


def load_settings(path: str = 'settings.ini') -> dict:
    cfg = configparser.ConfigParser()
    out = {'data_dir': None, 'model_cnn_dir': 'models_cnn',
           'cues_dir': 'cues', 'model_wsss_dir': 'models_wsss'}
    if os.path.exists(path):
        cfg.read(path)
        for sec in cfg.sections():
            for k, v in cfg[sec].items():
                out[k] = v
    return out


def add_common_args(p: argparse.ArgumentParser):
    ini = load_settings()
    p.add_argument('--dataset', default='VOC2012',
                   choices=sorted(registry.REGISTRY))
    p.add_argument('--model', default='VGG16',
                   choices=['VGG16', 'VGG16fg', 'VGG16fg_bn', 'M1', 'M2',
                            'M3', 'M4', 'M5', 'M6', 'M7', 'X1.7'])
    p.add_argument('--batchsize', type=int, default=8)
    p.add_argument('--data_root', default=ini.get('data_dir'),
                   help='devkit root (settings.ini data_dir; falls back '
                        'to synthetic data)')
    p.add_argument('--out_root', default='out')
    p.add_argument('--eval_root', default='eval')
    p.add_argument('--model_root', default=ini.get('model_cnn_dir',
                                                   'models_cnn'))
    p.add_argument('--synthetic_n', type=int, default=16,
                   help='synthetic dataset size when no devkit exists')
    p.add_argument('--img_size', type=int, default=0,
                   help='override input size (0 = per-model default)')
    p.add_argument('--mesh', default='none',
                   help="device mesh for multi-chip runs: 'none' "
                        "(single device), 'auto' (all visible chips), "
                        "or an integer device count.  Replaces the "
                        "reference's per-GPU process spawn "
                        "(make_cam.py:120-122, SURVEY.md §2.8) with one "
                        "jax.sharding.Mesh program.")
    p.add_argument('--verbose', action='store_true')
    return p


def get_mesh(args):
    """Resolve --mesh into a jax.sharding.Mesh (or None)."""
    v = getattr(args, 'mesh', 'none')
    if not v or v == 'none':
        return None
    from wsss_tpu.parallel.mesh import make_mesh
    return make_mesh(None if v == 'auto' else int(v))


def dp_train_putters(args):
    """(put_batch, put_state) for --mesh dp-sharded training loops:
    batches shard over the mesh 'data' axis, params/optimizer state
    replicate, and GSPMD all-reduces gradients over ICI (replaces the
    reference's single-process DataParallel, train_irn.py:92 /
    SURVEY.md §2.8).  Identity passthroughs when --mesh none."""
    import jax
    import jax.numpy as jnp
    mesh = get_mesh(args)
    if mesh is None:
        return jnp.asarray, lambda t: t
    from wsss_tpu.parallel.mesh import batch_sharding, replicated
    ndata = mesh.shape['data']
    if args.batchsize % ndata:
        raise SystemExit(f'--batchsize {args.batchsize} must be '
                         f'divisible by the mesh data axis ({ndata})')
    bsh, rsh = batch_sharding(mesh), replicated(mesh)
    return (lambda x: jax.device_put(jnp.asarray(x), bsh),
            lambda t: jax.device_put(t, rsh))


def input_size(args) -> int:
    if args.img_size:
        return args.img_size
    spec = registry.get(args.dataset)
    return (spec.clf_size_vgg16 if args.model.startswith('VGG')
            else spec.clf_size_m7)


def sess_id(args, set_name: Optional[str] = None) -> str:
    """'{dataset}_{model}' (+set) naming, 02_cues/demo.py:67-72."""
    parts = [args.dataset]
    if set_name:
        parts.append(set_name)
    parts.append(args.model)
    return '_'.join(parts)


def load_handle(args, num_classes: int, size: int, seed: int = 0,
                suffix: str = ''):
    """Classifier handle from a saved triplet, else random-init (synthetic
    smoke mode)."""
    from wsss_tpu.io import checkpoint
    from wsss_tpu.methods.gradcam_cues import _ClassifierHandle
    from wsss_tpu.models import build_classifier
    import jax
    import jax.numpy as jnp

    sid = sess_id(args) + suffix
    model_dir = os.path.join(args.model_root, sid)
    npz = os.path.join(model_dir, sid + '.npz')
    if os.path.exists(npz):
        from wsss_tpu.models import infer_dtype
        model = build_classifier(args.model + suffix.replace('bg', ''),
                                 num_classes, dtype=infer_dtype())
        x0 = jnp.zeros((1, size, size, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        _, params, thresholds = checkpoint.import_triplet(
            model_dir, sid, variables['params'])
        variables = dict(variables, params=params)
        if thresholds is None:
            thresholds = np.full((num_classes,), 0.5, np.float32)
        h = _ClassifierHandle(model, variables, thresholds, size)
        if args.verbose:
            print(f'loaded {sid} from {model_dir}')
        return h
    if args.verbose:
        print(f'no saved model at {npz}; using random init')
    return _ClassifierHandle.random(args.model, num_classes, size,
                                    seed=seed)


def get_batches(args, split: str, size: int, with_gt: bool = False,
                htt: Optional[str] = None):
    ds = open_dataset(args.dataset, args.data_root, split, size,
                      synthetic_n=args.synthetic_n, htt=htt)
    return ds, ds.batches(args.batchsize, with_gt=with_gt)
