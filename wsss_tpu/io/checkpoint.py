"""Checkpointing: orbax for training state + the reference's artifact
triplet.

The reference persists three flavors (SURVEY.md §5.4): Keras
ModelCheckpoint epochs + mtime-based latest discovery
(01_train/utilities.py:60-67), TF Saver epoch-N/final-0 pairs
(03a model.py:406-433), torch state_dicts (func_sample.py:208-210).  Here
one orbax-backed scheme covers all methods, plus an exporter for the
final `{sess_id}.json/.npz/.mat` triplet mirroring the semantics of the
reference's `.json/.h5/.mat` (arch descriptor, params, calibrated
thresholds — 01_train/demo.py:63-66,125-127,191-192).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f'step_{step:08d}')


def save_checkpoint(root: str, step: int, state: Any) -> str:
    """Save a pytree checkpoint with orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(_ckpt_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(root: str) -> Optional[int]:
    """Largest saved step (03a model.py:406-415 get_latest_checkpoint)."""
    if not os.path.isdir(root):
        return None
    steps = [int(m.group(1)) for d in os.listdir(root)
             if (m := re.fullmatch(r'step_(\d+)', d))]
    return max(steps) if steps else None


def restore_checkpoint(root: str, target: Any = None,
                       step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore the given (or latest) step.

    target=None returns the raw tree (dicts/arrays) — use when only part
    of the state matters (e.g. predict needs params but not the optimizer
    state, whose structure varies with the training schedule)."""
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {root}')
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(_ckpt_dir(root, step))
    state = ckptr.restore(path) if target is None else \
        ckptr.restore(path, target)
    return state, step


# ---------------------------------------------------------------------------
# Final artifact triplet
# ---------------------------------------------------------------------------

def export_triplet(out_dir: str, sess_id: str, arch: Dict,
                   params: Any, thresholds: Optional[np.ndarray] = None,
                   variables: Optional[Dict] = None) -> None:
    """Write {sess_id}.json (arch), .npz (flat params), .mat (thresholds).

    Mirrors the reference's model triplet contract; the .mat carries
    'optimalScoreThresh' exactly like 01_train/demo.py:189-192 so
    downstream stages (and the reference's own loaders) can read it.

    variables: the full flax variables dict (params + batch_stats) —
    when given, ALSO writes a Keras-2.2.4-layout {sess_id}.h5
    (io/legacy.py write_keras_h5) so the reference's own Keras loaders
    can consume our weights (two-way interop, 01_train/demo.py:63-66).
    """
    import scipy.io as sio
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, sess_id + '.json'), 'w') as f:
        json.dump(arch, f, indent=2)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = '/'.join(getattr(p, 'key', str(p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(out_dir, sess_id + '.npz'), **flat)
    if thresholds is not None:
        sio.savemat(os.path.join(out_dir, sess_id + '.mat'),
                    {'optimalScoreThresh': np.asarray(thresholds)})
    if variables is not None:
        from wsss_tpu.io.legacy import write_keras_h5
        write_keras_h5(os.path.join(out_dir, sess_id + '.h5'), variables)


def import_triplet(out_dir: str, sess_id: str, params_template: Any
                   ) -> Tuple[Dict, Any, Optional[np.ndarray]]:
    """Inverse of export_triplet."""
    import scipy.io as sio
    with open(os.path.join(out_dir, sess_id + '.json')) as f:
        arch = json.load(f)
    data = np.load(os.path.join(out_dir, sess_id + '.npz'))

    def fill(path, leaf):
        key = '/'.join(getattr(p, 'key', str(p)) for p in path)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        return arr.astype(leaf.dtype) if hasattr(leaf, 'dtype') else arr

    params = jax.tree_util.tree_map_with_path(fill, params_template)
    mat_path = os.path.join(out_dir, sess_id + '.mat')
    thresholds = None
    if os.path.exists(mat_path):
        thresholds = np.asarray(
            sio.loadmat(mat_path)['optimalScoreThresh']).reshape(-1)
    return arch, params, thresholds
