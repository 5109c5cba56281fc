"""Pour trained classifier weights into dependent nets' frozen trunks.

The reference constructs every CAM/IRN network by loading the 01_train
Keras classifier weights into the torch trunk layer-by-layer and asserting
full consumption (03b_irn/net/common_cnn.py:25-42, assert at :51-52); the
trunk is then frozen and only the heads train.  Here the classifier and
the IRNet trunk share the same flax modules (VGGStage towers), so the
transplant is a subtree graft with a structural shape check standing in
for the reference's weight-count assert.

Both 'params' and 'batch_stats' move: IRNet applies its trunk with
train=False, so the classifier's running BN statistics are part of the
transplanted function.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

_M7_STAGES = ('layer1', 'layer2', 'layer3_p1')


def _check_match(dst, src, ctx: str):
    """Same tree structure + same leaf shapes (common_cnn.py:51-52)."""
    d_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(dst)[0]}
    s_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(src)[0]}
    if d_paths.keys() != s_paths.keys():
        missing = d_paths.keys() ^ s_paths.keys()
        raise ValueError(f'{ctx}: trunk structure mismatch: {missing}')
    bad = [k for k in d_paths if d_paths[k] != s_paths[k]]
    if bad:
        raise ValueError(
            f'{ctx}: shape mismatch at {bad[0]}: '
            f'{d_paths[bad[0]]} vs {s_paths[bad[0]]}')


def _classifier_trunk_subtrees(clf_variables: Dict[str, Any],
                               backbone: str):
    """Extract the trunk subtree per collection from classifier variables.

    vgg16: VGG16Classifier holds the tower under 'backbone'
    (models/backbones.py:88); m7: M7Classifier holds the three stages as
    top-level siblings (models/backbones.py:116-121)."""
    out = {}
    for col, tree in clf_variables.items():
        if col == 'params':
            tree = {k: v for k, v in tree.items() if k != 'head'}
        if backbone == 'vgg16':
            if 'backbone' in tree:
                out[col] = tree['backbone']
        else:
            sub = {k: tree[k] for k in _M7_STAGES if k in tree}
            if sub:
                out[col] = sub
    return out


def transplant_classifier_trunk(clf_variables: Dict[str, Any],
                                net_variables: Dict[str, Any],
                                backbone: str,
                                trunk_name: str = 'trunk'
                                ) -> Dict[str, Any]:
    """Return net_variables with its ``trunk_name`` subtree replaced by
    the classifier's trunk (params + batch_stats), shape-checked.

    backbone: 'vgg16' | 'm7' (matching models.irn.IRNet wirings).
    """
    if backbone not in ('vgg16', 'm7'):
        raise ValueError(f'unknown backbone {backbone!r}')
    src = _classifier_trunk_subtrees(clf_variables, backbone)
    if 'params' not in src:
        raise ValueError('classifier variables carry no trunk params')
    new_vars = dict(net_variables)
    for col, subtree in src.items():
        if col not in new_vars or trunk_name not in new_vars[col]:
            continue
        _check_match(new_vars[col][trunk_name], subtree,
                     f'{col}/{trunk_name}')
        coltree = dict(new_vars[col])
        coltree[trunk_name] = jax.tree_util.tree_map(np.asarray, subtree)
        new_vars[col] = coltree
    return new_vars
