"""03a training loop: SEC / DSRG with the reference's optimizer semantics.

From 03a_sec-dsrg/model.py:
  * Momentum 0.9, base_lr 1e-4, weight decay 5e-4 (model.py:36-40)
  * per-variable LR multipliers: x1 conv kernels, x2 biases, x10 final
    (fc8) kernels, x20 fc8 biases (model.py:391-398; SEC.py:340-345)
  * LR decays x0.5 every 4 epochs (model.py:38-39,493)
  * gradient accumulation over accum_num steps (model.py:399-404) ->
    optax.MultiSteps

One jitted train step; the CRF layer and (for DSRG) region growing run
in-graph instead of the reference's two tf.py_func host round-trips per
step (SURVEY.md §3.2).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import optax

from wsss_tpu.methods.dsrg import dsrg_losses
from wsss_tpu.methods.sec import sec_losses
from wsss_tpu.models.deeplab import DSRGNet, SECNet
from wsss_tpu.ops.crf import config as crf_config


def lr_multiplier_label(path) -> str:
    """Map a param path to its LR-multiplier group (SEC.py:340-345)."""
    names = [getattr(p, 'key', str(p)) for p in path]
    # SECNet: head/fc8; DSRGNet: branch{6,12,18,24}/fc8
    is_final = 'fc8' in names
    is_bias = names[-1] == 'bias'
    if is_final:
        return 'final_bias' if is_bias else 'final_kernel'
    return 'bias' if is_bias else 'kernel'


MULTIPLIERS = {'kernel': 1.0, 'bias': 2.0,
               'final_kernel': 10.0, 'final_bias': 20.0}


def _scale_by_multiplier(params):
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: lr_multiplier_label(path), params)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, l: u * MULTIPLIERS[l], updates, labels)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(params, base_lr: float = 1e-4, momentum: float = 0.9,
                   weight_decay: float = 5e-4, lr_decay: float = 0.5,
                   steps_per_decay: int = 1000, accum_num: int = 1):
    """Momentum + per-var LR multipliers + step decay + accumulation."""
    sched = lambda count: base_lr * (lr_decay ** (count // steps_per_decay))
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: getattr(path[-1], 'key', '') == 'kernel', params)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        optax.trace(decay=momentum, nesterov=False),
        _scale_by_multiplier(params),
        optax.scale_by_learning_rate(sched),
    )
    if accum_num > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_num)
    return tx


class SECDSRGTrainer:
    """Holds model + optimizer; exposes a jitted train step and predictor."""

    def __init__(self, method: str, dataset: str, num_classes: int,
                 base_lr: float = 1e-4, accum_num: int = 1,
                 steps_per_decay: int = 1000,
                 crf_cfg: Optional[crf_config.CRFConfig] = None):
        method = method.upper()
        self.method = method
        if method == 'SEC':
            self.net = SECNet(num_classes=num_classes)
            self.crf_cfg = crf_cfg or crf_config.SEC_TRAIN_DEFAULT
        elif method == 'DSRG':
            self.net = DSRGNet(num_classes=num_classes)
            self.crf_cfg = crf_cfg or crf_config.DSRG_TRAIN
        else:
            raise ValueError(method)
        self.num_classes = num_classes
        self.base_lr = base_lr
        self.accum_num = accum_num
        self.steps_per_decay = steps_per_decay

    def init(self, rng, sample_images_norm):
        variables = jax.jit(functools.partial(
            self.net.init, train=True))(rng, sample_images_norm)
        params = variables['params']
        self.tx = make_optimizer(
            params, base_lr=self.base_lr, accum_num=self.accum_num,
            steps_per_decay=self.steps_per_decay)
        return params, self.tx.init(params)

    def loss_fn(self, params, imgs_norm, imgs_raw, cues, labels,
                dropout_rng):
        logits = self.net.apply({'params': params}, imgs_norm, train=True,
                                rngs={'dropout': dropout_rng})
        if self.method == 'SEC':
            return sec_losses(logits, cues, labels, imgs_raw,
                              self.crf_cfg, None)
        return dsrg_losses(logits, cues, labels, imgs_raw, self.crf_cfg)

    def train_step(self, params, opt_state, imgs_norm, imgs_raw, cues,
                   labels, dropout_rng):
        (loss, parts), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(params, imgs_norm, imgs_raw, cues,
                                        labels, dropout_rng)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        parts = dict(parts, total=loss)
        return params, opt_state, parts

    def jitted_step(self):
        return jax.jit(self.train_step)

    def predict_logits(self, params, imgs_norm):
        return self.net.apply({'params': params}, imgs_norm, train=False)
