"""01_train equivalent: multi-label classifier training.

Rebuilds the reference's Keras fit_generator loop (01_train/demo.py:21-127)
as a jitted optax step: binary crossentropy on sigmoid outputs, SGD +
Nesterov momentum 0.9 (demo.py:60-61), optional per-class weighting, CLR or
step-decay schedules, batch-F1 metric (utilities.py:69-97).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from wsss_tpu.eval.metrics import batch_f1
from wsss_tpu.train import schedules


def bce_loss(logits, targets, class_weights=None):
    """Binary cross-entropy over sigmoid logits, mean over batch+classes."""
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    per = -(targets * logp + (1.0 - targets) * lognp)
    if class_weights is not None:
        per = per * class_weights[None, :]
    return jnp.mean(per)


class ClassifierTrainer:
    """Functional trainer: holds the model + optimizer, exposes a jittable
    (params, opt_state, batch) -> (params, opt_state, metrics) step."""

    def __init__(self, model, lr: float = 0.1, momentum: float = 0.9,
                 schedule: str = 'clr', clr_max_mult: float = 6.0,
                 clr_step: int = 2000, lr_drop: float = 0.5,
                 lr_dropstep: int = 2000,
                 class_weights=None):
        self.model = model
        if schedule == 'clr':
            sched = schedules.cyclic_lr(lr, lr * clr_max_mult, clr_step)
        elif schedule == 'step':
            sched = schedules.step_decay(lr, lr_drop, lr_dropstep)
        else:
            sched = lr
        self.tx = schedules.sgd_nesterov(sched, momentum)
        self.class_weights = (None if class_weights is None
                              else jnp.asarray(class_weights))

    def init(self, rng, sample_images):
        variables = self.model.init(rng, sample_images, train=True)
        params = variables['params']
        rest = {k: v for k, v in variables.items() if k != 'params'}
        return params, rest, self.tx.init(params)

    def train_step(self, params, model_state, opt_state, images, targets,
                   dropout_rng):
        """One SGD step. All-array signature so it jits/shards cleanly."""

        def loss_fn(p):
            mutable = list(model_state.keys())
            out = self.model.apply(
                {'params': p, **model_state}, images, train=True,
                rngs={'dropout': dropout_rng},
                mutable=mutable or False, method='logits')
            logits, updates = out if mutable else (out, {})
            scores = jax.nn.sigmoid(logits)
            l = bce_loss(logits, targets, self.class_weights)
            return l, (updates if model_state else {}, scores)

        (loss, (updates, scores)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        metrics = {'loss': loss, 'f1': batch_f1(targets, scores)}
        return params, (updates or model_state), opt_state, metrics

    def jitted_step(self):
        return jax.jit(self.train_step)

    def eval_scores(self, params, model_state, images):
        scores, _ = self.model.apply({'params': params, **model_state},
                                     images)
        return scores
