"""SEC/DSRG losses + training step on tiny synthetic problems."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wsss_tpu.methods import dsrg, sec
from wsss_tpu.models.deeplab import sp_softmax
from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.train.sec_dsrg import (MULTIPLIERS, SECDSRGTrainer,
                                     lr_multiplier_label)

CFG = CRFConfig(0.25, 3, 6.67, 13, 10, iterations=2)


def _toy(b=2, s=9, c=4, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(0, 1, (b, s, s, c)).astype(np.float32))
    cues = np.zeros((b, s, s, c), np.float32)
    cues[:, :3, :3, 1] = 1
    cues[:, 5:, 5:, 0] = 1
    labels = np.zeros((b, c), np.float32)
    labels[:, 0] = 1
    labels[:, 1] = 1
    imgs = jnp.asarray(rng.uniform(0, 255, (b, 72, 72, 3)).astype(
        np.float32))
    return logits, jnp.asarray(cues), jnp.asarray(labels), imgs


def test_seed_loss_perfect_prediction_low():
    logits, cues, labels, imgs = _toy()
    # logits aligned with cues -> lower seed loss than misaligned
    aligned = jnp.where(cues > 0, 10.0, 0.0) + logits * 0
    l_good = float(sec.seed_loss(sp_softmax(aligned), cues))
    l_bad = float(sec.seed_loss(sp_softmax(-aligned), cues))
    assert l_good < l_bad


def test_expand_loss_prefers_present_classes():
    logits, cues, labels, imgs = _toy()
    present = jnp.zeros_like(logits).at[..., 1].set(5.0)
    absent = jnp.zeros_like(logits).at[..., 2].set(5.0)
    l_present = float(sec.expand_loss(sp_softmax(present), labels))
    l_absent = float(sec.expand_loss(sp_softmax(absent), labels))
    assert l_present < l_absent


def test_constrain_loss_zero_at_fixed_point():
    logits, cues, labels, imgs = _toy()
    sm = sp_softmax(logits)
    kl_self = float(sec.constrain_loss(sm, jnp.log(sm)))
    assert abs(kl_self) < 1e-5


def test_sec_losses_finite_and_decrease_under_training():
    trainer = SECDSRGTrainer('SEC', 'VOC2012', num_classes=4,
                             base_lr=5e-3, crf_cfg=CFG)
    rng = np.random.default_rng(1)
    imgs_raw = jnp.asarray(rng.uniform(0, 255, (2, 72, 72, 3)).astype(
        np.float32))
    imgs_norm = imgs_raw / 255. - 0.5
    _, cues, labels, _ = _toy()
    params, opt_state = trainer.init(jax.random.PRNGKey(0), imgs_norm)
    step = trainer.jitted_step()
    losses = []
    for i in range(6):
        params, opt_state, parts = step(
            params, opt_state, imgs_norm, imgs_raw, cues, labels,
            jax.random.PRNGKey(i))
        losses.append(float(parts['total']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_dsrg_losses_and_training_step():
    trainer = SECDSRGTrainer('DSRG', 'VOC2012', num_classes=4,
                             base_lr=5e-3, crf_cfg=CFG)
    rng = np.random.default_rng(2)
    imgs_raw = jnp.asarray(rng.uniform(0, 255, (2, 72, 72, 3)).astype(
        np.float32))
    imgs_norm = imgs_raw / 255. - 0.5
    _, cues, labels, _ = _toy()
    params, opt_state = trainer.init(jax.random.PRNGKey(0), imgs_norm)
    step = trainer.jitted_step()
    losses = []
    for i in range(6):
        params, opt_state, parts = step(
            params, opt_state, imgs_norm, imgs_raw, cues, labels,
            jax.random.PRNGKey(i))
        losses.append(float(parts['total']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_lr_multiplier_labels():
    trainer = SECDSRGTrainer('SEC', 'VOC2012', num_classes=3, crf_cfg=CFG)
    params, _ = trainer.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 72, 72, 3)))
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: lr_multiplier_label(p), params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    lab = {'/'.join(getattr(k, 'key', str(k)) for k in path): v
           for path, v in flat}
    assert lab['head/fc8/kernel'] == 'final_kernel'
    assert lab['head/fc8/bias'] == 'final_bias'
    assert lab['trunk/conv1_1/kernel'] == 'kernel'
    assert lab['trunk/conv1_1/bias'] == 'bias'
    assert set(MULTIPLIERS) == {'kernel', 'bias', 'final_kernel',
                                'final_bias'}


def test_dsrg_grows_cues_in_step():
    """The region-growing path must be active inside the DSRG loss."""
    _, cues, labels, imgs = _toy()
    # logits that strongly predict class 1 everywhere -> growth from seeds
    logits = jnp.zeros((2, 9, 9, 4)).at[..., 1].set(8.0)
    total, parts = dsrg.dsrg_losses(logits, cues, labels, imgs, CFG)
    assert float(parts['grown_px']) > 0
