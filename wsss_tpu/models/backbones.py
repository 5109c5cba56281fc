"""Classifier backbones: VGG16 (IRNet cfg) and M7 / X1.7 HistoNet.

TPU-first flax re-designs of the reference CNNs:
  * VGG16:  03b_irn/net/vgg16.py:6-47 — cfg
    [[64,64,M],[128,128,M],[256,256,256,M],[512]*6,[1024,D,1024,D]],
    GAP -> Linear -> sigmoid multi-label head.
  * M7:     03b_irn/net/m7.py:6-43 — cfg [[64,64,M],[128,128,M],
    [256,256,256],[M,D]], AdaptiveMaxPool -> Linear -> sigmoid.
  * X1.7:   same trunk as M7 with a 51-way head
    (03b_irn/net/m7_cam.py:16-18).

Layout is NHWC (TPU-native), compute dtype configurable (bfloat16 by
default on TPU; params stay float32).  The reference's layer order inside a
stage is conv -> ReLU -> BN ("reversed", common_cnn.py:136-138) and is kept
for legacy-weight import compatibility.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

VGG16_CFG: Tuple[Tuple[Any, ...], ...] = (
    (64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M'),
    (512, 512, 512, 512, 512, 512), (1024, 'D', 1024, 'D'))
M7_CFG: Tuple[Tuple[Any, ...], ...] = (
    (64, 64, 'M'), (128, 128, 'M'), (256, 256, 256), ('M', 'D'))


class VGGStage(nn.Module):
    """One cfg stage: 3x3 convs (+ReLU, optional BN), 'M' pools, 'D' drops."""
    cfg: Sequence[Any]
    batchnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for v in self.cfg:
            if v == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif v == 'D':
                x = nn.Dropout(0.5, deterministic=not train)(x)
            else:
                x = nn.Conv(int(v), (3, 3), padding='SAME',
                            dtype=self.dtype)(x)
                x = nn.relu(x)
                if self.batchnorm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.99, epsilon=1e-3,
                                     dtype=self.dtype)(x)
        return x


class VGG16Backbone(nn.Module):
    """Five-stage VGG16 trunk; returns all stage outputs (IRNet needs them).

    Stage strides: 1,2,4,8,8 relative to input (last two stages share the
    /8 grid because cfg stages 4-5 have no 'M').
    """
    batchnorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = []
        for i, cfg in enumerate(VGG16_CFG):
            x = VGGStage(cfg, batchnorm=self.batchnorm, dtype=self.dtype,
                         name=f'layer{i + 1}')(x, train=train)
            feats.append(x)
        return feats


class VGG16Classifier(nn.Module):
    """Multi-label VGG16 classifier (03b_irn/net/vgg16.py:16-31).

    ``__call__`` returns (scores, feats) where scores are post-sigmoid
    multi-label probabilities and feats is the final conv activation map
    (B, H/8, W/8, 1024) used by CAM/Grad-CAM.
    """
    num_classes: int
    batchnorm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = VGG16Backbone(batchnorm=self.batchnorm,
                                      dtype=self.dtype)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, x, *, train: bool = False):
        feats = self.backbone(x, train=train)[-1]
        pooled = jnp.mean(feats, axis=(1, 2))
        logits = self.head(pooled).astype(jnp.float32)
        return nn.sigmoid(logits), feats

    def logits(self, x, *, train: bool = False):
        feats = self.backbone(x, train=train)[-1]
        return self.head(jnp.mean(feats, axis=(1, 2))).astype(jnp.float32)


class M7Classifier(nn.Module):
    """M7 / X1.7 HistoNet (03b_irn/net/m7.py:6-43).

    feats (for Grad-CAM) is the *layer3_p1* activation — the output of the
    final conv before the trailing maxpool+dropout stage, matching the
    Keras "activation after last Conv2D" convention
    (02_cues/utilities.py:42-58, m7_cam.py:25-48).
    """
    num_classes: int
    batchnorm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.layer1 = VGGStage(M7_CFG[0], batchnorm=self.batchnorm,
                               dtype=self.dtype)
        self.layer2 = VGGStage(M7_CFG[1], batchnorm=self.batchnorm,
                               dtype=self.dtype)
        self.layer3_p1 = VGGStage(M7_CFG[2], batchnorm=self.batchnorm,
                                  dtype=self.dtype)
        self.dropout = nn.Dropout(0.5)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def _trunk(self, x, train):
        x = self.layer1(x, train=train)
        x = self.layer2(x, train=train)
        return self.layer3_p1(x, train=train)

    def __call__(self, x, *, train: bool = False):
        feats = self._trunk(x, train)
        # layer3_p2 = ['M', 'D'] then AdaptiveMaxPool2d((1,1)): the global
        # max subsumes the intermediate 2x2 maxpool, so pool once.
        y = jnp.max(feats, axis=(1, 2))
        y = self.dropout(y, deterministic=not train)
        logits = self.head(y).astype(jnp.float32)
        return nn.sigmoid(logits), feats

    def logits(self, x, *, train: bool = False):
        feats = self._trunk(x, train)
        y = jnp.max(feats, axis=(1, 2))
        y = self.dropout(y, deterministic=not train)
        return self.head(y).astype(jnp.float32)


# The M1-M6 "vgg16_experimental" variants (01_train/demo.py:24) come from
# the missing model_loader module; their exact definitions are
# unrecoverable from the checkout.  This family is re-derived as
# progressively truncated/narrowed VGG trunks with the M7 endpoint exactly
# matching the recovered definition (03b_irn/net/m7.py:41).
M_VARIANT_CFGS = {
    'M1': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M'),
           (512, 512, 512, 'M'), (512, 512, 512)),
    'M2': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M'),
           (512, 512, 512, 'M')),
    'M3': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M'),
           (512, 512, 512)),
    'M4': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M'),
           (384, 384)),
    'M5': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 256, 'M')),
    'M6': ((64, 64, 'M'), (128, 128, 'M'), (256, 256, 384)),
    'M7': M7_CFG[:3],
}


class MVariantClassifier(nn.Module):
    """Generalized HistoNet M-variant: VGG stages + global-max head."""
    cfg: Tuple[Tuple[Any, ...], ...]
    num_classes: int
    batchnorm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.stages = [VGGStage(c, batchnorm=self.batchnorm,
                                dtype=self.dtype) for c in self.cfg]
        self.dropout = nn.Dropout(0.5)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def _trunk(self, x, train):
        for s in self.stages:
            x = s(x, train=train)
        return x

    def __call__(self, x, *, train: bool = False):
        feats = self._trunk(x, train)
        y = self.dropout(jnp.max(feats, axis=(1, 2)),
                         deterministic=not train)
        logits = self.head(y).astype(jnp.float32)
        return nn.sigmoid(logits), feats

    def logits(self, x, *, train: bool = False):
        feats = self._trunk(x, train)
        y = self.dropout(jnp.max(feats, axis=(1, 2)),
                         deterministic=not train)
        return self.head(y).astype(jnp.float32)


def infer_dtype() -> Dtype:
    """Compute dtype for INFERENCE-ONLY model builds (params stay f32):
    bfloat16 on the TPU backend — the conv stage then runs at the MXU's
    bf16 rate (~2x f32; CAM-label agreement vs f32 measured 1.0 at the
    bench config on v5e, BENCH_STAGES.json cam_bf16_label_agree) —
    float32 elsewhere.  WSSS_TPU_NO_BF16_INFER=1 is the kill switch;
    WSSS_TPU_BF16_INFER=1 forces bf16 regardless of backend.
    Training paths must NOT use this: they build with the f32 default
    (the reference trains f32 end to end, 01_train/demo.py:21-127)."""
    import os
    if os.environ.get('WSSS_TPU_NO_BF16_INFER'):
        return jnp.float32
    if os.environ.get('WSSS_TPU_BF16_INFER'):
        return jnp.bfloat16
    import jax
    return (jnp.bfloat16 if jax.default_backend() == 'tpu'
            else jnp.float32)


def build_classifier(model_type: str, num_classes: int,
                     dtype: Dtype = None, batchnorm: bool = True):
    """Factory matching the reference's model tags
    (01_train/demo.py:24): 'VGG16'/'VGG16fg' (no bn) / 'VGG16fg_bn',
    'M1'..'M7', 'X1.7' (= M7 trunk, 51-way head on ADP,
    03b_irn/net/m7_cam.py:16-18).

    dtype: per-layer COMPUTE dtype (params stay f32).  Defaults to f32
    (the training paths rely on this; WSSS_TPU_BF16_INFER=1 flips it for
    ad-hoc runs); inference handles pass dtype=infer_dtype(), which is
    bf16 on TPU by default.
    """
    if dtype is None:
        import os
        dtype = (jnp.bfloat16 if os.environ.get('WSSS_TPU_BF16_INFER')
                 else jnp.float32)
    mt = model_type.upper()
    if mt.startswith('VGG16'):
        bn = batchnorm if mt in ('VGG16', 'VGG16FG_BN') else False
        if mt == 'VGG16FG_BN':
            bn = True
        return VGG16Classifier(num_classes=num_classes, dtype=dtype,
                               batchnorm=bn)
    if mt in ('M7', 'X1.7'):
        return M7Classifier(num_classes=num_classes, dtype=dtype,
                            batchnorm=batchnorm)
    if mt in M_VARIANT_CFGS:
        return MVariantClassifier(cfg=M_VARIANT_CFGS[mt],
                                  num_classes=num_classes, dtype=dtype,
                                  batchnorm=batchnorm)
    raise ValueError(f'unknown model_type {model_type!r}')
