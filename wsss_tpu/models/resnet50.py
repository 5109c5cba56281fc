"""ResNet50 CAM/IRN variant (legacy path of the reference, kept for
inventory parity: 03b_irn/net/resnet50.py, resnet50_cam.py, resnet50_irn.py
— dead in the reference's dispatch, func_sample.py:40-41, but part of the
surface).

Bottleneck ResNet50 with FixedBatchNorm (inference-frozen stats,
resnet50.py:11-14), stage strides (2,2,2,1) and dilation on the last stage
for the CAM variant (resnet50_cam.py:12).  The ImageNet-URL weight loading
(resnet50.py:112-118) has no network here; weights come from the legacy
bridge or training.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FixedBatchNorm(nn.Module):
    """BatchNorm that always uses stored statistics (resnet50.py:11-14)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        inv = jax.lax.rsqrt(var.value + 1e-5) * scale
        return (x - mean.value) * inv + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        h = FixedBatchNorm(self.planes)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, dtype=self.dtype)(h)
        h = FixedBatchNorm(self.planes)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = FixedBatchNorm(self.planes * 4)(h)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            residual = FixedBatchNorm(self.planes * 4,
                                      name='downsample_bn')(residual)
        return nn.relu(h + residual)


class ResNet50(nn.Module):
    """Stages with configurable strides/dilations (resnet50.py:58-76).

    Reference stride semantics (resnet50.py:61-69): strides[0] is the
    STEM conv1 stride, layer1 is always stride 1, layers 2-4 take
    strides[1:]; within a stage only the FIRST block strides and only
    the non-first blocks dilate (resnet50.py:85-88).  Returns 5 feature
    maps — stem (post-maxpool, 64ch) then layer1..layer4 — the stage
    list the IRN heads tap (resnet50_irn.py:15-19).
    """
    strides: Sequence[int] = (2, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        s0 = self.strides[0]
        h = nn.Conv(64, (7, 7), strides=(s0, s0), padding=3,
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        h = FixedBatchNorm(64, name='bn1')(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1),) * 2)
        feats = [h]                                   # stem stage1
        planes = (64, 128, 256, 512)
        stage_strides = (1,) + tuple(self.strides[1:])
        for si, (n, p, st, dil) in enumerate(zip(
                self.layers, planes, stage_strides, self.dilations)):
            for bi in range(n):
                h = Bottleneck(p, stride=st if bi == 0 else 1,
                               dilation=1 if bi == 0 else dil,
                               downsample=bi == 0,
                               dtype=self.dtype,
                               name=f'layer{si + 1}_b{bi}')(h)
            feats.append(h)
        return tuple(feats)


class ResNet50CAM(nn.Module):
    """resnet50_cam.py Net: GAP + 1x1 classifier on stage4 (2048ch); the
    CAM map is the classifier conv applied spatially."""
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet50(dtype=self.dtype)
        self.classifier = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                                  dtype=self.dtype)

    def __call__(self, x):
        feats = self.backbone(x)[-1]
        pooled = jnp.mean(feats, axis=(1, 2), keepdims=True)
        logits = self.classifier(pooled)[:, 0, 0, :]
        return logits.astype(jnp.float32)

    def cam(self, x):
        """Spatial CAM: ReLU(classifier conv over features)
        (resnet50_cam.py:46-63 CAM variant)."""
        feats = self.backbone(x)[-1]
        return nn.relu(self.classifier(feats)).astype(jnp.float32)
