"""DeepLab-LargeFOV / ASPP trunks for SEC and DSRG.

Re-designs of the layer-by-layer TF1 graphs at 03a_sec-dsrg/SEC.py:101-230
(LargeFOV: atrous conv5 rate 2, pool4/5 stride 1, pool5a avg 3x3/1,
fc6 atrous rate 12 -> fc7 1x1 -> fc8 1x1 -> softmax+min_prob) and
03a_sec-dsrg/DSRG.py:152-281 (same trunk, four-branch ASPP fc6-fc8 at
dilation rates 6/12/18/24, branch outputs summed).

The 321x321 input maps to a 41x41 output grid (stride 8 with SAME 3x3/2
pools), matching the reference's seed_size=41 (03a model.py:35).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

MIN_PROB = 1e-4  # SEC.py:40


def _pool(x, window, stride, kind='max'):
    fn = nn.max_pool if kind == 'max' else nn.avg_pool
    return fn(x, (window, window), strides=(stride, stride), padding='SAME')


class DeepLabTrunk(nn.Module):
    """conv1..conv5 of the DeepLab-VGG16 trunk (SEC.py:116-121).

    pools 1-3: 3x3 stride 2; pools 4-5: 3x3 stride 1; conv5 convs use
    dilation rate 2; followed by pool5a 3x3 stride-1 avg pool.
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = [  # (n_convs, width, pool_stride, dilation)
            (2, 64, 2, 1), (2, 128, 2, 1), (3, 256, 2, 1),
            (3, 512, 1, 1), (3, 512, 1, 2)]
        for stage, (n, w, ps, dil) in enumerate(cfg, start=1):
            for i in range(n):
                x = nn.Conv(w, (3, 3), padding='SAME',
                            kernel_dilation=(dil, dil), dtype=self.dtype,
                            name=f'conv{stage}_{i + 1}')(x)
                x = nn.relu(x)
            x = _pool(x, 3, ps, 'max')
        x = _pool(x, 3, 1, 'avg')  # pool5a
        return x


class LargeFOVHead(nn.Module):
    """fc6 (3x3 atrous rate 12, 1024) -> fc7 (1x1,1024) -> fc8 (1x1,C)."""
    num_classes: int
    dilation: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(1024, (3, 3), padding='SAME',
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype, name='fc6')(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name='fc7')(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name='fc8')(x)
        return x


class SECNet(nn.Module):
    """DeepLab-LargeFOV FCN used by SEC (SEC.py:101-130)."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = DeepLabTrunk(dtype=self.dtype, name='trunk')(x)
        logits = LargeFOVHead(self.num_classes, dtype=self.dtype,
                              name='head')(x, train=train)
        return logits.astype(jnp.float32)


class DSRGNet(nn.Module):
    """DeepLab-ASPP FCN used by DSRG (DSRG.py:152-180): four LargeFOV
    branches at dilation 6/12/18/24, summed."""
    num_classes: int
    rates: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = DeepLabTrunk(dtype=self.dtype, name='trunk')(x)
        out = 0.
        for r in self.rates:
            out = out + LargeFOVHead(self.num_classes, dilation=r,
                                     dtype=self.dtype,
                                     name=f'branch{r}')(x, train=train)
        return out.astype(jnp.float32)


def sp_softmax(logits):
    """Softmax with min_prob floor + renormalize (SEC.py:232-250)."""
    sm = nn.softmax(logits, axis=-1) + MIN_PROB
    return sm / jnp.sum(sm, axis=-1, keepdims=True)
