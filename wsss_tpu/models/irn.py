"""IRNet: class-boundary (edge) + displacement-field heads on a frozen
VGG16/M7 trunk.

Re-design of 03b_irn/net/vgg16_irn.py:7-229 (ds_fac=0.25 branch) and
03b_irn/net/m7_irn.py:7-120.  The trunk stages are frozen (torch
``.detach()`` at vgg16_irn.py:192-196); here that is expressed functionally
with ``jax.lax.stop_gradient`` — idiomatic JAX, exactly equivalent.

The MeanShift buffer (vgg16_irn.py:180-189) — displacement means calibrated
after training (train_irn.py:152-165) — is a plain array threaded through
inference, not module state.

Grids: VGG16 — edge and disp both on the /4 grid.  M7 — edge on /2, disp
on /4 (both later resized onto the CAM grid by the random walk step,
make_sem_seg_labels.py:67-69).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from wsss_tpu.models.backbones import VGG16Backbone, VGGStage, M7_CFG


def _up(x, factor):
    if factor == 1:
        return x
    return jax.image.resize(
        x, (x.shape[0], x.shape[1] * factor, x.shape[2] * factor,
            x.shape[3]), method='bilinear')


class _GNConv(nn.Module):
    """1x1 conv (no bias) -> GroupNorm -> upsample -> ReLU unit used by all
    IRN head blocks (vgg16_irn.py:31-99)."""
    width: int
    groups: int
    stride: int = 1
    up: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
        x = _up(x, self.up)
        return nn.relu(x)


def _crop_cat(maps):
    h = min(m.shape[1] for m in maps)
    w = min(m.shape[2] for m in maps)
    return jnp.concatenate([m[:, :h, :w] for m in maps], axis=-1)


class M7Stages(nn.Module):
    """M7 trunk as IRNet stages (m7_irn.py:19-22): stage1 = layer1 (incl.
    pool, /2), stage2 = layer2 (/4), stage3 = layer3_p1 + 2x2 pool (/8)."""
    batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s1 = VGGStage(M7_CFG[0], batchnorm=self.batchnorm, dtype=self.dtype,
                      name='layer1')(x, train=train)
        s2 = VGGStage(M7_CFG[1], batchnorm=self.batchnorm, dtype=self.dtype,
                      name='layer2')(s1, train=train)
        s3 = VGGStage(M7_CFG[2], batchnorm=self.batchnorm, dtype=self.dtype,
                      name='layer3_p1')(s2, train=train)
        s3 = nn.max_pool(s3, (2, 2), strides=(2, 2))  # layer3_p2's 'M'
        return [s1, s2, s3]


class IRNet(nn.Module):
    """Edge + displacement net.

    __call__(x) -> (edge_logits [B,h_e,w_e,1], disp [B,h_d,w_d,2]).
    Backbone activations are stop_gradient-ed: only the heads train
    (vgg16_irn.py:192-196,216-223).
    """
    backbone: str = 'vgg16'   # 'vgg16' | 'm7'
    batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        if self.backbone == 'vgg16':
            feats = VGG16Backbone(batchnorm=self.batchnorm, dtype=dt,
                                  name='trunk')(x, train=False)
            feats = [jax.lax.stop_gradient(f) for f in feats]
            x1, x2, x3, x4, x5 = feats
            # --- edge branch (vgg16_irn.py:31-59): all on /4 grid
            e = [_GNConv(32, 4, stride=2, dtype=dt, name='fc_edge1')(x1),
                 _GNConv(32, 4, dtype=dt, name='fc_edge2')(x2),
                 _GNConv(32, 4, up=2, dtype=dt, name='fc_edge3')(x3),
                 _GNConv(32, 4, up=2, dtype=dt, name='fc_edge4')(x4),
                 _GNConv(32, 4, up=2, dtype=dt, name='fc_edge5')(x5)]
            edge = nn.Conv(1, (1, 1), use_bias=True, dtype=dt,
                           name='fc_edge6')(_crop_cat(e))
            # --- displacement branch (vgg16_irn.py:62-99)
            dp1 = _GNConv(64, 8, stride=2, dtype=dt, name='fc_dp1')(x1)
            dp2 = _GNConv(128, 16, dtype=dt, name='fc_dp2')(x2)
            dp3 = _GNConv(256, 16, dtype=dt, name='fc_dp3')(x3)
            dp4 = _GNConv(256, 16, dtype=dt, name='fc_dp4')(x4)
            dp5 = _GNConv(256, 16, dtype=dt, name='fc_dp5')(x5)
            up3 = _GNConv(256, 16, up=2, dtype=dt,
                          name='fc_dp6')(_crop_cat([dp3, dp4, dp5]))
            h = _GNConv(256, 16, dtype=dt,
                        name='fc_dp7a')(_crop_cat([dp1, dp2, up3]))
            disp = nn.Conv(2, (1, 1), use_bias=False, dtype=dt,
                           name='fc_dp7b')(h)
        elif self.backbone == 'resnet50':
            # resnet50_irn.py:7-137 — legacy variant (dead in the
            # reference's dispatch, func_sample.py:40-41, kept for
            # inventory parity).  Stages: stem /4 (64ch), layer1 /4
            # (256), layer2 /8 (512), layer3 /16 (1024), layer4 /16
            # (2048, stride-1 last stage, strides=[2,2,2,1]).
            from wsss_tpu.models.resnet50 import ResNet50
            feats = ResNet50(strides=(2, 2, 2, 1),
                             dilations=(1, 1, 1, 1), dtype=dt,
                             name='trunk')(x)
            feats = [jax.lax.stop_gradient(f) for f in feats]
            x1, x2, x3, x4, x5 = feats
            # --- edge branch (resnet50_irn.py:23-51): /4 grid
            e = [_GNConv(32, 4, dtype=dt, name='fc_edge1')(x1),
                 _GNConv(32, 4, dtype=dt, name='fc_edge2')(x2),
                 _GNConv(32, 4, up=2, dtype=dt, name='fc_edge3')(x3),
                 _GNConv(32, 4, up=4, dtype=dt, name='fc_edge4')(x4),
                 _GNConv(32, 4, up=4, dtype=dt, name='fc_edge5')(x5)]
            edge = nn.Conv(1, (1, 1), use_bias=True, dtype=dt,
                           name='fc_edge6')(_crop_cat(e))
            # --- displacement branch (resnet50_irn.py:53-93): dp3-5 on
            # /8, merged up to the /4 grid
            dp1 = _GNConv(64, 8, dtype=dt, name='fc_dp1')(x1)
            dp2 = _GNConv(128, 16, dtype=dt, name='fc_dp2')(x2)
            dp3 = _GNConv(256, 16, dtype=dt, name='fc_dp3')(x3)
            dp4 = _GNConv(256, 16, up=2, dtype=dt, name='fc_dp4')(x4)
            dp5 = _GNConv(256, 16, up=2, dtype=dt, name='fc_dp5')(x5)
            up3 = _GNConv(256, 16, up=2, dtype=dt,
                          name='fc_dp6')(_crop_cat([dp3, dp4, dp5]))
            h = _GNConv(256, 16, dtype=dt,
                        name='fc_dp7a')(_crop_cat([dp1, dp2, up3]))
            disp = nn.Conv(2, (1, 1), use_bias=False, dtype=dt,
                           name='fc_dp7b')(h)
        elif self.backbone == 'm7':
            feats = M7Stages(batchnorm=self.batchnorm, dtype=dt,
                             name='trunk')(x, train=False)
            feats = [jax.lax.stop_gradient(f) for f in feats]
            x1, x2, x3 = feats
            # --- edge branch (m7_irn.py:26-44): /2 grid
            e = [_GNConv(32, 4, dtype=dt, name='fc_edge1')(x1),
                 _GNConv(32, 4, up=2, dtype=dt, name='fc_edge2')(x2),
                 _GNConv(32, 4, up=4, dtype=dt, name='fc_edge3')(x3)]
            edge = nn.Conv(1, (1, 1), use_bias=True, dtype=dt,
                           name='fc_edge4')(_crop_cat(e))
            # --- displacement branch (m7_irn.py:46-74): /4 grid
            dp1 = _GNConv(64, 8, stride=2, dtype=dt, name='fc_dp1')(x1)
            dp2 = _GNConv(128, 16, dtype=dt, name='fc_dp2')(x2)
            dp3 = _GNConv(256, 16, dtype=dt, name='fc_dp3')(x3)
            dp4 = _GNConv(256, 16, up=2, dtype=dt, name='fc_dp4')(dp3)
            h = _GNConv(256, 16, dtype=dt,
                        name='fc_dp5a')(_crop_cat([dp1, dp2, dp4]))
            disp = nn.Conv(2, (1, 1), use_bias=False, dtype=dt,
                           name='fc_dp5b')(h)
        else:
            raise ValueError(f'unknown backbone {self.backbone!r}')
        return edge.astype(jnp.float32), disp.astype(jnp.float32)


def edge_displacement_inference(apply_fn, variables, img, disp_mean=None,
                                flip_merge: bool = True):
    """EdgeDisplacement-style inference (vgg16_irn.py:303-321).

    Runs the net on image + horizontal flip, merges edge logits
    (sigmoid(e/2 + flip(e')/2)), and mean-shifts the displacement field by
    the calibrated ``disp_mean`` (train_irn.py:152-165).
    img: [1, H, W, 3].  Returns (edge [h,w], disp [h,w,2]).
    """
    if flip_merge:
        batch = jnp.concatenate([img, img[:, :, ::-1]], axis=0)
        edge, disp = apply_fn(variables, batch)
        edge = jax.nn.sigmoid(
            edge[0, ..., 0] / 2. + edge[1, :, ::-1, 0] / 2.)
        disp = disp[0]
    else:
        edge, disp = apply_fn(variables, img)
        edge = jax.nn.sigmoid(edge[0, ..., 0])
        disp = disp[0]
    if disp_mean is not None:
        disp = disp - jnp.asarray(disp_mean)[None, None, :]
    return edge, disp
