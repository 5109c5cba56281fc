"""Spatially-sharded dense-CRF mean field: rows across chips, halo
exchange over ICI.

The reference handles DeepGlobe's 2448x2448 images by *downsampling*
before every pairwise step (x4 before CRF, cam_to_ir_label.py:61; x6
before the random walk, make_sem_seg_labels.py:101-104) because one GPU
cannot hold the pixel-pair computation.  The TPU-native answer
(SURVEY.md §5.7-5.8) keeps full resolution and shards the pixel grid's
rows over the mesh: both the spatial Gaussian and the windowed bilateral
kernel only couple pixels within a fixed radius, so each chip needs just
`halo` rows from its neighbors per mean-field iteration — a ppermute
exchange over ICI, no host round trips.

Limitations: uses the exact windowed-bilateral structure (radius
3*bi_sxy), i.e. the configs whose window is tractable; the bilateral-grid
structure is global in color and is not sharded here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wsss_tpu.ops.crf.meanfield import _blur_kernel1d  # noqa: F401 (doc)

Array = jax.Array


def _exchange_halo(x: Array, halo: int, axis_name: str) -> Array:
    """Concatenate neighbor halo rows: [rows, ...] -> [halo+rows+halo, ...].

    Edge shards receive zero rows (zero-pad semantics at image borders).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:halo]          # rows my lower neighbor needs
    bot = x[-halo:]         # rows my upper neighbor needs
    # send bottom rows down (to idx+1), top rows up (to idx-1)
    from_up = jax.lax.ppermute(bot, axis_name,
                               [(i, i + 1) for i in range(n - 1)])
    from_down = jax.lax.ppermute(top, axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    from_up = jnp.where(idx > 0, from_up, jnp.zeros_like(from_up))
    from_down = jnp.where(idx < n - 1, from_down,
                          jnp.zeros_like(from_down))
    return jnp.concatenate([from_up, x, from_down], axis=0)


def _shift2d_padded(x, dy, dx):
    """Shift with zero fill on the (already halo-extended) array."""
    h, w = x.shape[:2]
    padded = jnp.pad(x, ((abs(dy), abs(dy)), (abs(dx), abs(dx)), (0, 0)))
    return jax.lax.dynamic_slice(padded, (abs(dy) + dy, abs(dx) + dx, 0),
                                 x.shape)


def _windowed_message(Q_h, img_h, ones_h, offs, wspace, srgb,
                      halo, exclude_self):
    """Symmetric-normalized bilateral message on halo-extended arrays.
    Q_h/img_h: [halo+rows+halo, W, C/3]; returns interior rows only."""

    def raw(x):
        out = jnp.zeros_like(x)
        for (dy, dx), ws in zip(offs, wspace):
            shifted_img = _shift2d_padded(img_h, dy, dx)
            dI2 = jnp.sum((img_h - shifted_img) ** 2, axis=-1)
            valid = _shift2d_padded(ones_h, dy, dx)[..., 0]
            wm = ws * jnp.exp(-0.5 * dI2 / (srgb * srgb)) * valid
            out = out + wm[..., None] * _shift2d_padded(x, dy, dx)
        return out

    n = jax.lax.rsqrt(jnp.maximum(raw(ones_h), 1e-20))
    out = n * raw(n * Q_h)
    if exclude_self:
        out = out - n * n * Q_h
    return out[halo:-halo]


def mean_field_sharded(probs: Array, img: Array, config, mesh: Mesh,
                       axis: str = 'data',
                       exclude_self: bool = True) -> Array:
    """Full-resolution mean field with image rows sharded over `axis`.

    probs: [H,W,C]; img: [H,W,3].  H must divide the axis size.  Uses the
    exact windowed bilateral (radius 3*bi_sxy) + windowed Gaussian; one
    halo exchange per filter application.
    """
    h, w, c = probs.shape
    nsh = mesh.shape[axis]
    assert h % nsh == 0, f'H={h} must divide mesh axis {axis}={nsh}'
    r_b = int(np.ceil(3.0 * config.bi_sxy))
    r_g = max(1, int(np.ceil(4.0 * config.g_sxy)))
    # 2x the kernel radius: symmetric normalization needs accurate
    # n_j = 1/sqrt(K 1)_j for every neighbor j of an interior pixel, and
    # n_j itself reads one radius further out.
    halo = 2 * max(r_b, r_g)
    assert halo <= h // nsh, (
        f'halo {halo} exceeds shard height {h // nsh}; use fewer shards')

    offs, wspace = [], []
    for dy in range(-r_b, r_b + 1):
        for dx in range(-r_b, r_b + 1):
            d2 = dy * dy + dx * dx
            if d2 <= (3.0 * config.bi_sxy) ** 2:
                offs.append((dy, dx))
                wspace.append(float(np.exp(
                    -0.5 * d2 / (config.bi_sxy ** 2))))
    kg = jnp.asarray(np.exp(
        -0.5 * (np.arange(-r_g, r_g + 1) / config.g_sxy) ** 2
    ).astype(np.float32))

    def shard_fn(probs_s, img_s):
        U = -jnp.log(jnp.clip(probs_s, 1e-10, None))
        Q = jax.nn.softmax(-U, axis=-1)
        ones = jnp.ones(probs_s.shape[:2] + (1,), jnp.float32)

        def gaussian_msg(Qx):
            Q_h = _exchange_halo(Qx, halo, axis)
            o_h = _exchange_halo(ones, halo, axis)

            def raw(x):
                n0 = x.shape[0]
                p = jnp.pad(x, ((r_g, r_g), (r_g, r_g), (0, 0)))
                o = 0.
                for i in range(2 * r_g + 1):
                    o = o + kg[i] * jax.lax.dynamic_slice_in_dim(
                        p, i, n0, 0)
                p2 = o
                o = 0.
                for i in range(2 * r_g + 1):
                    o = o + kg[i] * jax.lax.dynamic_slice_in_dim(
                        p2, i, x.shape[1], 1)
                return o

            n = jax.lax.rsqrt(jnp.maximum(raw(o_h), 1e-20))
            out = n * raw(n * Q_h)
            if exclude_self:
                out = out - n * n * Q_h
            return out[halo:-halo]

        def bilateral_msg(Qx):
            Q_h = _exchange_halo(Qx, halo, axis)
            img_h = _exchange_halo(img_s, halo, axis)
            o_h = _exchange_halo(ones, halo, axis)
            return _windowed_message(Q_h, img_h, o_h, offs, wspace,
                                     config.bi_srgb, halo, exclude_self)

        def body(_, Qc):
            msg = 0.
            if config.g_compat:
                msg = msg + config.g_compat * gaussian_msg(Qc)
            if config.bi_compat:
                msg = msg + config.bi_compat * bilateral_msg(Qc)
            return jax.nn.softmax(-U + msg, axis=-1)

        return jax.lax.fori_loop(0, config.iterations, body, Q)

    from jax.experimental.shard_map import shard_map
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(axis, None, None), P(axis, None, None)),
                   out_specs=P(axis, None, None))
    probs_sh = jax.device_put(probs, NamedSharding(mesh, P(axis)))
    img_sh = jax.device_put(img.astype(jnp.float32),
                            NamedSharding(mesh, P(axis)))
    return jax.jit(fn)(probs_sh, img_sh)
