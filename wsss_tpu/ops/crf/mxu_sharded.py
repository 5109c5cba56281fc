"""Multi-chip MXU-grid mean field: image rows banded over the mesh.

The reference downsamples DeepGlobe 2448^2 images before every pairwise
step because one GPU cannot hold them (cam_to_ir_label.py:61,
make_sem_seg_labels.py:101-104).  The TPU-native answer shards the
pixel rows over the mesh instead: the bilateral-grid kernel's spatial
reach is bounded (blur radius 2 cells + bilinear splat/slice 1 cell =
3 tiles of ``sxy`` rows), so each chip owns a band of tile rows plus a
halo refreshed once per mean-field iteration with a `ppermute` over ICI
— no host round trips, full resolution.

The halo is 2x the kernel reach (6 tiles): output rows need correct
``n*Q`` up to reach R, and the symmetric normalizer at a contributing
row needs another R of context.  Each shard builds its own
:class:`~wsss_tpu.ops.crf.mxu_grid.MXUBilateralGrid` on the extended
band (static shapes), so the Pallas splat/slice kernels run unchanged
per shard.

This complements ops/crf/sharded.py, which shards the exact *windowed*
structure; here the *grid* structure (large sxy, e.g. the sxy=40
HSN/SEC inference configs) becomes multi-chip as well.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wsss_tpu.ops.crf import mxu_grid as _mxu
from wsss_tpu.ops.crf.meanfield import _gaussian_filter_raw

Array = jax.Array


def _halo_px(sxy: float, require8: bool = True) -> tuple:
    """(cell t, halo pixels): halo = 2 x kernel reach, where reach =
    (spatial blur radius + 1 bilinear cell) tiles of t px.  Tracks
    mxu_grid's sub-cell spatial sampling (cell = sxy/k)."""
    import numpy as np
    t, k = _mxu._spatial_cell(sxy, require8)
    rad = max(2, int(np.ceil(3.0 * np.sqrt(k * k - 1.0 / 3.0))))
    return t, 2 * (rad + 1) * t


def _exchange_rows(x: Array, halo: int, axis_name: str) -> Array:
    """[rows, ...] -> [halo + rows + halo, ...] with neighbor rows over
    `ppermute`; edge shards receive zeros (image-border zero-pad)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:halo]
    bot = x[-halo:]
    from_up = jax.lax.ppermute(bot, axis_name,
                               [(i, i + 1) for i in range(n - 1)])
    from_down = jax.lax.ppermute(top, axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    from_up = jnp.where(idx > 0, from_up, jnp.zeros_like(from_up))
    from_down = jnp.where(idx < n - 1, from_down,
                          jnp.zeros_like(from_down))
    return jnp.concatenate([from_up, x, from_down], axis=0)


def mean_field_sharded(probs: Array, img: Array, config, mesh: Mesh,
                       axis: str = 'data',
                       exclude_self: bool = True,
                       interpret: Optional[bool] = None) -> Array:
    """Mean field on ONE full-resolution image with rows sharded over
    `mesh` axis `axis`.  probs: [H,W,C], img: [H,W,3].

    Requires an MXU-grid-applicable bilateral config (integer sxy etc.)
    and a band of at least ``6 * sxy`` rows per shard.
    """
    h, w = probs.shape[:2]
    c = probs.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if not _mxu.applicable(config.bi_sxy, config.bi_srgb, c,
                           require8=not interpret):
        raise ValueError('config not MXU-grid applicable')
    t, halo = _halo_px(config.bi_sxy, require8=not interpret)
    ndev = mesh.shape[axis]
    hp = -(-h // (ndev * t)) * (ndev * t)
    rows = hp // ndev
    if rows < halo:
        raise ValueError(
            f'{rows} rows/shard < halo {halo}; use fewer shards')

    probs = jnp.pad(probs.astype(jnp.float32),
                    ((0, hp - h), (0, 0), (0, 0)))
    img = jnp.pad(img.astype(jnp.float32), ((0, hp - h), (0, 0), (0, 0)))
    valid = jnp.pad(jnp.ones((h, w, 1), jnp.float32),
                    ((0, hp - h), (0, 0), (0, 0)))

    cfg_kw = dict(g_sxy=config.g_sxy, g_compat=config.g_compat,
                  bi_sxy=config.bi_sxy, bi_srgb=config.bi_srgb,
                  bi_compat=config.bi_compat,
                  iterations=config.iterations)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False)  # pallas_call out_shapes carry no vma info
    def run(p_loc, i_loc, v_loc):
        # static geometry: exchange guide image + validity once
        img_e = _exchange_rows(i_loc, halo, axis)
        v_e = _exchange_rows(v_loc, halo, axis)
        u_e = _exchange_rows(
            -jnp.log(jnp.clip(p_loc, 1e-10, None)), halo, axis)
        grid = _mxu.MXUBilateralGrid(img_e[None], cfg_kw['bi_sxy'],
                                     cfg_kw['bi_srgb'], c,
                                     interpret=interpret)
        n_b = jax.lax.rsqrt(jnp.maximum(
            grid.filter(v_e[None]), 1e-20))          # [1, rows+2h, w, 1]
        if cfg_kw['g_compat']:
            n_g = jax.lax.rsqrt(jnp.maximum(
                _gaussian_filter_raw(v_e, cfg_kw['g_sxy']), 1e-20))

        q_loc = jax.nn.softmax(
            -u_e[halo:halo + rows]
            + jnp.max(u_e[halo:halo + rows], -1, keepdims=True), -1)

        def body(_, q_loc):
            q_e = _exchange_rows(q_loc, halo, axis)
            # mask message INPUTS by validity: padded rows (h not a
            # multiple of ndev*t) must not emit messages into valid
            # rows — the unsharded path excludes padding entirely
            # (normalizers alone only fix the denominator).
            msg = 0.
            if cfg_kw['g_compat']:
                # bf16 operands to match _mean_field_mxu's gaussian
                # (the parity test compares the two paths at atol 2e-2)
                m = n_g * _gaussian_filter_raw(n_g * q_e * v_e,
                                               cfg_kw['g_sxy'],
                                               dtype=jnp.bfloat16)
                if exclude_self:
                    m = m - (n_g * n_g) * q_e
                msg = msg + cfg_kw['g_compat'] * m
            m = (n_b * grid.filter(n_b * q_e * v_e))[0]
            if exclude_self:
                m = m - ((n_b * n_b) * q_e[None])[0]
            msg = msg + cfg_kw['bi_compat'] * m
            q_new = jax.nn.softmax(-u_e + msg, axis=-1)
            return q_new[halo:halo + rows]

        # python loop: iteration count is tiny and static; fori_loop
        # would also work (shapes are invariant)
        for it in range(cfg_kw['iterations']):
            q_loc = body(it, q_loc)
        return q_loc

    out = run(probs, img, valid)
    return out[:h]
