"""Break down train_irn_step (38 img/s in BENCH_STAGES r4 vs 203 for the
SEC train step): time the backbone fwd/bwd against the affinity-gather
and displacement-pair machinery to find the hog.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_irn_step.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.methods import irnet
from wsss_tpu.ops import random_walk


def timeit(name, fn, n_items, iters=5):
    out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jnp.sum(jnp.asarray(leaves[0]).astype(jnp.float32))))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jnp.sum(jnp.asarray(leaves[0]).astype(jnp.float32))))
    dt = (time.time() - t0) / iters
    print(json.dumps({'metric': name, 'ms': round(dt * 1000, 2),
                      'imgs_per_sec': round(n_items / dt, 2)}), flush=True)


def main():
    size, b = 321, 8
    spec = registry.get('VOC2012')
    rng = np.random.default_rng(0)
    itr = irnet.IRNTrainer('vgg16', num_classes=spec.n_seg_classes,
                           crop_size=size, radius=10)
    pidx = itr.path_index
    grid = itr.grid
    gather_idx = pidx.path_gather_indices(grid)
    m_pairs = int(gather_idx.shape[2])
    print(json.dumps({
        'grid': grid, 'P': int(pidx.search_dst.shape[0]),
        'L': int(pidx.paths.shape[1]), 'M': m_pairs,
        'O': int(pidx.offset_membership()[0].shape[0]),
        'BPLM_mb': round(b * pidx.search_dst.shape[0]
                         * pidx.paths.shape[1] * m_pairs * 4 / 2**20,
                         1)}),
        flush=True)

    ivars, ios = itr.init(jax.random.PRNGKey(0))
    lab = rng.integers(0, spec.n_seg_classes,
                       (b, size // 4, size // 4)).astype(np.int64)
    packs = [irnet.affinity_labels(l, pidx, spec.n_seg_classes)
             for l in lab]
    bg, fg, ng = (jnp.asarray(np.stack(z)) for z in zip(*packs))
    imgs = jnp.asarray(rng.normal(0, 1, (b, size, size, 3))
                       .astype(np.float32))

    # 1. full train step (the benched number)
    istep = itr.jitted_step()
    timeit('full_train_step', lambda: istep(ivars, ios, imgs, bg, fg, ng),
           b)

    # 2. losses forward only
    floss = jax.jit(lambda v: itr.losses(v, imgs, bg, fg, ng))
    timeit('losses_fwd', lambda: floss(ivars), b)

    # 3. backbone forward only (edge+disp heads)
    fwd = jax.jit(lambda v: itr.net.apply(v, imgs))
    timeit('backbone_fwd', lambda: fwd(ivars), b)

    # 4. backbone fwd+bwd with a surrogate mean loss (no affinity work)
    def surr(p):
        rest = {k: v for k, v in ivars.items() if k != 'params'}
        e, d = itr.net.apply({'params': p, **rest}, imgs)
        return jnp.mean(e) + jnp.mean(jnp.abs(d))
    gsurr = jax.jit(jax.grad(surr))
    timeit('backbone_fwd_bwd', lambda: gsurr(ivars['params']), b)

    # 5. to_affinity alone (fwd): gather [B,P,L,M] + max over L
    edge = jnp.asarray(rng.uniform(0, 1, (b, grid[0] * grid[1]))
                       .astype(np.float32))
    taff = jax.jit(lambda e: random_walk.to_affinity(e, gather_idx))
    timeit('to_affinity_fwd', lambda: taff(edge), b)

    # 6. to_affinity fwd+bwd (the gather's scatter-add transpose)
    gaff = jax.jit(jax.grad(lambda e: jnp.sum(
        random_walk.to_affinity(e, gather_idx) * fg[:, :, :])))
    timeit('to_affinity_fwd_bwd', lambda: gaff(edge), b)

    # 6b. the sliced reformulation (what the trainer now runs)
    edge2d = edge.reshape(b, *grid)
    tslc = jax.jit(lambda e: random_walk.to_affinity_sliced(e, pidx))
    timeit('to_affinity_sliced_fwd', lambda: tslc(edge2d), b)
    gslc = jax.jit(jax.grad(lambda e: jnp.sum(
        random_walk.to_affinity_sliced(e, pidx) * fg)))
    timeit('to_affinity_sliced_fwd_bwd', lambda: gslc(edge2d), b)

    # 7. pair displacement fwd+bwd
    disp = jnp.asarray(rng.normal(0, 1, (b, grid[0], grid[1], 2))
                       .astype(np.float32))
    gpd = jax.jit(jax.grad(lambda d: jnp.sum(
        jnp.abs(itr._pair_displacement(d)) * fg[:, None])))
    timeit('pair_disp_fwd_bwd', lambda: gpd(disp), b)


if __name__ == '__main__':
    main()
