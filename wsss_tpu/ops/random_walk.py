"""IRNet path-index geometry, affinity extraction and random-walk
propagation.

TPU-native rebuild of the reference's missing ``misc.indexing`` module
(gitignored upstream; behavior per SURVEY.md §2.4 and its call sites:
train_irn.py:16,26-27; vgg16_irn.py:239-300; make_sem_seg_labels.py:70):

  * :class:`PathIndex` — static geometry: the set of displacement vectors
    within ``radius`` (half-plane, so each unordered pair appears once) and
    the discrete line path of pixels from the origin to each displacement.
    All precomputed in numpy at trace time; in-graph work is pure gathers.
  * :func:`to_affinity` — affinity along each path = 1 - max(edge on the
    path) (vgg16_irn.py:249-262).  Paths are padded to a common length by
    repeating their endpoint (max is unaffected), avoiding the reference's
    by-length bucketing.
  * :func:`propagate_to_edge` — builds the dense symmetric pixel-pair
    affinity matrix aff^beta from the edge map, column-normalizes it into a
    transition matrix, squares it exp_times times (a 2^exp_times-step
    random walk), and applies it to the CAM.  The N x N matrix powers run
    on the MXU — the hot loop the reference runs as torch matmuls
    (make_sem_seg_labels.py:70,89,108).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class PathIndex:
    """Static path geometry for a given search radius.

    Attributes:
      search_dst: [P,2] int — displacement vectors (dy,dx), dy>0 half-plane
        plus (0, dx>0), with dy^2+dx^2 < radius^2.
      paths: [P,L,2] int — pixel offsets along the discrete line from the
        origin to each displacement (endpoint-padded to common length L).
      radius_floor: crop margin used by pair extraction (train_irn.py spec).
    """

    def __init__(self, radius: int):
        self.radius = radius
        self.radius_floor = radius - 1
        dirs = [(0, x) for x in range(1, radius)]
        for y in range(1, radius):
            for x in range(-radius + 1, radius):
                if x * x + y * y < radius * radius:
                    dirs.append((y, x))
        self.search_dst = np.asarray(dirs, np.int32)

        paths = []
        for dy, dx in dirs:
            length_sq = dy * dy + dx * dx
            coords = []
            ys = range(min(0, dy), max(0, dy) + 1)
            xs = range(min(0, dx), max(0, dx) + 1)
            for y in ys:
                for x in xs:
                    # squared distance from (y,x) to the line (0,0)->(dy,dx)
                    if (dx * y - dy * x) ** 2 / length_sq < 1:
                        coords.append((y, x))
            # sort far-to-near like the reference (order irrelevant to max)
            coords.sort(key=lambda c: -abs(c[0]) - abs(c[1]))
            paths.append(coords)
        L = max(len(p) for p in paths)
        self.paths = np.asarray(
            [p + [p[-1]] * (L - len(p)) for p in paths], np.int32)

    # -- pair indices over an HxW grid (affinity-label extraction) --------
    def pair_indices(self, hw: Tuple[int, int]
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(src [M], dst [P,M]) flat indices of valid pixel pairs, matching
        the cropped-region convention of the reference
        (vgg16_irn.py:264-280): sources live in
        rows [0, H-rf), cols [rf, W-rf)."""
        h, w = hw
        rf = self.radius_floor
        full = np.arange(h * w, dtype=np.int64).reshape(h, w)
        ch, cw = h - rf, w - 2 * rf
        src = full[:ch, rf:rf + cw].reshape(-1)
        dst = np.stack([
            full[dy:dy + ch, rf + dx:rf + dx + cw].reshape(-1)
            for dy, dx in self.search_dst])
        return src, dst

    def offset_membership(self) -> Tuple[np.ndarray, np.ndarray]:
        """(offsets [O,2], mem [O,P] bool): the unique path-pixel
        offsets across all paths, and which paths contain each offset.
        Endpoint padding collapses (membership is a set), so O is the
        half-disk pixel count, independent of path length L."""
        uniq = {}
        for p in range(self.paths.shape[0]):
            for dy, dx in map(tuple, self.paths[p]):
                uniq.setdefault((dy, dx), set()).add(p)
        offsets = np.asarray(sorted(uniq), np.int32)
        mem = np.zeros((len(offsets), self.paths.shape[0]), bool)
        for o, key in enumerate(map(tuple, offsets)):
            mem[o, sorted(uniq[key])] = True
        return offsets, mem

    def path_gather_indices(self, hw: Tuple[int, int]) -> np.ndarray:
        """[P, L, M] flat edge-map indices of every path pixel for every
        valid source position (to_affinity's gather table)."""
        h, w = hw
        rf = self.radius_floor
        full = np.arange(h * w, dtype=np.int64).reshape(h, w)
        ch, cw = h - rf, w - 2 * rf
        out = np.empty((self.paths.shape[0], self.paths.shape[1], ch * cw),
                       np.int64)
        for p in range(self.paths.shape[0]):
            for l in range(self.paths.shape[1]):
                py, px = self.paths[p, l]
                out[p, l] = full[py:py + ch,
                                 rf + px:rf + px + cw].reshape(-1)
        return out


def to_affinity(edge_flat: Array, gather_idx) -> Array:
    """Affinity along each path: 1 - max(edge) (vgg16_irn.py:249-262).

    edge_flat: [B, H*W] edge values in [0,1]; gather_idx: [P,L,M] from
    :meth:`PathIndex.path_gather_indices`.  Returns [B,P,M].
    """
    g = jnp.asarray(gather_idx)
    vals = edge_flat[:, g]              # [B,P,L,M]
    return 1.0 - jnp.max(vals, axis=2)


def to_affinity_sliced(edge2d: Array, pidx: PathIndex) -> Array:
    """:func:`to_affinity` as static shifted slices — the TPU-fast form.

    The [B,P,L,M] flat gather (and its scatter-add transpose in the
    backward pass) dominates the IRN train step: 449 MB of arbitrary-
    index traffic, 184 of the step's 210 ms measured on a v5e chip
    (scripts/profile_irn_step.py, round 5).  But every path pixel is a
    pure TRANSLATION of the source grid, so max-over-path is a chain of
    `jnp.maximum` over statically shifted crops masked by per-path
    membership — elementwise ops XLA fuses into one pass, whose
    transpose is also elementwise (no scatter).  Tie-handling in the
    VJP differs only on exact float ties between DISTINCT pixels
    (measure-zero; endpoint-padding duplicates collapse into set
    membership here, and their gather-side split gradients scatter back
    to the same pixel anyway).

    edge2d: [B, H, W] edge values in [0,1].  Returns [B,P,M] equal to
    ``to_affinity(edge2d.reshape(B,-1), pidx.path_gather_indices((H,W)))``.
    """
    b, h, w = edge2d.shape
    rf = pidx.radius_floor
    ch, cw = h - rf, w - 2 * rf
    offsets, mem = pidx.offset_membership()
    vals = []
    for (dy, dx), m in zip(offsets, mem):
        sl = edge2d[:, dy:dy + ch, rf + dx:rf + dx + cw]
        vals.append(jnp.where(jnp.asarray(m)[None, :, None],
                              sl.reshape(b, 1, ch * cw), -jnp.inf))
    # balanced tree: log-depth maximum chain (better ILP than linear)
    while len(vals) > 1:
        nxt = [jnp.maximum(a, bb) for a, bb in zip(vals[::2], vals[1::2])]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return 1.0 - vals[0]


def _transition_matrix(edge: Array, hw, beta: float, radius: int
                       ) -> Array:
    """Column-normalized random-walk transition matrix [N,N] from edge
    probabilities (vgg16_irn.py affinity semantics)."""
    h, w = hw
    n = h * w
    pidx = PathIndex(radius)
    gather_idx = pidx.path_gather_indices((h, w))
    src, dst = pidx.pair_indices((h, w))

    aff = to_affinity(edge.reshape(1, -1), gather_idx)[0]   # [P,M]
    aff = jnp.power(jnp.clip(aff, 0.0, 1.0), beta)

    rows = jnp.asarray(np.broadcast_to(src[None], dst.shape).reshape(-1))
    cols = jnp.asarray(dst.reshape(-1))
    vals = aff.reshape(-1)
    mat = jnp.zeros((n, n), jnp.float32)
    mat = mat.at[rows, cols].add(vals)
    mat = mat + mat.T + jnp.eye(n, dtype=jnp.float32)
    return mat / jnp.maximum(jnp.sum(mat, axis=0, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=('beta', 'exp_times', 'radius'))
def propagate_to_edge(cam: Array, edge: Array, beta: float = 10.0,
                      exp_times: int = 8, radius: int = 5) -> Array:
    """Random-walk CAM propagation (misc.indexing.propagate_to_edge spec;
    called at make_sem_seg_labels.py:70,89,108).

    cam:  [K,H,W] class activation maps (downsized grid).
    edge: [H,W] boundary probabilities in [0,1].
    Returns the propagated CAM [K,H,W].

    aff(i,j) = (1 - max edge along path i->j)^beta for pairs within
    `radius`, aff(i,i)=1, symmetric; T = aff / sum_rows(aff) (column
    normalization); T <- T@T exp_times times; out = cam_flat @ T.
    """
    k, h, w = cam.shape
    n = h * w
    # clamp the search radius for degenerate tiny grids (smoke runs);
    # production grids (>= 320/4) never hit this
    radius = max(2, min(radius, (min(h, w) + 1) // 2))
    trans = _transition_matrix(edge, (h, w), beta, radius)

    def body(_, t):
        return jnp.matmul(t, t, preferred_element_type=jnp.float32)

    trans = jax.lax.fori_loop(0, exp_times, body, trans)
    out = jnp.matmul(cam.reshape(k, n), trans,
                     preferred_element_type=jnp.float32)
    return out.reshape(k, h, w)


def propagate_to_edge_sharded(cam: Array, edge: Array, mesh,
                              beta: float = 10.0, exp_times: int = 8,
                              radius: int = 5) -> Array:
    """propagate_to_edge with the [N,N] transition matrix sharded 2-D
    over the first two mesh axes: XLA GSPMD turns the matrix powers into
    distributed matmuls with ICI collectives, so the full-resolution
    DeepGlobe walk (the reference downsamples x6 first,
    make_sem_seg_labels.py:101-104) fits by adding chips instead of
    losing resolution.  Exact — parity-tested against the single-device
    path on the virtual CPU mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    k, h, w = cam.shape
    n = h * w
    ax_r, ax_c = mesh.axis_names[:2]
    sh2d = NamedSharding(mesh, P(ax_r, ax_c))
    sh_cam = NamedSharding(mesh, P(None, ax_r))

    @functools.partial(jax.jit, static_argnames=('exp_times',))
    def run(trans, cam_flat, exp_times):
        trans = jax.lax.with_sharding_constraint(trans, sh2d)
        cam_flat = jax.lax.with_sharding_constraint(cam_flat, sh_cam)

        def body(_, t):
            t2 = jnp.matmul(t, t, preferred_element_type=jnp.float32)
            return jax.lax.with_sharding_constraint(t2, sh2d)

        t = jax.lax.fori_loop(0, exp_times, body, trans)
        return jnp.matmul(cam_flat, t,
                          preferred_element_type=jnp.float32)

    trans = _transition_matrix(edge, (h, w), beta, radius)
    out = run(trans, cam.reshape(k, n), exp_times)
    return out.reshape(k, h, w)
