"""Path index + random-walk propagation vs brute-force numpy oracles."""
import numpy as np
import jax.numpy as jnp

from wsss_tpu.ops.random_walk import PathIndex, propagate_to_edge, to_affinity


def test_path_index_geometry():
    p = PathIndex(radius=5)
    # displacements: dy>0 half-plane + (0, dx>0), all strictly inside radius
    d = p.search_dst
    assert np.all((d[:, 0] > 0) | ((d[:, 0] == 0) & (d[:, 1] > 0)))
    assert np.all((d ** 2).sum(1) < 25)
    # each unordered pair appears exactly once
    assert len({(dy, dx) for dy, dx in d}) == len(d)
    # paths start around origin and end at the displacement
    for i, (dy, dx) in enumerate(d):
        path = p.paths[i]
        assert (path == np.array([dy, dx])).all(1).any()
        assert (path == np.array([0, 0])).all(1).any()


def _np_dense_affinity(edge, radius, beta):
    """Brute-force: aff(i,j) = (1 - max edge on discrete line)^beta."""
    h, w = edge.shape
    n = h * w
    p = PathIndex(radius)
    mat = np.zeros((n, n), np.float64)
    rf = p.radius_floor
    for pi, (dy, dx) in enumerate(p.search_dst):
        for y in range(0, h - rf):
            for x in range(rf, w - rf):
                vals = [edge[y + py, x + px] for py, px in p.paths[pi]]
                a = (1 - max(vals)) ** beta
                i, j = y * w + x, (y + dy) * w + (x + dx)
                mat[i, j] += a
    mat = mat + mat.T + np.eye(n)
    return mat


def test_propagate_matches_bruteforce():
    rng = np.random.default_rng(0)
    h = w = 8
    edge = rng.random((h, w)).astype(np.float32) * 0.8
    cam = rng.random((3, h, w)).astype(np.float32)
    beta, exp_times, radius = 4.0, 2, 3

    mat = _np_dense_affinity(edge, radius, beta)
    trans = mat / mat.sum(0, keepdims=True)
    for _ in range(exp_times):
        trans = trans @ trans
    want = (cam.reshape(3, -1) @ trans).reshape(3, h, w)

    got = np.asarray(propagate_to_edge(
        jnp.asarray(cam), jnp.asarray(edge), beta=beta,
        exp_times=exp_times, radius=radius))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_walk_respects_edges():
    """Mass must not cross a hard boundary."""
    h = w = 12
    edge = np.zeros((h, w), np.float32)
    edge[:, 5:7] = 1.0  # wall
    cam = np.zeros((1, h, w), np.float32)
    cam[0, :, :5] = 1.0
    out = np.asarray(propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge),
                                       beta=8, exp_times=4, radius=4))
    assert out[0, :, 8:].max() < 1e-3     # nothing leaked across the wall
    assert out[0, :, :5].mean() > 0.1     # mass stayed on the left


def test_to_affinity_max_along_path():
    h = w = 6
    p = PathIndex(radius=3)
    g = p.path_gather_indices((h, w))
    rng = np.random.default_rng(1)
    edge = rng.random((1, h * w)).astype(np.float32)
    aff = np.asarray(to_affinity(jnp.asarray(edge), g))
    # spot-check one displacement/source
    rf = p.radius_floor
    pi = 3
    y, x = 1, rf + 1
    m = (y - 0) * (w - 2 * rf) + (x - rf)
    vals = [edge[0, (y + py) * w + (x + px)] for py, px in p.paths[pi]]
    np.testing.assert_allclose(aff[0, pi, m], 1 - max(vals), rtol=1e-6)


def test_to_affinity_sliced_matches_gather():
    """to_affinity_sliced (static shifted slices + membership-masked
    maximum tree — the TPU-fast form the IRN trainer runs) must equal
    the gather form in values AND gradients."""
    import jax
    import jax.numpy as jnp
    from wsss_tpu.ops.random_walk import to_affinity_sliced

    h, w, b = 9, 11, 2
    p = PathIndex(radius=4)
    g = p.path_gather_indices((h, w))
    rng = np.random.default_rng(3)
    edge2d = rng.random((b, h, w)).astype(np.float32)

    want = np.asarray(to_affinity(
        jnp.asarray(edge2d.reshape(b, -1)), g))
    got = np.asarray(to_affinity_sliced(jnp.asarray(edge2d), p))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # gradients: weight by a fixed random cotangent, compare pixelwise
    wgt = jnp.asarray(rng.random(want.shape).astype(np.float32))
    g_gather = jax.grad(lambda e: jnp.sum(
        to_affinity(e.reshape(b, -1), g) * wgt))(jnp.asarray(edge2d))
    g_sliced = jax.grad(lambda e: jnp.sum(
        to_affinity_sliced(e, p) * wgt))(jnp.asarray(edge2d))
    # f32 accumulation order differs (many paths sum into one pixel)
    np.testing.assert_allclose(np.asarray(g_sliced),
                               np.asarray(g_gather), atol=1e-4)
