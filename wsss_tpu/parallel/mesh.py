"""Device-mesh + sharding helpers.

The reference's parallelism is share-nothing OS processes writing disjoint
files (torch.multiprocessing.spawn over split_dataset, make_cam.py:120-122)
plus single-process DataParallel (train_irn.py:92).  The TPU-native
equivalent (SURVEY.md §2.8): one program, a jax.sharding.Mesh over the
chips, data-parallel batch sharding with XLA collectives over ICI, and
optional spatial sharding for the big-image CRF path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data', 'model'),
              model: int = 1):
    """1- or 2-axis mesh over available devices.

    Default layout puts everything on 'data' (batch parallel — the only
    parallelism the workload needs at VGG16 scale) with a trivial
    size-1 'model' axis that spatial/tensor sharding can use when
    requested.  Pass model=k to carve k devices off for the 'model'
    axis (the dryrun does, to exercise halo/2-D sharding); a silent
    model=2 default would leave half the pod computing redundant
    replicas on every pure-dp --mesh driver.
    """
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        if n % model:
            raise ValueError(f'model axis {model} must divide the '
                             f'device count {n}')
        shape = (n // model, model)
    return Mesh(np.asarray(devs).reshape(shape), axis_names[:len(shape)])


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: int = 1):
    """Shard an image's row dimension over 'model' (halo-exchange CRF)."""
    spec = [None, None, None, None]
    spec[axis] = 'model'
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with the batch dim sharded over 'data'.

    Pads the batch up to a multiple of the data-axis size (XLA needs equal
    shards); returns (padded arrays, original batch size).

    Arrays already carrying the target sharding (and a divisible batch)
    pass through untouched — callers that pre-place inputs (prefetch
    pipelines, benches) don't pay a host round trip per batch.
    """
    n = mesh.shape['data']
    sharding = batch_sharding(mesh)
    out = []
    b0 = arrays[0].shape[0]
    pad = (-b0) % n
    for a in arrays:
        if (isinstance(a, jax.Array) and not pad
                and a.sharding.is_equivalent_to(sharding, a.ndim)):
            out.append(a)
            continue
        a = np.asarray(a)
        # float64 only exists host-side (jax_enable_x64 is off); every
        # other dtype ships as-is — the old unconditional float32 cast
        # silently corrupted int/bool arrays (ADVICE r4)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
        out.append(jax.device_put(a, sharding))
    return out, b0


def prefetch_to_mesh(mesh: Mesh, batches, fields, depth: int = 2):
    """Double-buffered host->device placement (the tf.data prefetch
    role, SURVEY §2.8): a background thread runs shard_batch up to
    `depth` batches ahead of the consumer, so the upload (tunnel/PCIe
    DMA) overlaps the device compute of the previous batch instead of
    serializing with it.

    batches: any iterable; fields: callable(batch) -> tuple of host
    arrays to place.  Yields (batch, placed_tuple, b0).
    """
    import queue
    import threading

    q: 'queue.Queue' = queue.Queue(maxsize=max(1, depth))
    done = object()

    def producer():
        try:
            for b in batches:
                placed, b0 = shard_batch(mesh, *fields(b))
                q.put((b, placed, b0))
        except BaseException as e:       # surface in the consumer
            q.put(e)
            return
        q.put(done)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def mesh_batches(mesh: Optional[Mesh], batches, fields, depth: int = 2):
    """Uniform batch stream for the split-driver loops: yields
    (batch, field_arrays, b0) whether or not a mesh is in play.

    With a mesh the fields are shard_batch-placed by the prefetch
    thread (upload overlaps the previous batch's compute); without one
    they pass through as host arrays.  Downstream shard_batch calls see
    the target sharding and skip re-placement, so the pre-placed arrays
    flow straight into the sharded program.
    """
    if mesh is None:
        for b in batches:
            fs = tuple(fields(b))
            yield b, fs, fs[0].shape[0]
        return
    yield from prefetch_to_mesh(mesh, batches, fields, depth=depth)
