"""Benchmark: CAM + dense-CRF pseudo-label generation throughput.

The BASELINE.json headline metric — images/sec/chip for the 02_cues + CRF
path (VGG16 @ 321^2, 21 classes, HistoSegNet-style dense-CRF refinement at
full resolution).  The reference runs this as Keras predict + host einsum +
per-image pydensecrf on CPU (02_cues/demo.py:155-214,
03c_hsn/demo.py:101-232); its own per-image timing prints put it at ~2
img/s on an RTX 2060-class GPU (CRF-dominated).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The primary fields keep the driver contract; "extras" carries the
round-3 measurement requirements (VERDICT items 3/8):

  * per-stage throughput (mesh-driver path vs bare loop -> measured
    driver overhead, irn make_cam MSF, SEC predict+CRF, random walk);
  * MFU estimates from XLA's compiled cost analysis (flops / time /
    v5e-chip bf16 peak);
  * a measured CPU anchor for the 2 img/s denominator: the native
    permutohedral CRF (the same algorithm/config family pydensecrf
    runs in the reference) timed on this host.

The BASELINE.json target (>=50x reference throughput) is specified on a
v5e-8 slice; this bench runs on the single tunneled chip, so vs_baseline
is per-chip.  extras.mesh_overhead_factor quantifies the driver cost of
the sharded whole-split path (gradcam_cues.run(mesh=) contract) measured
with a 1-device mesh on this chip.

NOTE (axon): block_until_ready does not block under the TPU tunnel — the
loop chains device calls and forces one host fetch at the end.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 2.0  # reference GPU estimate; see extras.anchor
V5E_PEAK_FLOPS = 197e12       # per-chip bf16 peak (v5e litepod chip)


def _fetch(out):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jnp.sum(jnp.asarray(leaves[0]).astype(jnp.float32))))


def _time(fn, iters=4, warmup=1):
    out = None
    for attempt in range(2):   # axon compile helper intermittently 500s
        try:
            for _ in range(warmup):
                out = fn()
            break
        except Exception:
            if attempt == 1:
                raise
    _fetch(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _fetch(out)
    return (time.time() - t0) / iters


def _flops(jitted, *args):
    """Compiled-executable FLOP count from XLA cost analysis (None if
    the backend does not report it)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get('flops', 0.0)) or None
    except Exception:
        return None


def _probe_backend(timeout_s: int = 150) -> bool:
    """The axon tunnel can go fully down (jax.devices() then hangs at
    plugin init, uninterruptible in-process) — probe it in a subprocess
    so this entry point always terminates."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax; d = jax.devices(); '
             'print(d[0].platform)'],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_last_good(reason: str) -> bool:
    """TPU unreachable: re-emit the last successful measurement, loudly
    marked stale, rather than hanging past the driver's timeout."""
    import pathlib
    lg = pathlib.Path(__file__).resolve().parent / 'BENCH_LAST_GOOD.json'
    if not lg.exists():
        return False
    rec = json.loads(lg.read_text())
    rec.setdefault('extras', {})['STALE'] = (
        f'{reason}; re-emitting last good measurement '
        f'(commit {rec.get("measured_at_commit", "?")[:12]})')
    rec.pop('measured_at_commit', None)
    print(json.dumps(rec))
    return True


def _record_last_good(result: dict) -> None:
    import pathlib
    from wsss_tpu.utils.repo import git_head
    root = pathlib.Path(__file__).resolve().parent
    try:
        (root / 'BENCH_LAST_GOOD.json').write_text(
            json.dumps(dict(result, measured_at_commit=git_head(root)))
            + '\n')
    except OSError:
        pass  # never lose a completed measurement to a write failure


def main():
    import jax
    # persistent executable cache: re-runs after a remote-compile stall
    # skip straight past already-compiled programs (no-op if the backend
    # does not support serialization)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/repo/.jax_tpu_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    from wsss_tpu.data import registry
    from wsss_tpu.methods import gradcam_cues as gc
    from wsss_tpu.methods.hsn import HSNSegmenter
    from wsss_tpu.ops.crf import config as crf_config

    spec = registry.get('VOC2012')
    size = 321
    # batch 8 per device program: the fused CAM->CRF->argmax path
    # (methods/hsn.py) chunks the CRF in pairs INSIDE the program, so
    # larger batches amortize the per-program host/tunnel gap without
    # re-inflating the CRF working set (measured: b8 100.3 img/s vs
    # b4 97.3 vs b16 99.9, round 4)
    batch = 8
    n_batches = 2
    extras = {}

    fg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size)
    bg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size,
                                     seed=1)
    seg = HSNSegmenter(spec, fg, bg, model_type='VGG16')

    rng = np.random.default_rng(0)
    # device-resident inputs: the production loaders overlap host->device
    # transfer with compute (data/pipeline.py prefetch thread), so the
    # metric times the chip, not the axon tunnel's upload latency
    imgs = [jnp.asarray(
        rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32))
            for _ in range(n_batches)]

    # ---- headline: bare per-batch loop --------------------------------
    def headline():
        return [seg.segment_batch(im) for im in imgs]
    dt = _time(headline, iters=2, warmup=1)
    ips = batch * n_batches / dt
    extras['headline_ms_per_img'] = round(1e3 * dt / (batch * n_batches),
                                          2)

    # ---- mesh-driver path on a 1-device mesh: measures the sharded
    # whole-split driver's overhead (device_put + pad-to-shards) --------
    try:
        from wsss_tpu.parallel.mesh import batch_sharding, make_mesh
        mesh1 = make_mesh(1, axis_names=('data',))
        # pre-placed (the production prefetch loop overlaps placement
        # with compute): isolates the sharded-dispatch overhead itself
        placed = [jax.device_put(np.asarray(im), batch_sharding(mesh1))
                  for im in imgs]

        def mesh_path():
            return [seg.segment_batch(im, mesh=mesh1) for im in placed]
        dt_mesh = _time(mesh_path, iters=2, warmup=1)
        extras['mesh1_imgs_per_sec'] = round(batch * n_batches / dt_mesh,
                                             2)
        extras['mesh_overhead_factor'] = round(dt_mesh / dt, 3)

        # host-resident batches through the PRODUCTION loop
        # (parallel/mesh.py mesh_batches): a prefetch thread runs the
        # device_put (tunnel upload / PCIe DMA on a pod) while the
        # previous batch computes, and images ship as uint8 (4x fewer
        # bytes; byte-faithful to the reference's cv2.imread pipeline —
        # the fused program's first op casts to f32 on device), so only
        # the first upload and any un-hidden tail remain vs the
        # device-resident headline
        from wsss_tpu.parallel.mesh import mesh_batches
        host_imgs = [np.clip(np.asarray(im), 0, 255).astype(np.uint8)
                     for im in imgs] * 2   # 4 batches: amortize the
        # pipeline-fill transient (the first upload is never hidden)
        # the way a real split-length loop does

        def mesh_upload_path():
            return [seg.segment_batch(ims, mesh=mesh1)[:b0]
                    for _, (ims,), b0 in
                    mesh_batches(mesh1, host_imgs, lambda b: (b,))]
        dt_up = _time(mesh_upload_path, iters=2, warmup=1)
        extras['mesh_upload_factor'] = round(
            dt_up / (dt * len(host_imgs) / len(imgs)), 3)
    except Exception as e:             # pragma: no cover
        extras['mesh_overhead_factor'] = f'failed: {type(e).__name__}'

    # ---- per-stage: CAM probs (MXU conv stage) + its MFU --------------
    probs_j = jax.jit(seg._probs_fn)
    dt_cam = _time(lambda: probs_j(imgs[0]), iters=4)
    extras['cam_stage_imgs_per_sec'] = round(batch / dt_cam, 2)
    fl = _flops(probs_j, imgs[0])
    if fl:
        extras['cam_stage_mfu'] = round(fl / dt_cam / V5E_PEAK_FLOPS, 4)

    # ---- per-stage: CRF only (the grid-routed mean field) + MFU -------
    from wsss_tpu.ops.crf.meanfield import mean_field
    probs0 = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 1, (1, size, size, spec.n_seg_classes))
        .astype(np.float32)))
    img0 = imgs[0][:1]
    cfg = seg._cfg

    def crf_once():
        return mean_field(probs0, img0, cfg)
    dt_crf = _time(crf_once, iters=4)
    extras['crf_imgs_per_sec'] = round(1.0 / dt_crf, 2)

    # bf16-vs-f32 mean-field state A/B, recorded EVERY run (state dtype
    # is a static arg of _mean_field_mxu since round 5, so flipping the
    # module flag genuinely retraces — the round-4 flip reused the
    # cached bf16 program and compared it against itself)
    try:
        from wsss_tpu.ops.crf import meanfield as _mf
        if _mf._CRF_STATE_BF16 and _mf._mxu_ok(
                (size, size), spec.n_seg_classes, cfg):
            lab16 = jnp.argmax(crf_once(), -1)
            _mf._CRF_STATE_BF16 = False
            try:
                dt_f32 = _time(crf_once, iters=4)
                lab32 = jnp.argmax(crf_once(), -1)
            finally:
                _mf._CRF_STATE_BF16 = True
            extras['crf_f32_state_imgs_per_sec'] = round(1.0 / dt_f32, 2)
            extras['crf_state_bf16_label_agree'] = round(float(
                jnp.mean((lab16 == lab32).astype(jnp.float32))), 5)
    except Exception:                  # pragma: no cover
        pass

    # hardware utilization of the CRF kernels: executed one-hot-matmul
    # MACs (NOT algorithmic flops — the factorization inflates work to
    # ride the MXU) over measured time vs the bf16 peak.  Only valid
    # when mean_field actually routed to the MXU kernels.
    try:
        from wsss_tpu.ops.crf.meanfield import _mxu_ok, mxu_macs_estimate
        if _mxu_ok((size, size), spec.n_seg_classes, cfg):
            macs = mxu_macs_estimate((size, size), spec.n_seg_classes,
                                     cfg)
            extras['crf_mxu_util'] = round(
                2.0 * macs / dt_crf / V5E_PEAK_FLOPS, 4)
    except Exception:                  # pragma: no cover
        pass

    # ---- denominator anchor: native permutohedral CRF on this host ----
    # (the reference's pydensecrf runs the same lattice family on CPU;
    # one image at the same config anchors the ~2 img/s estimate)
    try:
        from wsss_tpu.ops.crf import native as crf_native
        if crf_native.available():
            p_np = np.asarray(probs0[0])
            i_np = np.asarray(img0[0])
            t0 = time.time()
            crf_native.mean_field_native(p_np, i_np, cfg)
            extras['anchor_native_crf_sec_per_img'] = round(
                time.time() - t0, 3)
    except Exception:                  # pragma: no cover
        pass

    # ---- per-stage sidecar (scripts/bench_stages.py): IRN make_cam
    # MSF, SEC predict+CRF, random walk.  Measured in a separate run so
    # this entry point stays within the driver's timeout (each extra
    # program risks a 2-200 s remote-compile round trip on axon);
    # stale = HEAD moved since the sidecar was written.
    try:
        import pathlib
        import subprocess
        root = pathlib.Path(__file__).resolve().parent
        sc = json.loads((root / 'BENCH_STAGES.json').read_text())
        # stale only if the measured code itself changed since the
        # sidecar's commit (doc/driver commits don't invalidate it);
        # unknown provenance counts as stale
        commit = sc.get('commit')
        if commit and commit != 'unknown':
            diff = subprocess.run(
                ['git', 'diff', '--quiet', commit + '..HEAD',
                 '--', 'wsss_tpu', 'scripts/bench_stages.py'],
                cwd=root, capture_output=True)
            sc['stale'] = diff.returncode != 0
        else:
            sc['stale'] = True
        extras['stage_benches'] = sc
    except Exception:                  # pragma: no cover
        pass

    result = {
        'metric': 'cam_crf_pseudolabel_gen',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips / REFERENCE_IMGS_PER_SEC, 2),
        'extras': extras,
    }
    _record_last_good(result)
    print(json.dumps(result))


if __name__ == '__main__':
    if _probe_backend():
        main()
    elif not _emit_last_good('TPU backend unreachable at bench time'):
        raise SystemExit('TPU backend unreachable and no last-good '
                         'measurement recorded')
