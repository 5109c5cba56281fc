"""Method: HistoSegNet inference (the reference's 03c_hsn stage).

Grad-CAM (confidence-scaled) -> fg/bg merge (VOC/DeepGlobe) or
HTT-adjust + CS-Grad-CAM (ADP) -> dense CRF -> argmax segmentation.

Reference flow: 03c_hsn/demo.py:18-269 (segment) and :271-464
(segment_adp); the per-image pydensecrf call (utilities.py:399-445) — the
dominant cost there — runs here as the on-device mean-field.

Quirks preserved:
  * thresholds are clamped max(min(t, 0), 1/3) == 1/3 for every class
    (03c_hsn/demo.py:83) — effectively a constant 1/3 threshold.
  * VOC bg channel = 0.15 * sigmoid(max(X_bg) - X_bg) with the max taken
    over the whole batch, X_bg = sum of bg-net CAMs (demo.py:142-148).
  * DeepGlobe drops the classifier's last class (demo.py:149-150).
  * dcrf_process runs only on passing classes (utilities.py:425-429) —
    reproduced by zero-masking, which is mathematically identical.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.data import registry
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.ops import cues as cue_ops
from wsss_tpu.ops import gradcam as gc_ops
from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield
from wsss_tpu.ops.crf.meanfield import mean_field

HSN_THRESHOLD = 1.0 / 3.0  # demo.py:83 clamp degenerates to a constant


def _fused_crf_argmax(probs_fn, cfg):
    """One-device-program segment step: CAM probs -> chunked MXU mean
    field -> argmax, all inside a single jit.  Removes the ~6 ms
    host/tunnel gap each separate CRF dispatch pays (measured round 4:
    80.5 -> 100.3 img/s at the bench config).  Only built when the CRF
    config routes to the jit-composable MXU kernels."""
    @jax.jit
    def fused(imgs):
        # uint8 transport lands here: callers may ship images as uint8
        # (4x fewer upload bytes over the host link — and byte-faithful
        # to the reference's cv2.imread uint8 pipeline); the f32 cast is
        # the program's first fused op
        imgs = imgs.astype(jnp.float32)
        probs = probs_fn(imgs)
        q = meanfield.mean_field_fused(probs, imgs, cfg)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)
    return fused


def _shard_mapped(fused, mesh):
    """Data-parallel wrapper of a fused per-shard step: each device runs
    the chunked CRF on ITS batch shard (the host-level chunk loop would
    otherwise dynamic-slice 2-image chunks across shard boundaries and
    serialize the CRF stage — the mesh exists to parallelize it)."""
    from jax.sharding import PartitionSpec as P
    return jax.jit(jax.shard_map(
        fused, mesh=mesh, in_specs=P('data'), out_specs=P('data'),
        check_vma=False))


class HSNSegmenter:
    """VOC2012 / DeepGlobe HistoSegNet inference."""

    def __init__(self, spec: registry.DatasetSpec, fg: _ClassifierHandle,
                 bg: Optional[_ClassifierHandle] = None,
                 model_type: str = 'VGG16',
                 cfg: Optional[crf_config.CRFConfig] = None,
                 drop_last_class: bool = False):
        self.spec = spec
        cfg = cfg or crf_config.hsn_config(spec.name, model_type)
        norm = _normalizer(spec.norm_cues)
        size = fg.input_size

        @jax.jit
        def probs_fn(imgs_raw):
            imgs_raw = imgs_raw.astype(jnp.float32)   # uint8 transport
            x = norm(imgs_raw)
            scores, feats = fg.model.apply(fg.variables, x)
            is_pass = scores >= HSN_THRESHOLD
            h_fg = gc_ops.grad_cam_confidence(
                feats, fg.weights, is_pass, scores,
                upsample_hw=(size, size))
            if spec.uses_bg_net:
                s_bg, f_bg = bg.model.apply(bg.variables, x)
                h_bg = gc_ops.grad_cam_confidence(
                    f_bg, bg.weights, s_bg >= HSN_THRESHOLD, s_bg,
                    upsample_hw=(size, size))
                x_bg = jnp.sum(h_bg, axis=-1)
                bg_ch = 0.15 * jax.nn.sigmoid(jnp.max(x_bg) - x_bg)
                probs = jnp.concatenate([bg_ch[..., None], h_fg], axis=-1)
            elif drop_last_class:
                probs = h_fg[..., :-1]
            else:
                probs = h_fg
            return probs

        self._probs_fn = probs_fn
        self._cfg = cfg
        n_ch = (spec.n_fg_classes + 1 if spec.uses_bg_net
                else spec.n_fg_classes - int(drop_last_class))
        self._fused = (_fused_crf_argmax(probs_fn, cfg)
                       if meanfield.fused_mxu_ok((size, size), n_ch, cfg)
                       else None)
        self._mesh_fused = {}

    def segment_batch(self, imgs_raw, mesh=None) -> jax.Array:
        """imgs_raw: [B,S,S,3] float RGB 0..255 -> labels [B,S,S] int32.

        On TPU with an MXU-routed CRF config the whole step (CAM probs,
        chunked mean field, argmax) is ONE device program; otherwise the
        CAM stage is one jitted call and the CRF dispatches per image at
        the host level (see the lax.map performance note in
        ops/crf/meanfield.py).  mesh: optional jax.sharding.Mesh — the
        batch shards over its 'data' axis (the reference's
        one-process-per-GPU inference split, make_cam.py:120-122, as one
        program; same contract as gradcam_cues.run(mesh=))."""
        if mesh is not None:
            from wsss_tpu.parallel.mesh import shard_batch
            (imgs,), b0 = shard_batch(mesh, imgs_raw)
            extra = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                 if a != 'data']))
            if self._fused is not None and extra == 1:
                # per-shard fused step: the CRF chunks run on EACH
                # device's local batch, so the stage scales with the
                # mesh.  NOTE: the VOC bg-channel batch-global max quirk
                # becomes shard-local here — matching the reference,
                # whose per-GPU processes each see only their own split.
                if mesh not in self._mesh_fused:
                    self._mesh_fused[mesh] = _shard_mapped(self._fused,
                                                           mesh)
                return self._mesh_fused[mesh](imgs)[:b0]
            if imgs.dtype != jnp.float32:      # uint8 transport
                imgs = imgs.astype(jnp.float32)
            probs = self._probs_fn(imgs)
            q = mean_field(probs, imgs, self._cfg)
            return jnp.argmax(q, axis=-1).astype(jnp.int32)[:b0]
        imgs = jnp.asarray(imgs_raw, jnp.float32)
        if self._fused is not None:
            return self._fused(imgs)
        probs = self._probs_fn(imgs)
        q = mean_field(probs, imgs, self._cfg)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)


class ADPHSNSegmenter:
    """ADP morph+func HistoSegNet inference (segment_adp,
    03c_hsn/demo.py:271-464): modify_by_htt -> CS-Grad-CAM -> CRF."""

    def __init__(self, handle: _ClassifierHandle, model_family: str,
                 cfg_morph: Optional[crf_config.CRFConfig] = None,
                 cfg_func: Optional[crf_config.CRFConfig] = None):
        self.handle = handle
        maps = registry.adp_index_maps(model_family)
        morph_spec = registry.get('ADP-morph')
        func_spec = registry.get('ADP-func')
        cfg_morph = cfg_morph or crf_config.hsn_config('ADP-morph')
        cfg_func = cfg_func or crf_config.hsn_config('ADP-func')
        norm = _normalizer(morph_spec.norm_cues)
        size = handle.input_size
        is_x17 = model_family.upper().startswith('X1')
        all31 = maps['x17_to_31'] if is_x17 else maps['all']
        base = registry.ADP_CLASSES_VGG16
        morph31 = np.array([i for i, c in enumerate(base)
                            if c in registry.ADP_MORPH_CLASSES])
        func31 = np.array([i for i, c in enumerate(base)
                           if c in registry.ADP_FUNC_CLASSES])
        adipose31 = np.array([i for i, c in enumerate(base)
                              if c in registry.ADP_ADIPOSE_CLASSES])
        adipose_in_morph = tuple(1 + np.searchsorted(morph31, adipose31))
        func_exc = tuple(func_spec.seg_class_names.index(c)
                         for c in registry.ADP_BG_EXCEPTION['func'])

        @jax.jit
        def batch_fn(imgs_raw):
            imgs_raw = imgs_raw.astype(jnp.float32)   # uint8 transport
            x = norm(imgs_raw)
            scores, feats = handle.model.apply(handle.variables, x)
            is_pass = scores >= handle.thresholds[None]
            cams = gc_ops.grad_cam_confidence(
                feats, handle.weights, is_pass, scores,
                upsample_hw=(size, size))
            cams31 = cams[..., all31]
            morph = jnp.zeros(cams31.shape[:3] +
                              (morph_spec.n_seg_classes,))
            morph = morph.at[..., 1:].set(cams31[..., morph31])
            morph = cue_ops.modify_by_htt(
                morph, imgs_raw, exception_inds=adipose_in_morph, bg_ind=0)
            func = jnp.zeros(cams31.shape[:3] + (func_spec.n_seg_classes,))
            func = func.at[..., 2:].set(cams31[..., func31])
            adipose_cam = jnp.max(morph[..., adipose_in_morph], axis=-1)
            func = cue_ops.modify_by_htt(
                func, imgs_raw, exception_inds=func_exc, bg_ind=0,
                other_ind=1, adipose_cam=adipose_cam)
            cs_m = gc_ops.cs_gradcam(morph)
            cs_f = gc_ops.cs_gradcam(func, other_ind=1)
            return cs_m, cs_f

        self._batch_fn = batch_fn
        self._cfg_morph, self._cfg_func = cfg_morph, cfg_func
        hw = (size, size)
        if (meanfield.fused_mxu_ok(hw, morph_spec.n_seg_classes,
                                   cfg_morph)
                and meanfield.fused_mxu_ok(hw, func_spec.n_seg_classes,
                                           cfg_func)):
            @jax.jit
            def fused(imgs):
                imgs = imgs.astype(jnp.float32)       # uint8 transport
                cs_m, cs_f = batch_fn(imgs)
                q_m = meanfield.mean_field_fused(cs_m, imgs, cfg_morph)
                q_f = meanfield.mean_field_fused(cs_f, imgs, cfg_func)
                return (jnp.argmax(q_m, -1).astype(jnp.int32),
                        jnp.argmax(q_f, -1).astype(jnp.int32))
            self._fused = fused
        else:
            self._fused = None
        self._mesh_fused = {}

    def segment_batch(self, imgs_raw, mesh=None
                      ) -> Tuple[jax.Array, jax.Array]:
        """mesh: optional jax.sharding.Mesh — batch shards over 'data'
        (same contract as HSNSegmenter.segment_batch)."""
        if mesh is not None:
            from wsss_tpu.parallel.mesh import shard_batch
            (imgs,), b0 = shard_batch(mesh, imgs_raw)
            extra = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                 if a != 'data']))
            if self._fused is not None and extra == 1:
                if mesh not in self._mesh_fused:
                    self._mesh_fused[mesh] = _shard_mapped(self._fused,
                                                           mesh)
                lm, lf = self._mesh_fused[mesh](imgs)
                return lm[:b0], lf[:b0]
            if imgs.dtype != jnp.float32:      # uint8 transport
                imgs = imgs.astype(jnp.float32)
        else:
            imgs, b0 = jnp.asarray(imgs_raw, jnp.float32), None
            if self._fused is not None:
                return self._fused(imgs)
        cs_m, cs_f = self._batch_fn(imgs)
        q_m = mean_field(cs_m, imgs, self._cfg_morph)
        q_f = mean_field(cs_f, imgs, self._cfg_func)
        lm = jnp.argmax(q_m, -1).astype(jnp.int32)
        lf = jnp.argmax(q_f, -1).astype(jnp.int32)
        return (lm, lf) if b0 is None else (lm[:b0], lf[:b0])
