"""Method: Grad-CAM weak-cue generation (the reference's 02_cues stage).

The reference's hot loop (02_cues/demo.py:155-214, SURVEY.md §3.1) round-
trips GPU<->host every batch: Keras predict, host einsum, per-image
per-class cv2.resize, numpy cue logic.  Here the entire body — normalize,
classifier forward, CAM einsum, 41x41 seed resize, thresholding, overlap
resolution — is ONE jitted function per batch shape; only the sparse
pickle packing runs on host.  This is the BASELINE.json headline path.

Flavors:
  * VOC2012 — fg + bg networks, bg cues from the bg net's lowest decile
    (02_cues/demo.py:134-214, utilities.py:183-234).
  * DeepGlobe — fg only, no background channel (utilities.py:236-278).
  * ADP — single 31/51-way network split into morph + func seed sets with
    synthesized Background/Other channels (02_cues/demo.py:224-321,
    adp_cues.py:244-339).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.data import registry
from wsss_tpu.io import artifacts
from wsss_tpu.models import build_classifier
from wsss_tpu.ops import cues as cue_ops
from wsss_tpu.ops import gradcam as gc_ops
from wsss_tpu.ops.filters import resize_bilinear

SEED_SIZE = 41  # 02_cues/demo.py:65


def _normalizer(norm):
    mean = jnp.asarray(norm.mean, jnp.float32)
    std = jnp.asarray(norm.std, jnp.float32)

    def f(img):
        return ((img * norm.scale - mean) / std) * norm.post_scale
    return f


class _ClassifierHandle:
    """A classifier + its calibrated thresholds + static Grad-CAM weights.

    Handle models build with models.infer_dtype(): every layer computes
    in bfloat16 on TPU (default since round 4 — CAM-label agreement vs
    f32 measured 1.0 at the bench config; MXU bf16 rate ~2x f32), f32
    elsewhere.  WSSS_TPU_NO_BF16_INFER=1 restores the reference's f32
    end-to-end numerics for A/B runs."""

    def __init__(self, model, variables, thresholds, input_size: int):
        self.model = model
        self.variables = variables
        self.thresholds = jnp.asarray(thresholds, jnp.float32).reshape(-1)
        self.input_size = input_size

        def feats_fn(x):
            return model.apply(variables, x)[1]

        from wsss_tpu.models import VGG16Classifier

        def head_fn(feats):
            # pre-sigmoid logit head applied to pooled features, matching
            # y_c = layers[-2].output (02_cues/utilities.py:89)
            if isinstance(model, VGG16Classifier):   # GAP head
                pooled = jnp.mean(feats, axis=(1, 2))
            else:                                    # M7/X1.7: global max
                pooled = jnp.max(feats, axis=(1, 2))
            return model.apply(variables, pooled,
                               method=lambda m, p: m.head(p))

        self.weights = jax.jit(
            lambda: gc_ops.gradcam_weights(
                feats_fn, head_fn, (input_size, input_size)))()

    @classmethod
    def random(cls, model_type: str, num_classes: int, input_size: int,
               seed: int = 0, thresholds: float | np.ndarray = 0.5):
        """Untrained handle for tests/benchmarks (weights random, threshold
        flat 0.5 like the reference's missing-.mat fallback,
        adp_cues.py:118-120)."""
        from wsss_tpu.models import infer_dtype
        model = build_classifier(model_type, num_classes,
                                 dtype=infer_dtype())
        x0 = jnp.zeros((1, input_size, input_size, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x0)
        th = np.broadcast_to(np.asarray(thresholds, np.float32),
                             (num_classes,))
        return cls(model, variables, th, input_size)


class VOCDeepGlobeCueGenerator:
    """Cue generation for VOC2012 (fg+bg nets) and DeepGlobe (fg only)."""

    def __init__(self, spec: registry.DatasetSpec, fg: _ClassifierHandle,
                 bg: Optional[_ClassifierHandle] = None,
                 thresh: float = 0.2, seed_size: int = SEED_SIZE):
        self.spec = spec
        self.fg, self.bg = fg, bg
        self.thresh = thresh
        self.seed_size = seed_size
        if spec.uses_bg_net and bg is None:
            raise ValueError(f'{spec.name} needs a background network '
                             '(02_cues/demo.py:136-148)')
        norm = _normalizer(spec.norm_cues)
        ss = (seed_size, seed_size)

        def run_net(handle, imgs_raw, gt_tags):
            x = norm(imgs_raw)
            scores, feats = handle.model.apply(handle.variables, x)
            is_pass = (scores >= handle.thresholds[None]) & (gt_tags > 0.5)
            cams = gc_ops.grad_cam(feats, handle.weights, is_pass)
            return resize_bilinear(cams, ss), is_pass

        @jax.jit
        def batch_fn(imgs_raw, gt_tags):
            h_fg, is_pass = run_net(self.fg, imgs_raw, gt_tags)
            if self.bg is not None:
                h_bg, _ = run_net(self.bg, imgs_raw, gt_tags)
                onehot = cue_ops.fgbg_cues(h_fg, h_bg, self.thresh)
            else:
                onehot = cue_ops.fg_cues(h_fg, self.thresh)
            return onehot, is_pass

        self._batch_fn = batch_fn

    def generate_batch(self, imgs_raw, gt_tags
                       ) -> Tuple[jax.Array, jax.Array]:
        """imgs_raw: [B,S,S,3] float 0..255 RGB; gt_tags: [B,C_fg].
        Returns (onehot cues [B,41,41,C_seg], is_pass [B,C_fg])."""
        return self._batch_fn(jnp.asarray(imgs_raw, jnp.float32),
                              jnp.asarray(gt_tags, jnp.float32))

    def class_inds(self, is_pass: np.ndarray) -> List[np.ndarray]:
        """'{i}_labels' values (02_cues/demo.py:205-208): VOC offsets fg
        indices by +1 for the bg channel; DeepGlobe stores raw indices."""
        off = 1 if self.spec.uses_bg_net else 0
        return [np.where(np.asarray(p))[0] + off for p in is_pass]

    def run(self, batches, verbose: bool = False,
            mesh=None) -> Dict[str, np.ndarray]:
        """Full-split cue generation -> pickle-format dict.

        mesh: optional jax.sharding.Mesh — shards each batch over the
        'data' axis so whole-split generation runs data-parallel across
        chips (the reference's per-GPU process spawn, SURVEY.md §2.8,
        as one program)."""
        from wsss_tpu.parallel.mesh import mesh_batches
        out: Dict[str, np.ndarray] = {}
        for b, (imgs, tags), b0 in mesh_batches(
                mesh, batches,
                lambda b: (b.images.astype(np.float32),
                           b.tags.astype(np.float32))):
            if mesh is not None:
                onehot, is_pass = self._batch_fn(imgs, tags)
                onehot, is_pass = onehot[:b0], is_pass[:b0]
            else:
                onehot, is_pass = self.generate_batch(imgs, tags)
            artifacts.pack_cues(np.asarray(onehot),
                                self.class_inds(np.asarray(is_pass)),
                                list(b.indices), out)
            if verbose:
                print(f'  cues for images {b.indices[0]}..{b.indices[-1]}')
        return out


class ADPCueGenerator:
    """ADP morph+func cue generation from one 31/51-way HistoNet
    (02_cues/demo.py:224-321)."""

    def __init__(self, handle: _ClassifierHandle, model_family: str,
                 thresh: float = 0.2, seed_size: int = SEED_SIZE):
        self.handle = handle
        self.thresh = thresh
        self.seed_size = seed_size
        self.maps = registry.adp_index_maps(model_family)
        self.morph_spec = registry.get('ADP-morph')
        self.func_spec = registry.get('ADP-func')
        self.is_x17 = model_family.upper().startswith('X1')
        norm = _normalizer(self.morph_spec.norm_cues)
        ss = (seed_size, seed_size)
        all31 = self.maps['x17_to_31'] if self.is_x17 else self.maps['all']
        # positions of morph/func/adipose classes within the 31-class set
        base = registry.ADP_CLASSES_VGG16
        morph31 = np.array([i for i, c in enumerate(base)
                            if c in registry.ADP_MORPH_CLASSES])
        func31 = np.array([i for i, c in enumerate(base)
                           if c in registry.ADP_FUNC_CLASSES])
        adipose31 = np.array([i for i, c in enumerate(base)
                              if c in registry.ADP_ADIPOSE_CLASSES])
        n_morph_valid = self.morph_spec.n_seg_classes   # 29
        n_func_valid = self.func_spec.n_seg_classes     # 5
        func_exception = tuple(
            self.func_spec.seg_class_names.index(c)
            for c in registry.ADP_BG_EXCEPTION['func'])

        @jax.jit
        def batch_fn(imgs_raw, gt_tags_unused):
            x = norm(imgs_raw)
            scores, feats = handle.model.apply(handle.variables, x)
            is_pass = scores >= handle.thresholds[None]
            cams = gc_ops.grad_cam(feats, handle.weights,
                                   jnp.ones_like(is_pass))
            cams = resize_bilinear(cams, ss)            # [B,41,41,C_out]
            cams31 = cams[..., all31]
            pass31 = is_pass[:, all31]
            # morph seeds: [bg] + 28 classes
            morph = jnp.zeros(cams31.shape[:3] + (n_morph_valid,))
            morph = morph.at[..., 1:].set(
                cams31[..., morph31] * pass31[:, None, None, morph31])
            morph = cue_ops.modify_by_htt(
                morph, imgs_raw,
                exception_inds=tuple(1 + np.searchsorted(
                    morph31, adipose31)),
                bg_ind=0)
            # func seeds: [bg, other] + 3 classes
            func = jnp.zeros(cams31.shape[:3] + (n_func_valid,))
            func = func.at[..., 2:].set(
                cams31[..., func31] * pass31[:, None, None, func31])
            adipose_cam = jnp.max(morph[..., 1 + np.searchsorted(
                morph31, adipose31)], axis=-1)
            func = cue_ops.modify_by_htt(
                func, imgs_raw, exception_inds=func_exception,
                bg_ind=0, other_ind=1, adipose_cam=adipose_cam)
            # per-image-max thresholds + overlap (adp_cues.py:304-339)
            onehot_m = cue_ops.resolve_overlap(cue_ops.threshold_cams(
                morph, self.thresh, per_image_max=True))
            onehot_f = cue_ops.resolve_overlap(cue_ops.threshold_cams(
                func, self.thresh, per_image_max=True))
            return onehot_m, onehot_f, is_pass

        self._batch_fn = batch_fn

    def generate_batch(self, imgs_raw):
        return self._batch_fn(jnp.asarray(imgs_raw, jnp.float32), None)

    def class_inds(self, is_pass: np.ndarray
                   ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """valid-set indices of passing classes; func prepends 'Other'=1
        (02_cues/demo.py:300-309)."""
        all31 = self.maps['x17_to_31'] if self.is_x17 else self.maps['all']
        p31 = is_pass[:, all31]
        base = registry.ADP_CLASSES_VGG16
        morph2valid = np.array(
            [self.morph_spec.seg_class_names.index(c) for c in base
             if c in registry.ADP_MORPH_CLASSES])
        func2valid = np.array(
            [self.func_spec.seg_class_names.index(c) for c in base
             if c in registry.ADP_FUNC_CLASSES])
        morph31 = np.array([i for i, c in enumerate(base)
                            if c in registry.ADP_MORPH_CLASSES])
        func31 = np.array([i for i, c in enumerate(base)
                           if c in registry.ADP_FUNC_CLASSES])
        m_inds = [morph2valid[p31[i, morph31] > 0.5]
                  for i in range(p31.shape[0])]
        f_inds = [np.append(1, func2valid[p31[i, func31] > 0.5])
                  for i in range(p31.shape[0])]
        return m_inds, f_inds

    def run(self, batches, verbose: bool = False, mesh=None
            ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        """mesh: optional jax.sharding.Mesh — shards each batch over the
        'data' axis (same contract as VOCDeepGlobeCueGenerator.run)."""
        from wsss_tpu.parallel.mesh import mesh_batches
        out_m: Dict[str, np.ndarray] = {}
        out_f: Dict[str, np.ndarray] = {}
        for b, (imgs,), b0 in mesh_batches(
                mesh, batches,
                lambda b: (b.images.astype(np.float32),)):
            if mesh is not None:
                oh_m, oh_f, is_pass = self._batch_fn(imgs, None)
                oh_m, oh_f, is_pass = oh_m[:b0], oh_f[:b0], is_pass[:b0]
            else:
                oh_m, oh_f, is_pass = self.generate_batch(imgs)
            m_inds, f_inds = self.class_inds(np.asarray(is_pass))
            artifacts.pack_cues(np.asarray(oh_m), m_inds,
                                list(b.indices), out_m)
            artifacts.pack_cues(np.asarray(oh_f), f_inds,
                                list(b.indices), out_f)
            if verbose:
                print(f'  ADP cues for images '
                      f'{b.indices[0]}..{b.indices[-1]}')
        return out_m, out_f


def save_cue_images(cue_dict: Dict[str, np.ndarray], gt_batches,
                    palette: np.ndarray, out_dir: str,
                    n_seg_classes: int, seed_size: int = SEED_SIZE,
                    dataset: str = 'VOC2012',
                    overlay_r: float = 0.75) -> int:
    """Debug PNGs for evaluated cues (02_cues/demo.py:466-477): the
    colorized cue prediction + an overlay on the original image
    (DeepGlobe images are downsampled /4 there to save space; we keep
    full size — the overlay content is identical)."""
    import os
    from wsss_tpu.eval import reports
    is_adp = dataset.startswith('ADP')
    n = 0
    for b in gt_batches:
        for j, name in enumerate(b.names):
            dense = artifacts.unpack_cues(
                cue_dict, int(b.indices[j]),
                (seed_size, seed_size, n_seg_classes))
            img = b.images[j]
            hw = img.shape[:2]
            if is_adp:
                # per-class accumulated color mask (demo.py:592-598 —
                # overlapping ADP cues sum their class colors)
                mask = np.zeros(hw + (3,), np.float32)
                for k in range(n_seg_classes):
                    up = _nearest_resize(dense[:, :, k], hw) == 1.0
                    mask += up[..., None] * palette[k][None, None]
                color = np.clip(mask, 0, 255).astype(np.uint8)
            else:
                lab = np.argmax(dense, -1)
                if dataset.startswith('DeepGlobe'):
                    lab[dense.sum(-1) == 0] = n_seg_classes - 1
                up = _nearest_resize(lab, hw).astype(np.int32)
                color = reports.colorize(up, palette)
            reports.save_png(os.path.join(out_dir, name + '.png'),
                             color)
            reports.save_png(
                os.path.join(out_dir, name + '_overlay.png'),
                reports.overlay(np.asarray(img, np.float32), color,
                                overlay_r))
            n += 1
    return n


def _nearest_resize(arr: np.ndarray, hw) -> np.ndarray:
    """Nearest-neighbor resize of a [H,W] map (cv2.INTER_NEAREST stand-in)."""
    import jax.image as jimage
    return np.asarray(jimage.resize(
        jnp.asarray(arr, jnp.float32)[..., None], hw + (1,),
        'nearest'))[..., 0]


def eval_cues_miou(cue_dict: Dict[str, np.ndarray], gt_batches,
                   n_seg_classes: int, seed_size: int = SEED_SIZE,
                   dataset: str = 'VOC2012',
                   size: Optional[int] = None
                   ) -> Tuple[np.ndarray, float]:
    """Cue-quality mIoU vs GT — exact transcription of the reference's
    per-dataset accumulation (02_cues/demo.py:323-485, :583-625):

      * VOC2012 (demo.py:424-441): cue argmax at the 41x41 seed grid —
        un-cued pixels fall to argmax(zeros)=0 i.e. BACKGROUND — nearest-
        resized to GT size; per-class intersect/union over all 21 classes
        against the raw GT indices (255 border pixels match no class but
        still count in the union when predicted); mIoU = mean(I/(U+1e-7)).
      * DeepGlobe (demo.py:442-463): un-cued pixels set to ignore_ind=6
        (the dropped 'unknown' class), I/U accumulated over the first 6
        classes only.
      * ADP morph/func (demo.py:583-625): each class channel is an
        INDEPENDENT binary mask (cues may overlap across classes — no
        argmax), nearest-resized to the network input `size`; GT is also
        evaluated at `size`; IoU = I/U with NO epsilon, mIoU = plain mean.

    Returns (per-class IoU over the evaluated classes, mIoU)."""
    is_adp = dataset.startswith('ADP')
    is_dg = dataset.startswith('DeepGlobe')
    n_eval = n_seg_classes - 1 if is_dg else n_seg_classes
    intersects = np.zeros(n_eval, np.int64)
    unions = np.zeros(n_eval, np.int64)
    for b in gt_batches:
        if b.gt is None:
            continue
        dense = np.stack([
            artifacts.unpack_cues(cue_dict, int(i),
                                  (seed_size, seed_size, n_seg_classes))
            for i in b.indices])
        for j in range(dense.shape[0]):
            gt = b.gt[j]
            if is_adp:
                hw = (size, size) if size else gt.shape
                if gt.shape != hw:   # ref evals ADP at network size
                    gt = _nearest_resize(gt, hw).astype(np.int32)
                # per-class binary channels, no argmax (demo.py:594-600)
                for k in range(n_eval):
                    pred_mask = _nearest_resize(dense[j, :, :, k],
                                                hw) == 1.0
                    gt_mask = gt == k
                    intersects[k] += int(np.sum(gt_mask & pred_mask))
                    unions[k] += int(np.sum(gt_mask | pred_mask))
                continue
            cue_lab = np.argmax(dense[j], -1)
            if is_dg:
                # un-cued -> ignore_ind (demo.py:450-451)
                cue_lab[dense[j].sum(-1) == 0] = n_eval
            pred = _nearest_resize(cue_lab, gt.shape).astype(np.int32)
            for k in range(n_eval):
                gt_mask = gt == k
                pred_mask = pred == k
                intersects[k] += int(np.sum(gt_mask & pred_mask))
                unions[k] += int(np.sum(gt_mask | pred_mask))
    if is_adp:
        with np.errstate(divide='ignore', invalid='ignore'):
            iou = intersects / unions            # demo.py:620 — no eps
    else:
        iou = intersects / (unions + 1e-7)       # demo.py:481
    return np.asarray(iou), float(np.mean(iou))
