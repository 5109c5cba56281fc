"""Method: IRNet — inter-pixel relations for semantic segmentation
(the reference's 03b stack, all seven passes in one module).

Pipeline (03b_irn/func_sample.py:232-274):
  1. make_cam      — multi-scale + flip CAM inference (step/make_cam.py)
  2. eval_cam      — CAM mIoU (step/eval_cam.py)
  3. cam_to_ir_label — confident fg/bg + CRF label refinement
                     (step/cam_to_ir_label.py)
  4. train_irn     — affinity/displacement training (step/train_irn.py)
  5. make_sem_seg  — random-walk propagation (step/make_sem_seg_labels.py)
  6. eval_sem_seg  — final mIoU (step/eval_sem_seg.py)

The reference parallelizes steps 1/3/5 by spawning one OS process per GPU
writing disjoint .npy/.png shards (make_cam.py:120-122); here each step is
a batched jitted program (shard the batch over a mesh for multi-chip).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wsss_tpu.data import registry
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle, _normalizer
from wsss_tpu.models.irn import IRNet
from wsss_tpu.ops import cues as cue_ops
from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf.meanfield import crf_label_refine
from wsss_tpu.ops.filters import resize_bilinear
from wsss_tpu.ops.random_walk import PathIndex, propagate_to_edge, \
    to_affinity_sliced
from wsss_tpu.train.schedules import poly_decay


def get_strided_size(hw, stride):
    """misc.imutils.get_strided_size (make_cam.py:41)."""
    return ((hw[0] - 1) // stride + 1, (hw[1] - 1) // stride + 1)


def get_strided_up_size(hw, stride):
    """misc.imutils.get_strided_up_size (make_cam.py:42)."""
    st = get_strided_size(hw, stride)
    return st[0] * stride, st[1] * stride


# ---------------------------------------------------------------------------
# Step 1: make_cam — multi-scale+flip CAM inference
# ---------------------------------------------------------------------------

class CAMInference:
    """MSF CAM (step/make_cam.py:25-93 + net/{vgg16,m7}_cam.py).

    The CAM branch convolves the final conv features with the classifier's
    weight matrix (VGG16, vgg16_cam.py:48) or the stored Grad-CAM weights
    (M7, m7_cam.py:45-48); image + horizontal flip are summed.

    TPU design: ONE jitted program per image shape computes the whole
    multi-scale pyramid for a BATCH of images — each scale's forward runs
    once with image+flip fused into the batch axis, and the strided and
    high-res outputs are two resizes of the same CAM (the reference
    dispatches per image per scale per target, make_cam.py:56-69).
    Shard the batch over a mesh via ``run(..., mesh=)``-style callers.
    """

    def __init__(self, handle: _ClassifierHandle, spec: registry.DatasetSpec,
                 model_type: str = 'VGG16',
                 scales: Sequence[float] = (1.0, 0.5, 1.5, 2.0),
                 adp_htt: Optional[str] = None):
        self.handle = handle
        self.spec = spec
        self.scales = tuple(scales)
        self.adp_htt = adp_htt
        self.model_type = model_type
        norm = _normalizer(spec.norm_irn)
        is_vgg = model_type.upper().startswith('VGG')
        is_x17 = model_type.upper().startswith('X1')
        maps = registry.adp_index_maps(model_type) if adp_htt else None

        def cam_weights():
            if is_vgg:
                # pure CAM: the classifier Dense kernel [F, C]
                return handle.variables['params']['head']['kernel']
            return handle.weights  # M7/X1.7: Grad-CAM weights [F, C]

        @jax.jit
        def msf_batch(imgs):
            """imgs: [B,H,W,3] raw RGB.  Returns (cam [B,C,sh,sw],
            high_res [B,C,uh,uw], scores [B,C_out]) — multi-scale sums,
            flip-merged, both target grids from one forward per scale."""
            b, h, w = imgs.shape[:3]
            strided = get_strided_size((h, w), 4)
            up = get_strided_up_size((h, w), 16)
            cam_sum = jnp.zeros((b, 0))   # placeholder, set on 1st scale
            hi_sum = None
            scores0 = None
            for s in self.scales:
                sh, sw = int(round(h * s)), int(round(w * s))
                img_s = resize_bilinear(imgs, (sh, sw))
                both = jnp.concatenate([img_s, img_s[:, :, ::-1]], axis=0)
                scores, feats = handle.model.apply(handle.variables,
                                                   norm(both))
                cam = jnp.maximum(
                    jnp.einsum('bhwf,fc->bhwc',
                               feats.astype(jnp.float32), cam_weights()),
                    0.)
                cam = cam[:b] + cam[b:, :, ::-1]        # merge flip
                cam = jnp.transpose(cam, (0, 3, 1, 2))  # [B,C,h,w]
                cs = jax.image.resize(
                    cam, cam.shape[:2] + strided, 'bilinear')
                cu = jax.image.resize(cam, cam.shape[:2] + up, 'bilinear')
                cam_sum = cs if hi_sum is None else cam_sum + cs
                hi_sum = cu if hi_sum is None else hi_sum + cu
                if s == 1.0:
                    scores0 = scores[:b]
            if scores0 is None:
                scores0 = jnp.zeros((b, cam_weights().shape[1]))
            return cam_sum, hi_sum[:, :, :h, :w], scores0

        self._msf_batch = msf_batch
        self._maps = maps
        self._is_x17 = is_x17

    def _modify_adp(self, cam31, img_raw):
        """On-device ADP bg/other synthesis (net/common_cam.py:31-92):
        morph clamps bg at 0 (relu), func does not."""
        maps = self._maps
        base = registry.ADP_CLASSES_VGG16
        morph31 = np.array([i for i, c in enumerate(base)
                            if c in registry.ADP_MORPH_CLASSES])
        func31 = np.array([i for i, c in enumerate(base)
                           if c in registry.ADP_FUNC_CLASSES])
        adipose31 = np.array([i for i, c in enumerate(base)
                              if c in registry.ADP_ADIPOSE_CLASSES])
        cam_hwc = jnp.transpose(cam31, (1, 2, 0))[None]
        if self.adp_htt == 'morph':
            vol = jnp.zeros(cam_hwc.shape[:3] + (1 + len(morph31),))
            vol = vol.at[..., 1:].set(cam_hwc[..., morph31])
            vol = cue_ops.modify_by_htt(
                vol, img_raw, exception_inds=tuple(
                    1 + np.searchsorted(morph31, adipose31)),
                bg_ind=0, relu_bg=True)
        else:
            vol = jnp.zeros(cam_hwc.shape[:3] + (2 + len(func31),))
            vol = vol.at[..., 2:].set(cam_hwc[..., func31])
            adipose_cam = jnp.max(cam_hwc[..., adipose31], axis=-1)
            vol = cue_ops.modify_by_htt(
                vol, img_raw,
                exception_inds=tuple(2 + np.arange(len(func31))),
                bg_ind=0, other_ind=1, adipose_cam=adipose_cam)
        return jnp.transpose(vol[0], (2, 0, 1))

    def make_cam_batch(self, imgs_raw: np.ndarray,
                       tags: Optional[np.ndarray], mesh=None
                       ) -> list:
        """Batch of same-shape images -> list of {'keys','cam','high_res'}
        dicts (make_cam.py:78-88 per image).

        imgs_raw: [B,H,W,3] RGB 0..255.  tags: [B,C_fg] or None.
        mesh: optional jax.sharding.Mesh — shards the batch over the
        'data' axis (the reference's one-process-per-GPU split,
        make_cam.py:120-122, as a single program)."""
        imgs_j = jnp.asarray(imgs_raw, jnp.float32)
        if mesh is not None:
            from wsss_tpu.parallel.mesh import shard_batch
            (imgs_sh,), b0 = shard_batch(mesh, imgs_raw)
            cam, hi, scores = self._msf_batch(imgs_sh)
            cam, hi, scores = cam[:b0], hi[:b0], scores[:b0]
        else:
            cam, hi, scores = self._msf_batch(imgs_j)
        return [self._finalize(imgs_raw[i], cam[i], hi[i], scores[i],
                               None if tags is None else tags[i])
                for i in range(imgs_raw.shape[0])]

    def make_cam(self, img_raw: np.ndarray, tags: Optional[np.ndarray]
                 ) -> Dict[str, np.ndarray]:
        """One image -> {'keys','cam','high_res'} (make_cam.py:78-88).

        img_raw: [H,W,3] RGB 0..255.  tags: [C_fg] image labels (train
        split) or None (use thresholded predictions, make_cam.py:49-52).
        """
        return self.make_cam_batch(
            img_raw[None], None if tags is None else tags[None])[0]

    def _finalize(self, img_raw, cam31, hi31, scores0, tags
                  ) -> Dict[str, np.ndarray]:
        """Per-image key selection / ADP synthesis / normalization."""
        if self._is_x17:
            keep = self._maps['x17_to_31']
            cam31, hi31 = cam31[keep], hi31[keep]
            scores0 = scores0[keep]
        if self.adp_htt:
            img_j = jnp.asarray(img_raw, jnp.float32)[None]
            cam31 = self._modify_adp(cam31, img_j)
            hi31 = self._modify_adp(hi31, img_j)
            nbg = 1 if self.adp_htt == 'morph' else 2
            fg31 = (np.array([i for i, c in enumerate(
                registry.ADP_CLASSES_VGG16)
                if c in (registry.ADP_MORPH_CLASSES
                         if self.adp_htt == 'morph'
                         else registry.ADP_FUNC_CLASSES)]))
            th = np.asarray(self.handle.thresholds)
            th31 = th[self._maps['x17_to_31']] if self._is_x17 else th
            valid_fg = (np.where(tags > 0.5)[0] if tags is not None else
                        np.where(np.asarray(scores0)[fg31] >=
                                 th31[fg31])[0])
            keys = np.concatenate([np.arange(nbg), valid_fg + nbg])
        else:
            if tags is not None:
                valid = np.where(tags > 0.5)[0]
            else:
                th = np.asarray(self.handle.thresholds)
                sc = np.asarray(scores0)
                passed = sc >= th
                if not passed.any():
                    passed[sc.argmax()] = True  # vgg16_cam.py:41-42
                valid = np.where(passed)[0]
            keys = valid
            cam31 = cam31[jnp.asarray(valid)] if len(valid) else cam31[:0]
            hi31 = hi31[jnp.asarray(valid)] if len(valid) else hi31[:0]
        if len(keys) == 0:
            return {'keys': np.empty(0, np.int64),
                    'cam': np.empty(0), 'high_res': np.empty(0)}
        if self.adp_htt:
            sel = jnp.asarray(keys)
            cam31, hi31 = cam31[sel], hi31[sel]
        cam31 = cam31 / (jnp.max(cam31, axis=(1, 2), keepdims=True) + 1e-5)
        hi31 = hi31 / (jnp.max(hi31, axis=(1, 2), keepdims=True) + 1e-5)
        return {'keys': np.asarray(keys),
                'cam': np.asarray(cam31),
                'high_res': np.asarray(hi31)}


# ---------------------------------------------------------------------------
# Step 2: eval_cam label assembly
# ---------------------------------------------------------------------------

def eval_cam_pred(cam_dict: Dict[str, np.ndarray], dataset: str,
                  cam_eval_thres: float) -> Optional[np.ndarray]:
    """Per-dataset CAM -> label-map assembly, exactly eval_cam.py:48-62:

      * VOC2012: pad a constant `cam_eval_thres` channel in front of
        high_res and shift keys by the background class (:49-52).
      * ADP: argmax the raw high_res channels — keys already include the
        background classes (make_cam.py:54-61), no padding (:53-55).
      * DeepGlobe: argmax the raw STRIDED 'cam' array with raw keys
        (:56-58) — NOT high_res.

    Returns the label map at the cams' resolution, or None when the cam
    dict is empty for a non-VOC dataset (the reference would crash on
    argmax of an empty array; such images are skipped)."""
    if dataset == 'VOC2012':
        cams = np.pad(cam_dict.get('high_res', cam_dict['cam']),
                      ((1, 0), (0, 0), (0, 0)),
                      constant_values=cam_eval_thres)
        keys = np.pad(cam_dict['keys'] + 1, (1, 0), mode='constant')
    elif dataset.startswith('ADP'):
        if cam_dict['keys'].size == 0:
            return None
        keys = cam_dict['keys']
        cams = cam_dict.get('high_res', cam_dict['cam'])
    else:                              # DeepGlobe / DeepGlobe_balanced
        if cam_dict['keys'].size == 0:
            return None
        keys = cam_dict['keys']
        cams = cam_dict['cam']
    return np.asarray(keys)[np.argmax(cams, axis=0)]


# ---------------------------------------------------------------------------
# Step 3: cam_to_ir_label
# ---------------------------------------------------------------------------

def cam_to_ir_label(img_raw: np.ndarray, cam_dict: Dict[str, np.ndarray],
                    dataset: str, conf_fg_thres: float,
                    conf_bg_thres: float = 0.05,
                    cfg: crf_config.CRFConfig = crf_config.IRN_LABEL
                    ) -> np.ndarray:
    """step/cam_to_ir_label.py:18-77 — confident-region pseudo labels with
    CRF refinement; 255 = ignore."""
    keys = cam_dict['keys']
    if keys.size == 0:
        return np.full(img_raw.shape[:2], 255, np.uint8)
    img_j = jnp.asarray(img_raw, jnp.float32)
    if dataset == 'VOC2012':
        keys_pad = np.pad(keys + 1, (1, 0), mode='constant')
        hr = np.pad(cam_dict['high_res'], ((1, 0), (0, 0), (0, 0)),
                    constant_values=conf_fg_thres)
        fg_lab = np.argmax(hr, 0)
        pred = np.asarray(crf_label_refine(
            img_j, jnp.asarray(fg_lab), len(keys_pad), cfg))
        fg_conf = keys_pad[pred]
        hr_bg = np.pad(cam_dict['high_res'], ((1, 0), (0, 0), (0, 0)),
                       constant_values=conf_bg_thres)
        bg_lab = np.argmax(hr_bg, 0)
        pred = np.asarray(crf_label_refine(
            img_j, jnp.asarray(bg_lab), len(keys_pad), cfg))
        bg_conf = keys_pad[pred]
        conf = fg_conf.copy()
        conf[fg_conf == 0] = 255
        conf[(bg_conf + fg_conf) == 0] = 0
    else:
        # ADP / DeepGlobe (cam_to_ir_label.py:29-41,59-74); DeepGlobe
        # downsamples the image x4 and uses the strided cam
        keys_pad = np.concatenate([[-1], keys])
        src = 'cam' if dataset.startswith('DeepGlobe') else 'high_res'
        cam = cam_dict[src]
        if dataset.startswith('DeepGlobe'):
            h4 = img_raw.shape[0] // 4
            img_j = resize_bilinear(img_j[None], (h4, h4))[0]
            cam = np.asarray(resize_bilinear(
                jnp.transpose(jnp.asarray(cam), (1, 2, 0))[None],
                (h4, h4))[0]).transpose(2, 0, 1)
        hr = np.pad(cam, ((1, 0), (0, 0), (0, 0)),
                    constant_values=conf_fg_thres)
        fg_lab = np.argmax(hr, 0)
        pred = np.asarray(crf_label_refine(
            img_j, jnp.asarray(fg_lab), len(keys_pad), cfg))
        conf = keys_pad[pred].astype(np.int64)
        conf[conf == -1] = 255
    return conf.astype(np.uint8)


# ---------------------------------------------------------------------------
# Step 4: train_irn
# ---------------------------------------------------------------------------

def affinity_labels(ir_label_reduced: np.ndarray, path_index: PathIndex,
                    n_valid_classes: int):
    """GetAffinityLabelFromIndices (voc12/dataloader.py:108-134).

    ir_label_reduced: [h,w] int (255 = ignore) at the /4 grid.
    Returns (bg_pos, fg_pos, neg) float32 [P, M]."""
    src, dst = path_index.pair_indices(ir_label_reduced.shape)
    flat = ir_label_reduced.reshape(-1)
    lab_from = flat[src][None]          # [1,M]
    lab_to = flat[dst]                  # [P,M]
    valid = (lab_from < n_valid_classes) & (lab_to < n_valid_classes)
    equal = lab_from == lab_to
    pos = equal & valid
    bg_pos = (pos & (lab_from == 0)).astype(np.float32)
    fg_pos = (pos & (lab_from > 0)).astype(np.float32)
    neg = (~equal & valid).astype(np.float32)
    return bg_pos, fg_pos, neg


class IRNTrainer:
    """train_irn step (train_irn.py:14-168): affinity + displacement
    losses, PolyOptimizer with dp-head lr x10, post-training displacement
    mean calibration."""

    def __init__(self, backbone: str, num_classes: int, crop_size: int,
                 radius: int = 10, lr: float = 0.1,
                 weight_decay: float = 1e-4, max_step: int = 1000):
        self.net = IRNet(backbone=backbone)
        self.crop_size = crop_size
        grid = (crop_size // 4, crop_size // 4)
        # reference geometry: radius 10 on a crop/4 grid (train_irn.py:16);
        # clamp for tiny debug grids where the crop margin would vanish
        radius = min(radius, max(2, min(grid) // 2))
        self.path_index = PathIndex(radius)
        self.grid = grid
        self.disp_target = jnp.asarray(
            self.path_index.search_dst.T[None, :, :, None],
            jnp.float32)  # [1,2,P,1]
        rf = self.path_index.radius_floor
        self.crop_hw = (grid[0] - rf, grid[1] - 2 * rf)
        sched = poly_decay(lr, max_step)

        def label_fn(path, _):
            names = [getattr(p, 'key', str(p)) for p in path]
            if any(n.startswith('fc_dp') for n in names):
                return 'dp'          # lr x10 (train_irn.py:89)
            if any(n.startswith('fc_edge') for n in names):
                return 'edge'
            return 'frozen'

        self._label_fn = label_fn
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.multi_transform(
                {'edge': optax.sgd(sched, momentum=0.9),
                 'dp': optax.chain(optax.scale(10.0),
                                   optax.sgd(sched, momentum=0.9)),
                 'frozen': optax.set_to_zero()},
                lambda params: jax.tree_util.tree_map_with_path(
                    label_fn, params)),
        )

    def init(self, rng):
        x = jnp.zeros((1, self.crop_size, self.crop_size, 3))
        variables = jax.jit(self.net.init)(rng, x)
        return variables, self.tx.init(variables['params'])

    def _pair_displacement(self, disp):
        """to_pair_displacement (vgg16_irn.py:264-283). disp: [B,h,w,2].
        Returns [B,2,P,M]."""
        rf = self.path_index.radius_floor
        ch, cw = self.crop_hw
        d = jnp.transpose(disp, (0, 3, 1, 2))          # [B,2,h,w]
        src = d[:, :, :ch, rf:rf + cw].reshape(d.shape[0], 2, 1, -1)
        dsts = [d[:, :, dy:dy + ch, rf + dx:rf + dx + cw]
                for dy, dx in self.path_index.search_dst]
        dst = jnp.stack(dsts, axis=2).reshape(d.shape[0], 2,
                                              len(dsts), -1)
        return src - dst

    def losses(self, variables, imgs_norm, bg_pos, fg_pos, neg):
        """train_irn.py:112-125."""
        edge, disp = self.net.apply(variables, imgs_norm)
        b = edge.shape[0]
        # Align the edge map to the affinity-label grid (crop/4).  The
        # reference instead flat-indexes whatever grid the edge head
        # emits with crop/4-grid indices (m7_irn.py:142-155 +
        # train_irn.py:16) — for M7's /2-grid edge head that aliases
        # the top rows of the map; we resize instead (documented
        # deviation, PARITY.md).  VGG16/resnet50 emit /4 directly.
        if edge.shape[1:3] != self.grid:
            edge = resize_bilinear(edge, self.grid)
        # sliced path-max: the flat [B,P,L,M] gather was 184 of the
        # step's 210 ms on a v5e (scripts/profile_irn_step.py, round 5)
        aff = to_affinity_sliced(jax.nn.sigmoid(edge[..., 0]),
                                 self.path_index)       # [B,P,M]
        pos_aff_loss = -jnp.log(aff + 1e-5)
        neg_aff_loss = -jnp.log(1.0 + 1e-5 - aff)
        pair_disp = self._pair_displacement(disp)       # [B,2,P,M]
        dp_fg_loss = jnp.abs(pair_disp - self.disp_target)
        dp_bg_loss = jnp.abs(pair_disp)

        bg_pos_l = jnp.sum(bg_pos * pos_aff_loss) / (jnp.sum(bg_pos) + 1e-5)
        fg_pos_l = jnp.sum(fg_pos * pos_aff_loss) / (jnp.sum(fg_pos) + 1e-5)
        pos_l = bg_pos_l / 2 + fg_pos_l / 2
        neg_l = jnp.sum(neg * neg_aff_loss) / (jnp.sum(neg) + 1e-5)
        dp_fg_l = jnp.sum(dp_fg_loss * fg_pos[:, None]) / (
            2 * jnp.sum(fg_pos) + 1e-5)
        dp_bg_l = jnp.sum(dp_bg_loss * bg_pos[:, None]) / (
            2 * jnp.sum(bg_pos) + 1e-5)
        total = (pos_l + neg_l) / 2 + (dp_fg_l + dp_bg_l) / 2
        return total, {'pos_aff': pos_l, 'neg_aff': neg_l,
                       'dp_fg': dp_fg_l, 'dp_bg': dp_bg_l}

    def train_step(self, variables, opt_state, imgs_norm, bg_pos, fg_pos,
                   neg):
        params = variables['params']
        rest = {k: v for k, v in variables.items() if k != 'params'}

        def f(p):
            return self.losses({'params': p, **rest}, imgs_norm, bg_pos,
                               fg_pos, neg)

        (loss, parts), grads = jax.value_and_grad(f, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {'params': params, **rest}, opt_state, dict(parts,
                                                           total=loss)

    def jitted_step(self):
        return jax.jit(self.train_step)

    def calibrate_disp_mean(self, variables, img_batches) -> np.ndarray:
        """Displacement mean over an inference set (train_irn.py:152-165)."""
        means = []
        fwd = jax.jit(lambda v, x: self.net.apply(v, x))
        for imgs in img_batches:
            _, disp = fwd(variables, jnp.asarray(imgs, jnp.float32))
            means.append(np.asarray(jnp.mean(disp, axis=(0, 1, 2))))
        return np.mean(np.stack(means), axis=0)


# ---------------------------------------------------------------------------
# Step 5: make_sem_seg
# ---------------------------------------------------------------------------

def make_sem_seg(edge: jnp.ndarray, cam_dict: Dict[str, np.ndarray],
                 dataset: str, orig_hw: Tuple[int, int],
                 beta: float = 10.0, exp_times: int = 8,
                 sem_seg_bg_thres: float = 0.25,
                 walk_downsample: int = 6, mesh=None) -> np.ndarray:
    """step/make_sem_seg_labels.py:40-140 — random-walk propagation.

    edge: [h,w] sigmoid edge map on the CAM grid (resized by caller if
    needed).  Returns the label map at the dataset's output resolution.

    walk_downsample: the reference's extra DeepGlobe /6 before the walk
    (make_sem_seg_labels.py:101-104) exists because one GPU cannot hold
    the [N,N] transition matrix; lowering it (e.g. 3) quadruples N^2 —
    pass `mesh` to shard the matrix powers 2-D over chips
    (ops/random_walk.py:propagate_to_edge_sharded).
    """
    keys = cam_dict['keys']
    if keys.size == 0:
        if dataset.startswith('DeepGlobe'):
            return np.full((orig_hw[0] // 4, orig_hw[1] // 4), 5, np.uint8)
        return np.zeros(orig_hw, np.uint8)
    cam = jnp.asarray(cam_dict['cam'])
    if dataset.startswith('DeepGlobe'):
        # extra downsample before the walk (make_sem_seg_labels.py:101-104)
        h6 = max(cam.shape[1] // walk_downsample, 4)
        w6 = max(cam.shape[2] // walk_downsample, 4)
        cam = jnp.transpose(resize_bilinear(
            jnp.transpose(cam, (1, 2, 0))[None], (h6, w6))[0], (2, 0, 1))
    if edge.shape != cam.shape[1:]:
        edge = resize_bilinear(edge[None, ..., None],
                               cam.shape[1:])[0, ..., 0]
    if mesh is not None:
        from wsss_tpu.ops.random_walk import propagate_to_edge_sharded
        rw = propagate_to_edge_sharded(cam, edge, mesh, beta=beta,
                                       exp_times=exp_times, radius=5)
    else:
        rw = propagate_to_edge(cam, edge, beta=beta, exp_times=exp_times,
                               radius=5)
    if dataset == 'VOC2012':
        keys_pad = np.pad(keys + 1, (1, 0), mode='constant')
        rw_up = resize_bilinear(
            jnp.transpose(rw, (1, 2, 0))[None], orig_hw)[0]
        rw_up = rw_up / jnp.max(rw_up)
        rw_bg = jnp.concatenate(
            [jnp.full(orig_hw + (1,), sem_seg_bg_thres), rw_up], axis=-1)
        pred = np.asarray(jnp.argmax(rw_bg, -1))
        return keys_pad[pred].astype(np.uint8)
    if dataset.startswith('DeepGlobe'):
        out_hw = (orig_hw[0] // 4, orig_hw[1] // 4)
    else:
        out_hw = orig_hw
    rw_up = resize_bilinear(jnp.transpose(rw, (1, 2, 0))[None], out_hw)[0]
    rw_up = rw_up / jnp.max(rw_up)
    pred = np.asarray(jnp.argmax(rw_up, -1))
    return keys[pred].astype(np.uint8)
