"""Faster R-CNN (NHWC, flax) with static-shape XLA-native detection heads.

TPU-native re-design of the reference's vendored torchvision detector
(``model/faster_rcnn.py``, 2571 LoC). Parity map:

  GeneralizedRCNN.forward contract -> model/faster_rcnn.py:56-133
      __call__(images, targets=None, manual_proposals=None, return_feat=False)
      returns (detections, losses, feats); training_mode == targets given.
  GeneralizedRCNNTransform          -> model/faster_rcnn.py:262-263,2266-2349
  FeaturePyramidNetwork/BackboneWithFPN -> model/faster_rcnn.py:592-639
  AnchorGenerator                   -> model/faster_rcnn.py:466
  RPNHead / RegionProposalNetwork   -> model/faster_rcnn.py:1885-2260
  TwoMLPHead / FastRCNNPredictor    -> model/faster_rcnn.py:377-461
  RoIHeads (+fastrcnn_loss)         -> model/faster_rcnn.py:1011-,1402-1440
  fasterrcnn_mobilenet_v3_large_fpn -> model/faster_rcnn.py:733-795
  fasterrcnn_resnet50_fpn_v2        -> model/faster_rcnn.py:939-

TPU-first redesign (SURVEY.md §7 "hard parts" — no dynamic shapes):

* the torch list-of-images / list-of-dicts API becomes fixed-size padded
  tensors + validity masks: targets {boxes (B,G,4), labels (B,G), valid
  (B,G)}, proposals (B,P,4)+mask, detections (B,D,…)+mask;
* per-image loops become ``vmap``; NMS is the exact fixpoint-greedy kernel
  in ``edtr_tpu.ops.boxes`` (vmapped per class/level); RoIAlign is the
  separable one-hot-matmul kernel (``edtr_tpu.ops.roi_align``);
* all top-k sizes (pre/post NMS, detections/img, sampled rois) are static.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edtr_tpu.models.mobilenetv3 import MobileNetV3
from edtr_tpu.models.resnet import ResNet, IMAGENET_MEAN, IMAGENET_STD
from edtr_tpu.ops import boxes as box_ops
from edtr_tpu.ops.roi_align import multiscale_roi_align

# The RPN/box-head NMS runs per (image, class/level) under plain vmap: the
# bit-packed suppression build (ops/boxes.py:_packed_keep) keeps N²/32 BITS
# resident per lane (125 KB at N=1024) instead of the old dense (N, N) fp32
# matrices (80 MB/img for the box head at C=21).
#
# bs16 note (round-5 bisect, results/chip_queue/verify_nms_bs16.log +
# tools/debug_nms_chip.py): a single bs16 detect executable faults the v5e
# device with BOTH NMS designs, while the packed graph's compiled footprint
# is only ~2 GB (memory_analysis: temp 1.0 GB at bs8) and the packed NMS
# alone runs clean under a (16, 20)-way vmap — so r4's "OOM" diagnosis was
# wrong and the fault is a bs16-only backend issue in the surrounding
# graph, not an NMS memory wall. Batches >8 therefore still chunk through
# ``lax.map`` — as a DEVICE-FAULT guard (the fault wedges the chip for
# ~an hour through the tunnel), not a memory crutch.
_DETECT_BATCH_CHUNK = 8


def _map_images(fn, args):
    """Per-image map over a tuple of leading-axis-batched pytrees."""
    if jax.tree.leaves(args)[0].shape[0] <= _DETECT_BATCH_CHUNK:
        return jax.vmap(fn)(*args)
    return jax.lax.map(lambda t: fn(*t), args, batch_size=_DETECT_BATCH_CHUNK)

Dtype = Any


# =============================================================================
# Transform
# =============================================================================

class RCNNTransform:
    """Resize + normalize; parity ``GeneralizedRCNNTransform`` (:2266-2349).

    Static variant: all images in a batch share (H, W), so the torch
    per-image resize loop collapses into one bilinear resize. ``scale`` is
    computed from static shapes; boxes rescale by the same factor.
    """

    def __init__(self, min_size: int = 800, max_size: int = 1333,
                 image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD,
                 size_divisible: int = 32):
        self.min_size = min_size
        self.max_size = max_size
        self.image_mean = image_mean
        self.image_std = image_std
        self.size_divisible = size_divisible

    def scale_for(self, h: int, w: int) -> float:
        scale = self.min_size / min(h, w)
        if scale * max(h, w) > self.max_size:
            scale = self.max_size / max(h, w)
        return scale

    def resize(self, images: jnp.ndarray, boxes: Optional[jnp.ndarray] = None):
        b, h, w, c = images.shape
        scale = self.scale_for(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        images = jax.image.resize(images, (b, nh, nw, c), "bilinear")
        d = self.size_divisible
        ph = (nh + d - 1) // d * d - nh
        pw = (nw + d - 1) // d * d - nw
        if ph or pw:
            images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if boxes is not None:
            boxes = boxes * jnp.asarray([nw / w, nh / h, nw / w, nh / h], images.dtype)
        return images, boxes, (nh, nw), scale

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.image_mean, images.dtype)
        std = jnp.asarray(self.image_std, images.dtype)
        return (images - mean) / std

    def postprocess_boxes(self, boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
        return boxes / scale


# =============================================================================
# FPN
# =============================================================================

class FeaturePyramidNetwork(nn.Module):
    """1x1 inner + top-down add + 3x3 layer convs, LastLevelMaxPool extra.

    ``use_norm`` adds BatchNorm after every conv (bias dropped), matching the
    v2 extractor's ``norm_layer=nn.BatchNorm2d`` (model/faster_rcnn.py:987;
    Conv2dNormActivation with activation_layer=None). ``train=True`` runs the
    BNs in torch train mode (batch stats + running-stat updates — the
    reference's v2 recipes train with plain ``nn.BatchNorm2d``); the caller
    must then make ``batch_stats`` mutable.
    """

    out_channels: int = 256
    num_levels: int = 2
    extra_maxpool: bool = True
    use_norm: bool = False
    dtype: Optional[Dtype] = None

    def _bn(self, name, train):
        from edtr_tpu.models.layers import TorchBatchNorm

        return TorchBatchNorm(use_running_average=not train, momentum=0.1,
                              epsilon=1e-5, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> List[jnp.ndarray]:
        inner = []
        for i, f in enumerate(feats):
            t = nn.Conv(self.out_channels, (1, 1), use_bias=not self.use_norm,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"inner_{i}")(f)
            if self.use_norm:
                t = self._bn(f"inner_bn_{i}", train)(t)
            inner.append(t)
        # top-down pathway
        results = [None] * len(inner)
        last = inner[-1]
        results[-1] = last
        for i in range(len(inner) - 2, -1, -1):
            th, tw = inner[i].shape[1], inner[i].shape[2]
            up = jax.image.resize(last, (last.shape[0], th, tw, last.shape[-1]), "nearest")
            last = inner[i] + up
            results[i] = last
        outs = []
        for i, r in enumerate(results):
            t = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=not self.use_norm, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"layer_{i}")(r)
            if self.use_norm:
                t = self._bn(f"layer_bn_{i}", train)(t)
            outs.append(t)
        if self.extra_maxpool:
            # torchvision LastLevelMaxPool is F.max_pool2d(kernel=1, stride=2):
            # a plain stride-2 subsample, NOT a real 2x2 pool.
            outs.append(outs[-1][:, ::2, ::2, :])
        return outs


# =============================================================================
# Anchors
# =============================================================================

def generate_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[Tuple[int, int]],
    sizes: Sequence[Sequence[int]],
    aspect_ratios: Sequence[Sequence[float]],
) -> List[np.ndarray]:
    """Per-level anchor grids (host numpy, static shapes).

    Parity: ``AnchorGenerator`` (:466) — zero-centered cell anchors shifted
    over the feature grid. Cell order is aspect-ratio-major (ratio outer,
    scale inner) and base anchors are integer-rounded (half-to-even), exactly
    matching ``generate_anchors`` (:514-530: ``ws = (w_ratios[:, None] *
    scales[None, :]).view(-1)``; ``base_anchors.round()``) so converted RPN
    cls/bbox channels pair with the right anchors.
    """
    out = []
    for (fh, fw), (stride_y, stride_x), szs, ars in zip(
            feat_shapes, strides, sizes, aspect_ratios):
        cell = []
        for ar in ars:
            hr = math.sqrt(ar)
            wr = 1.0 / hr
            for s in szs:
                cell.append([-wr * s / 2, -hr * s / 2, wr * s / 2, hr * s / 2])
        cell = np.round(np.asarray(cell, np.float32))  # (A, 4), torch .round()
        ys = (np.arange(fh, dtype=np.float32)) * stride_y
        xs = (np.arange(fw, dtype=np.float32)) * stride_x
        shift_x, shift_y = np.meshgrid(xs, ys)
        shifts = np.stack(
            [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
        )  # (HW, 4)
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(anchors)
    return out


# =============================================================================
# Heads
# =============================================================================

class RPNHead(nn.Module):
    num_anchors: int
    conv_depth: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        logits, deltas = [], []
        convs = [
            nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv_{d}")
            for d in range(self.conv_depth)
        ]
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="bbox_pred")
        for f in feats:
            t = f
            for conv in convs:
                t = jax.nn.relu(conv(t))
            logits.append(cls(t).astype(jnp.float32))
            deltas.append(reg(t).astype(jnp.float32))
        return logits, deltas


class TwoMLPHead(nn.Module):
    representation_size: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="fc6")(x))
        x = jax.nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="fc7")(x))
        return x


class FastRCNNConvFCHead(nn.Module):
    """v2 box head: 4x [conv3x3 (no bias) + BatchNorm + relu] then fc.

    Parity: ``FastRCNNConvFCHead`` (model/faster_rcnn.py:401-431) as built by
    ``fasterrcnn_resnet50_fpn_v2`` (:990-992) with norm_layer=nn.BatchNorm2d
    (Conv2dNormActivation => conv bias=False, BN, ReLU). ``train=True`` runs
    torch train-mode BN (batch stats + running updates)."""

    representation_size: int = 1024
    conv_channels: int = 256
    num_convs: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from edtr_tpu.models.layers import TorchBatchNorm

        for i in range(self.num_convs):
            x = nn.Conv(self.conv_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv_{i}")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.1,
                               epsilon=1e-5, dtype=self.dtype,
                               name=f"bn_{i}")(x)
            x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="fc")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


# =============================================================================
# Matching / sampling (training)
# =============================================================================

BELOW_LOW = -1
BETWEEN = -2


def match_boxes(
    iou: jnp.ndarray,
    high: float,
    low: float,
    allow_low_quality: bool,
    gt_valid: jnp.ndarray,
) -> jnp.ndarray:
    """torchvision ``Matcher`` (model/util.py:746): per-anchor best gt index,
    -1 below low, -2 between. ``iou``: (G, N) gt x anchors."""
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)  # (N,)
    best_val = jnp.max(iou, axis=0)
    matches = jnp.where(best_val < low, BELOW_LOW, best_gt)
    matches = jnp.where((best_val >= low) & (best_val < high), BETWEEN, matches)
    if allow_low_quality:
        # set_low_quality_matches_ (model/util.py:832-860): anchors that are
        # (tied-)best for ANY gt get their ORIGINAL pre-threshold argmax match
        # restored (matches[pred] = all_matches[pred]), not the gt they were
        # best for.
        gt_best = jnp.max(iou, axis=1, keepdims=True)  # (G,1)
        is_best = (iou == gt_best) & gt_valid[:, None]
        any_best = jnp.any(is_best, axis=0)
        matches = jnp.where(any_best, best_gt, matches)
    return matches


def balanced_sample(
    rng: jax.Array,
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BalancedPositiveNegativeSampler (model/util.py:860), static-size.

    Returns boolean masks for sampled positives/negatives (random permutation
    selection, same distribution as torch's randperm subsetting).
    """
    n = pos_mask.shape[0]
    max_pos = int(batch_size * positive_fraction)
    r1, r2 = jax.random.split(rng)

    def pick(rng_, mask, k):
        scores = jax.random.uniform(rng_, (n,)) + (~mask) * 10.0
        order = jnp.argsort(scores)  # valid candidates first, random order
        ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        n_avail = jnp.sum(mask)
        return mask & (ranks < jnp.minimum(k, n_avail))

    sampled_pos = pick(r1, pos_mask, max_pos)
    n_pos = jnp.sum(sampled_pos)
    sampled_neg = pick(r2, neg_mask, batch_size - n_pos)
    return sampled_pos, sampled_neg


def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax ** 2 / beta, ax - 0.5 * beta)


# =============================================================================
# FasterRCNN
# =============================================================================

class FasterRCNN(nn.Module):
    """Assembled detector. Backbone selected by ``backbone_type``.

    Inference: ``__call__(images)`` -> (detections, {}, feats)
    Training:  ``__call__(images, targets=..., rngs={'sampler': key})``
               -> (detections, losses, feats)
    """

    num_classes: int = 91
    backbone_type: str = "mobilenet_v3_large_fpn"  # or resnet50_fpn_v2
    min_size: int = 800
    max_size: int = 1333
    # RPN
    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 2000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou_thresh: float = 0.7
    rpn_bg_iou_thresh: float = 0.3
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_score_thresh: float = 0.0
    # Box head
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100
    box_fg_iou_thresh: float = 0.5
    box_bg_iou_thresh: float = 0.5
    box_batch_size_per_image: int = 512
    box_positive_fraction: float = 0.25
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # Pre-NMS candidate cap in postprocess_detections. torchvision runs NMS
    # over ALL (P * (C-1)) score-thresholded candidates; 0 keeps that exact
    # behavior (chunked NMS keeps memory bounded). Set >0 to trade a little
    # tail accuracy for less NMS work.
    box_pre_nms_top_n: int = 0
    # FrozenBatchNorm2d semantics: when True every BN uses running stats and
    # never updates them, regardless of the call-time ``train`` flag. The
    # mobilenet factory sets this True iff pretrained weights are named
    # (torchvision: norm_layer = FrozenBatchNorm2d if is_trained else
    # nn.BatchNorm2d, model/faster_rcnn.py:709). The v2 builder NEVER freezes
    # norms (resnet50 default norm + norm_layer=nn.BatchNorm2d heads, :929,
    # :987-992), so its factory sets this False.
    norm_frozen: bool = False
    dtype: Optional[Dtype] = None

    @property
    def transform(self) -> RCNNTransform:
        return RCNNTransform(self.min_size, self.max_size)

    def _backbone_cfg(self):
        if self.backbone_type == "mobilenet_v3_large_fpn":
            return dict(anchor_sizes=((32, 64, 128, 256, 512),) * 3,
                        aspect_ratios=((0.5, 1.0, 2.0),) * 3,
                        rpn_conv_depth=1, box_head="mlp")
        else:  # resnet50_fpn_v2: 5 levels
            return dict(anchor_sizes=((32,), (64,), (128,), (256,), (512,)),
                        aspect_ratios=((0.5, 1.0, 2.0),) * 5,
                        rpn_conv_depth=2, box_head="convfc")

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        manual_proposals: Optional[jnp.ndarray] = None,
        return_feat: bool = False,
        train: bool = False,
    ):
        """``train=True`` == torch ``model.train()`` for the norm layers: BNs
        use batch stats and update running stats (caller passes
        ``mutable=["batch_stats"]``), except under ``norm_frozen``. Loss
        computation is keyed on ``targets is not None`` exactly like the
        reference (``training_mode``, model/faster_rcnn.py:69-71), so losses
        and train-mode norms are independently controllable."""
        cfg = self._backbone_cfg()
        train_bn = train and not self.norm_frozen
        training_mode = targets is not None
        b, orig_h, orig_w, _ = images.shape

        tfm = self.transform
        boxes_in = targets["boxes"] if training_mode else None
        images_n = tfm.normalize(images)
        images_r, boxes_r, (img_h, img_w), scale = tfm.resize(images_n, boxes_in)
        images_r = images_r.astype(self.dtype or images_r.dtype)

        # --- backbone + FPN ---------------------------------------------------
        if self.backbone_type == "mobilenet_v3_large_fpn":
            body = MobileNetV3(dtype=self.dtype, name="body")
            feats_all = body(images_r, train=train_bn, features=True)
            si = body.stage_indices()
            c_feats = [feats_all[si[-2]], feats_all[si[-1]]]  # C4, C5
            fpn = FeaturePyramidNetwork(
                out_channels=256, num_levels=2, extra_maxpool=True,
                dtype=self.dtype, name="fpn",
            )
            fpn_feats = fpn(c_feats, train=train_bn)  # ['0', '1', 'pool']
            pool_levels = [0, 1]  # MultiScaleRoIAlign featmap_names ['0','1']
        else:
            backbone = ResNet(type=50, dtype=self.dtype, name="body")
            # capture C2..C5 via the 4 stage outputs
            feats_all = _resnet_stages(backbone, images_r, train_bn)
            fpn = FeaturePyramidNetwork(
                out_channels=256, num_levels=4, extra_maxpool=True,
                use_norm=True, dtype=self.dtype, name="fpn",
            )
            fpn_feats = fpn(feats_all, train=train_bn)  # ['0','1','2','3','pool']
            pool_levels = [0, 1, 2, 3]

        # FPN features stay in compute dtype (bf16 on TPU): RoIAlign gathers
        # are the HBM hot spot; the RPN/box heads upcast their outputs.
        num_anchors = len(cfg["anchor_sizes"][0]) * len(cfg["aspect_ratios"][0])

        # --- RPN ---------------------------------------------------------------
        rpn_head = RPNHead(num_anchors=num_anchors, conv_depth=cfg["rpn_conv_depth"],
                           dtype=self.dtype, name="rpn_head")
        objectness, pred_deltas = rpn_head(fpn_feats)

        # anchor strides: padded image size // grid size, per axis — exactly
        # AnchorGenerator.forward (:560-575). NOT the nominal backbone
        # strides: the mobilenet FPN taps give BOTH maps at stride 32.
        pad_h, pad_w = images_r.shape[1], images_r.shape[2]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in fpn_feats]
        strides = [(pad_h // fh, pad_w // fw) for fh, fw in feat_shapes]
        anchors_np = generate_anchors(
            feat_shapes, strides, cfg["anchor_sizes"], cfg["aspect_ratios"]
        )
        anchors = [jnp.asarray(a) for a in anchors_np]

        pre_nms = self.rpn_pre_nms_top_n_train if training_mode else self.rpn_pre_nms_top_n_test
        post_nms = self.rpn_post_nms_top_n_train if training_mode else self.rpn_post_nms_top_n_test

        def per_image_proposals(obj_list, delta_list):
            lvl_boxes, lvl_scores, lvl_valid = [], [], []
            max_k = min(pre_nms, max(a.shape[0] for a in anchors))
            for li, (obj, dlt, anc) in enumerate(zip(obj_list, delta_list, anchors)):
                n_l = anc.shape[0]
                # NHWC flatten: index (h*W + w)*A + a — matches the anchor
                # grid layout (shifts outer, cell anchors inner)
                obj_f = obj.reshape(-1)
                dlt_f = dlt.reshape(-1, 4)
                k = min(pre_nms, n_l)
                idx, _ = box_ops.top_k_by_score(obj_f, k)
                top_scores = obj_f[idx]
                top_boxes = box_ops.decode_boxes(dlt_f[idx], anc[idx]).reshape(-1, 4)
                top_boxes = box_ops.clip_boxes_to_image(top_boxes, img_h, img_w)
                valid = box_ops.small_box_mask(top_boxes, 1e-3)
                valid &= jax.nn.sigmoid(top_scores) >= self.rpn_score_thresh
                # pad levels to a common size so per-level NMS runs under
                # vmap (batched-by-level NMS == independent per-level NMS)
                pad = max_k - k
                if pad:
                    top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
                    top_scores = jnp.pad(top_scores, (0, pad),
                                         constant_values=-jnp.inf)
                    valid = jnp.pad(valid, (0, pad))
                lvl_boxes.append(top_boxes)
                lvl_scores.append(top_scores)
                lvl_valid.append(valid)
            lb = jnp.stack(lvl_boxes)      # (L, max_k, 4)
            ls = jnp.stack(lvl_scores)     # (L, max_k)
            lv = jnp.stack(lvl_valid)
            keep = jax.vmap(
                lambda b, s, v: box_ops.nms_mask(b, s, self.rpn_nms_thresh, v)
            )(lb, ls, lv)
            all_boxes = lb.reshape(-1, 4)
            all_scores = ls.reshape(-1)
            idx, kvalid = box_ops.top_k_by_score(
                all_scores, min(post_nms, all_boxes.shape[0]), keep.reshape(-1)
            )
            return all_boxes[idx], all_scores[idx], kvalid

        proposals, prop_scores, prop_valid = _map_images(
            per_image_proposals, (objectness, pred_deltas)
        )
        # RPN proposals are detached in torch (RegionProposalNetwork.forward):
        # no box-head gradient flows back into the RPN through them.
        proposals = jax.lax.stop_gradient(proposals)
        prop_scores = jax.lax.stop_gradient(prop_scores)

        losses: Dict[str, jnp.ndarray] = {}
        if training_mode:
            rng = self.make_rng("sampler")
            anchors_cat = jnp.concatenate(anchors, axis=0)
            obj_cat = jnp.concatenate([o.reshape(b, -1) for o in objectness], axis=1)
            dlt_cat = jnp.concatenate([d.reshape(b, -1, 4) for d in pred_deltas], axis=1)
            rpn_rngs = jax.random.split(rng, b + 1)
            rng = rpn_rngs[0]

            def rpn_loss_one(obj, dlt, gtb, gtv, key):
                iou = box_ops.box_iou(gtb, anchors_cat)  # (G, N)
                matches = match_boxes(
                    iou, self.rpn_fg_iou_thresh, self.rpn_bg_iou_thresh, True, gtv
                )
                pos = matches >= 0
                neg = matches == BELOW_LOW
                labels = pos.astype(jnp.float32)
                matched_gt = gtb[jnp.clip(matches, 0)]
                reg_targets = box_ops.encode_boxes(matched_gt, anchors_cat)
                sp, sn = balanced_sample(
                    key, pos, neg, self.rpn_batch_size_per_image,
                    self.rpn_positive_fraction,
                )
                sampled = sp | sn
                n_sampled = jnp.maximum(jnp.sum(sampled), 1)
                box_l = jnp.sum(
                    smooth_l1(dlt - reg_targets).sum(-1) * sp
                ) / n_sampled
                bce = optax_bce(obj, labels)
                obj_l = jnp.sum(bce * sampled) / n_sampled
                return obj_l, box_l

            obj_l, box_l = jax.vmap(rpn_loss_one)(
                obj_cat, dlt_cat, boxes_r, targets["valid"], rpn_rngs[1:]
            )
            losses["loss_objectness"] = obj_l.mean()
            losses["loss_rpn_box_reg"] = box_l.mean()

        if manual_proposals is not None:
            proposals, prop_valid = manual_proposals

        # --- RoI heads ---------------------------------------------------------
        box_labels = None
        if training_mode:
            # select_training_samples: append gt boxes to proposals
            gtb, gtl, gtv = boxes_r, targets["labels"], targets["valid"]
            proposals = jnp.concatenate([proposals, gtb], axis=1)
            prop_valid = jnp.concatenate([prop_valid, gtv], axis=1)
            n_props = self.box_batch_size_per_image

            roi_rngs = jax.random.split(rng, b)

            def select_one(props, pvalid, gb, gl, gv, key):
                iou = box_ops.box_iou(gb, props)  # (G, P)
                iou = jnp.where(pvalid[None, :], iou, -1.0)
                matches = match_boxes(
                    iou, self.box_fg_iou_thresh, self.box_bg_iou_thresh, False, gv
                )
                pos = (matches >= 0) & pvalid
                neg = (matches == BELOW_LOW) & pvalid
                sp, sn = balanced_sample(
                    key, pos, neg, self.box_batch_size_per_image,
                    self.box_positive_fraction,
                )
                sampled = sp | sn
                # gather sampled indices into a fixed-size set (pad by repeat)
                order = jnp.argsort(~sampled)  # sampled first
                idx = order[:n_props]
                sel_valid = sampled[idx]
                sel_props = props[idx]
                sel_matches = matches[idx]
                labels = jnp.where(
                    sel_matches >= 0, gl[jnp.clip(sel_matches, 0)], 0
                )
                labels = jnp.where(sel_valid, labels, -1)  # -1: ignore (pad)
                reg_t = box_ops.encode_boxes(
                    gb[jnp.clip(sel_matches, 0)], sel_props, self.bbox_reg_weights
                )
                return sel_props, sel_valid, labels, reg_t

            proposals, prop_valid, box_labels, reg_targets = jax.vmap(select_one)(
                proposals, prop_valid, gtb, gtl, gtv, roi_rngs
            )

        # RoIAlign scales are INFERRED from feature/pre-pad image sizes as
        # 2^round(log2(feat/orig)) — MultiScaleRoIAlign._setup_scales. For the
        # mobilenet FPN both maps infer 1/32 so the level mapper degenerates
        # to level 0, matching torchvision.
        spatial_scales = [
            2.0 ** round(math.log2(fpn_feats[i].shape[1] / img_h))
            for i in pool_levels
        ]
        pool_feats = [fpn_feats[i] for i in pool_levels]

        def pool_one(feats_i, props_i):
            return multiscale_roi_align(feats_i, props_i, spatial_scales, 7, 2)

        pooled = jax.vmap(pool_one)(tuple(pool_feats), proposals)  # (B, P, 7, 7, C)
        bp = pooled.shape[0] * pooled.shape[1]
        pooled_flat = pooled.reshape(bp, 7, 7, pooled.shape[-1])

        pooled_in = pooled_flat.astype(self.dtype or pooled_flat.dtype)
        if cfg["box_head"] == "mlp":
            rep = TwoMLPHead(dtype=self.dtype, name="box_head")(pooled_in)
        else:
            rep = FastRCNNConvFCHead(dtype=self.dtype, name="box_head")(
                pooled_in, train=train_bn
            )
        class_logits, box_deltas = FastRCNNPredictor(
            num_classes=self.num_classes, dtype=self.dtype, name="box_predictor"
        )(rep)
        n_p = proposals.shape[1]
        class_logits = class_logits.reshape(b, n_p, -1)
        box_deltas = box_deltas.reshape(b, n_p, -1)

        feats_out = {
            "features": {str(i): f for i, f in enumerate(fpn_feats[:-1])},
            "objectness": objectness,
            "pred_bbox_deltas": pred_deltas,
            "proposals": proposals,
        }
        feats_out["features"]["pool"] = fpn_feats[-1]

        if training_mode:
            def head_loss_one(logits, deltas, labels, reg_t, valid):
                n, nc = logits.shape
                lbl = jnp.clip(labels, 0)
                ce = -jax.nn.log_softmax(logits)[jnp.arange(n), lbl]
                n_valid = jnp.maximum(jnp.sum(valid), 1)
                cls_l = jnp.sum(ce * valid) / n_valid
                d = deltas.reshape(n, nc, 4)[jnp.arange(n), lbl]
                pos = (labels > 0) & valid
                box_l = jnp.sum(smooth_l1(d - reg_t).sum(-1) * pos) / n_valid
                return cls_l, box_l

            cls_l, box_l = jax.vmap(head_loss_one)(
                class_logits, box_deltas, box_labels,
                reg_targets, prop_valid,
            )
            losses["loss_classifier"] = cls_l.mean()
            losses["loss_box_reg"] = box_l.mean()

        # --- inference postprocess ---------------------------------------------
        detections = self._postprocess(
            class_logits, box_deltas, proposals, prop_valid,
            (img_h, img_w), (orig_h, orig_w),
        )
        return detections, losses, feats_out

    def _postprocess(self, class_logits, box_deltas, proposals, prop_valid,
                     img_hw, orig_hw):
        """Per-image: decode, clip, per-class threshold+NMS, top detections.

        Parity: ``RoIHeads.postprocess_detections`` (:2018-2130) +
        ``GeneralizedRCNNTransform.postprocess`` / ``resize_boxes`` (per-axis
        ratios back to original coords).
        """
        img_h, img_w = img_hw
        orig_h, orig_w = orig_hw
        nc = self.num_classes
        d_per_img = self.box_detections_per_img
        unscale = jnp.asarray(
            [orig_w / img_w, orig_h / img_h, orig_w / img_w, orig_h / img_h],
            jnp.float32,
        )

        def one(logits, deltas, props, pvalid):
            scores = jax.nn.softmax(logits, axis=-1)  # (P, C)
            boxes = box_ops.decode_boxes(deltas, props, self.bbox_reg_weights)
            boxes = box_ops.clip_boxes_to_image(boxes, img_h, img_w)  # (P, C, 4)
            # batched_nms-by-label == independent per-class NMS, so run the
            # classes UNDER vmap: sequential greedy depth drops from
            # (C-1)*P to P while staying exactly torch's semantics (the
            # coordinate-offset trick separates classes anyway)
            cb = boxes[:, 1:, :].transpose(1, 0, 2)           # (C-1, P, 4)
            cs = scores[:, 1:].T                               # (C-1, P)
            valid = pvalid[None, :] & (cs > self.box_score_thresh)
            valid &= box_ops.small_box_mask(cb, 1e-2)
            if self.box_pre_nms_top_n and self.box_pre_nms_top_n < cs.shape[1]:
                # optional per-class candidate cap (0 = torch-exact, default)
                def cap(b, s, v):
                    idx, iv = box_ops.top_k_by_score(s, self.box_pre_nms_top_n, v)
                    return b[idx], s[idx], iv

                cb, cs, valid = jax.vmap(cap)(cb, cs, valid)
            keep = jax.vmap(
                lambda b, s, v: box_ops.nms_mask(b, s, self.box_nms_thresh, v)
            )(cb, cs, valid)
            flat_scores = cs.reshape(-1)
            flat_boxes = cb.reshape(-1, 4)
            flat_labels = jnp.repeat(
                jnp.arange(1, nc, dtype=jnp.int32), cs.shape[1])
            idx2, fvalid = box_ops.top_k_by_score(
                flat_scores, d_per_img, keep.reshape(-1))
            out_boxes = flat_boxes[idx2] * unscale  # original image coords
            return dict(
                boxes=out_boxes,
                scores=jnp.where(fvalid, flat_scores[idx2], 0.0),
                labels=jnp.where(fvalid, flat_labels[idx2], 0),
                valid=fvalid,
            )

        return _map_images(
            one, (class_logits, box_deltas, proposals, prop_valid))


def optax_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy_with_logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _resnet_stages(backbone: ResNet, x: jnp.ndarray, train: bool):
    """C2..C5 stage outputs for the resnet50 FPN (strides 4/8/16/32)."""
    return backbone(x, normalize=False, features=True, train=train)


_FRCNN_FIELDS = {f.name for f in FasterRCNN.__dataclass_fields__.values()} \
    if hasattr(FasterRCNN, "__dataclass_fields__") else set()


def _frcnn_kwargs(kwargs):
    return {k: v for k, v in kwargs.items() if k in _FRCNN_FIELDS}


def fasterrcnn_mobilenet_v3_large_fpn(
    weights=None, weights_backbone=None, num_classes: int = 91,
    dtype=None, **kwargs,
) -> FasterRCNN:
    """Factory; parity ``model/faster_rcnn.py:733-795`` (rpn_score_thresh=0.05).

    Extra FasterRCNN field overrides (min_size, rpn_* and box_* knobs) pass
    through, matching torchvision's ``**kwargs`` forwarding to the base class.
    ``norm_frozen`` follows torchvision's ``is_trained`` rule (:708-710):
    FrozenBatchNorm2d iff weights or weights_backbone are named (all shipped
    EDTR configs name ``weights_backbone``), plain train-able BN otherwise.
    """
    is_trained = weights is not None or weights_backbone is not None
    return FasterRCNN(
        num_classes=num_classes,
        backbone_type="mobilenet_v3_large_fpn",
        rpn_score_thresh=kwargs.pop("rpn_score_thresh", 0.05),
        norm_frozen=kwargs.pop("norm_frozen", is_trained),
        dtype=dtype,
        **_frcnn_kwargs(kwargs),
    )


def fasterrcnn_resnet50_fpn_v2(
    weights=None, weights_backbone=None, num_classes: int = 91,
    dtype=None, **kwargs,
) -> FasterRCNN:
    """Factory; parity ``model/faster_rcnn.py:939``.

    The v2 builder never freezes norms — the backbone keeps resnet50's
    default ``nn.BatchNorm2d`` (:987) and FPN/box head are built with
    ``norm_layer=nn.BatchNorm2d`` (:988-992) — so train-mode calls update
    batch statistics exactly like the reference's COCO real-world recipe.
    """
    return FasterRCNN(
        num_classes=num_classes,
        backbone_type="resnet50_fpn_v2",
        norm_frozen=kwargs.pop("norm_frozen", False),
        dtype=dtype,
        **_frcnn_kwargs(kwargs),
    )


def detnet_trainable_mask(
    det_params,
    backbone_type: str = "mobilenet_v3_large_fpn",
    trainable_layers: int = 3,
):
    """Bool pytree over the detnet "params" collection: True = trainable.

    Mirrors the torchvision pretrained-backbone freezing the reference
    inherits (``model/faster_rcnn.py:658-668`` for mobilenet:
    ``freeze_before = stage_indices[num_stages - trainable_layers]``;
    ``:806-816`` for resnet: train only
    ``["layer4","layer3","layer2","layer1","conv1"][:trainable_layers]``).
    In torch, frozen params simply never receive grads, so SGD (incl. its
    weight decay) leaves them untouched — pair this mask with
    ``optax.multi_transform({True: tx, False: optax.set_to_zero()})``.
    BatchNorm running stats need no mask: torchvision freezing only calls
    ``requires_grad_(False)`` — in the v2 recipe (plain ``nn.BatchNorm2d``)
    train mode still updates running stats in the frozen stages, which is
    exactly what the mutable ``batch_stats`` pass reproduces; the mobilenet
    recipe uses FrozenBatchNorm (``norm_frozen=True``) so nothing updates.
    """
    from .mobilenetv3 import MobileNetV3

    if backbone_type == "mobilenet_v3_large_fpn":
        si = MobileNetV3().stage_indices()
        num_stages = len(si)
        n_feats = si[-1] + 1  # modules features_0 .. features_{n_feats-1}
        freeze_before = (
            n_feats if trainable_layers == 0 else si[num_stages - trainable_layers]
        )

        def module_trainable(name: str) -> bool:
            if not name.startswith("features_"):
                return True
            return int(name.rsplit("_", 1)[1]) >= freeze_before

    else:  # resnet50_fpn_v2
        to_train = ["layer4", "layer3", "layer2", "layer1", "conv1"][:trainable_layers]

        def module_trainable(name: str) -> bool:
            return any(name.startswith(p) for p in to_train)

    def mark(subtree, trainable: bool):
        return jax.tree.map(lambda _: trainable, subtree)

    out = {}
    for top, sub in det_params.items():
        if top != "body":
            out[top] = mark(sub, True)
        else:
            out[top] = {
                name: mark(m, module_trainable(name)) for name, m in sub.items()
            }
    return out


def mask_detnet_tx(tx, det_params, trainable_layers: int = 3):
    """Wrap an optimizer so frozen backbone stages get zero updates.

    No-op (returns ``tx`` unchanged) when ``det_params`` is not a FasterRCNN
    "params" tree — cls/seg task nets have no torchvision freezing
    (reference trains their full parameter list).
    """
    import optax

    if not (isinstance(det_params, dict) and "body" in det_params
            and "rpn_head" in det_params):
        return tx
    bt = ("mobilenet_v3_large_fpn" if "features_0" in det_params["body"]
          else "resnet50_fpn_v2")
    mask = detnet_trainable_mask(det_params, bt, trainable_layers)
    return optax.multi_transform({True: tx, False: optax.set_to_zero()}, mask)
