"""Offline image feature extractors.

The reference bundles torchvision/detectron2 encoders (ResNet152, VGG16,
FasterRCNN RoI features; ref: image.py:23-139) that are **never called by the
registered models** — every visual feature arrives precomputed from disk
(SURVEY.md §2 C7, C15).  These utilities reproduce that offline extraction
capability: they run on the host (torch CPU / torchvision when available) and
write the pickled feature files the data pipeline reads.

They are import-gated: environments without torchvision can still train on
precomputed features, matching the reference's effective usage.
"""

from __future__ import annotations

import pickle
from typing import Iterable, Optional

import numpy as np


def _require_torchvision():
    try:
        import torch
        import torchvision
        return torch, torchvision
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torchvision is required for offline image feature extraction; "
            "training itself only needs precomputed features") from e


class ResNet152Extractor:
    """Pool5 features from ResNet152, adaptive-pooled to N embedding slots.

    (ref: image.py:23-53 ``ImageEncoder``) ``num_embeds`` in 1..9 selects the
    (1..3)x(1..3) adaptive pooling grid; output is (N, 2048) per image.
    """

    POOLS = {1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 2), 5: (5, 1),
             6: (3, 2), 7: (7, 1), 8: (4, 2), 9: (3, 3)}

    def __init__(self, num_embeds: int = 1):
        torch, torchvision = _require_torchvision()
        model = torchvision.models.resnet152(weights="DEFAULT")
        modules = list(model.children())[:-2]
        self._torch = torch
        self._backbone = torch.nn.Sequential(*modules).eval()
        self._pool = torch.nn.AdaptiveAvgPool2d(self.POOLS[num_embeds])

    def __call__(self, images: "np.ndarray") -> np.ndarray:
        """(B, 3, H, W) float images -> (B, N, 2048) features."""
        torch = self._torch
        with torch.no_grad():
            x = self._backbone(torch.as_tensor(images, dtype=torch.float32))
            x = self._pool(x)
            x = torch.flatten(x, start_dim=2).transpose(1, 2)
        return x.numpy()


class VGG16Extractor:
    """fc1 (4096-d) features from VGG16 (ref: image.py:113-125)."""

    def __init__(self):
        torch, torchvision = _require_torchvision()
        model = torchvision.models.vgg16(weights="DEFAULT")
        # Keep everything up to the first classifier Linear (fc1).
        model.classifier = torch.nn.Sequential(
            *list(model.classifier.children())[:1])
        self._torch = torch
        self._model = model.eval()

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            return self._model(
                torch.as_tensor(images, dtype=torch.float32)).numpy()


class FasterRCNNExtractor:
    """RoI box features + boxes from a Faster R-CNN FPN detector.

    (ref: image.py:56-110 ``ImageEncoderFasterRCNN``) The reference pools
    detectron2 ``StandardROIHeads`` box features for the RPN proposals and
    keeps the first ``num_image_embeds`` proposals per image (RPN proposals
    arrive objectness-sorted; ref: image.py:85-93), returning the fc box
    features plus the (x1, y1, x2, y2, area) box tensor.

    Divergences (documented): torchvision's ``fasterrcnn_resnet50_fpn``
    replaces detectron2 (same R50-FPN architecture, COCO-trained); its
    ``box_head`` representation is 1024-d (the reference overrides
    detectron2's FC_DIM to 2048, which its released checkpoint does not
    actually carry).  Images with fewer than ``num_embeds`` proposals are
    zero-padded instead of crashing.
    """

    def __init__(self, num_embeds: int = 100, min_size: int = 800,
                 max_size: int = 1333, weights: Optional[str] = "DEFAULT"):
        torch, torchvision = _require_torchvision()
        from torchvision.models.detection import fasterrcnn_resnet50_fpn
        self._torch = torch
        self.num_embeds = num_embeds
        self._model = fasterrcnn_resnet50_fpn(
            weights=weights, box_score_thresh=0.0,
            min_size=min_size, max_size=max_size).eval()

    def __call__(self, images) -> "tuple[np.ndarray, np.ndarray]":
        """[(3, H, W) float array, ...] -> ((B, N, 1024), (B, N, 5)).

        Feature rows align with the returned boxes; the 5th box column is
        the area (ref: image.py:96-99).
        """
        torch = self._torch
        m = self._model
        with torch.no_grad():
            imgs = [torch.as_tensor(im, dtype=torch.float32) for im in images]
            tformed, _ = m.transform(imgs, None)
            features = m.backbone(tformed.tensors)
            proposals, _ = m.rpn(tformed, features, None)
            pooled = m.roi_heads.box_roi_pool(
                features, proposals, tformed.image_sizes)
            box_feats = m.roi_heads.box_head(pooled)     # (sum N_i, 1024)

            n = self.num_embeds
            feat_dim = box_feats.shape[-1]
            out_f, out_b = [], []
            idx = 0
            for boxes in proposals:
                take = min(n, len(boxes))
                f = box_feats[idx:idx + take]
                b = boxes[:take]
                area = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[:, None]
                b = torch.cat([b, area], dim=1)
                if take < n:
                    f = torch.cat([f, f.new_zeros(n - take, feat_dim)])
                    b = torch.cat([b, b.new_zeros(n - take, 5)])
                out_f.append(f)
                out_b.append(b)
                idx += len(boxes)
            return (torch.stack(out_f).numpy(), torch.stack(out_b).numpy())


def extract_to_pickles(extractor, items: Iterable, out_dir: str):
    """Run ``extractor`` over (id, image_array) pairs, writing ``{id}.p``
    pickles in the layout the data adapters read (ref: dataset.py:94-104).

    Plain extractors pickle the (N, feat) array; box extractors
    (FasterRCNNExtractor) return a (features, boxes) pair and pickle a
    ``{"features": (N, feat), "boxes": (N, 5)}`` dict — both with the
    batch dim stripped."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    for item_id, image in items:
        out = extractor(image[None])
        if isinstance(out, tuple):          # (features, boxes) pair
            feats, boxes = out
            payload = {"features": np.asarray(feats)[0],
                       "boxes": np.asarray(boxes)[0]}
        else:
            payload = np.asarray(out[0])
        with open(os.path.join(out_dir, f"{item_id}.p"), "wb") as f:
            pickle.dump(payload, f)


# ---------------------------------------------------------------------------
# Host-side image preprocessing (ref: data/helpers.py:18-30 ``get_transforms``)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.46777044, 0.44531429, 0.40661017)
IMAGENET_STD = (0.12221994, 0.12145835, 0.14380469)


def preprocess_image(image: np.ndarray,
                     resize: int = 256, crop: int = 224,
                     mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """Resize(256) -> CenterCrop(224) -> scale to [0,1] -> Normalize.

    Numpy port of the reference's torchvision transform chain
    (ref: data/helpers.py:18-30) used ahead of the offline extractors.
    Input: (H, W, 3) uint8 or float; output: (3, crop, crop) float32.
    """
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    # shorter side -> `resize`, bilinear
    scale = resize / min(h, w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    ys = np.clip((np.arange(new_h) + 0.5) / scale - 0.5, 0, h - 1)
    xs = np.clip((np.arange(new_w) + 0.5) / scale - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = ((img[y0][:, x0] * (1 - wy) * (1 - wx))
           + (img[y1][:, x0] * wy * (1 - wx))
           + (img[y0][:, x1] * (1 - wy) * wx)
           + (img[y1][:, x1] * wy * wx))
    # center crop
    top = (new_h - crop) // 2
    left = (new_w - crop) // 2
    img = img[top:top + crop, left:left + crop]
    img = (img - np.asarray(mean)) / np.asarray(std)
    return img.transpose(2, 0, 1).astype(np.float32)


# ---------------------------------------------------------------------------
# Image-only classifier head (ref: image.py:128-139 ``ImageClf``)
# ---------------------------------------------------------------------------

def make_image_clf(n_classes: int):
    """Flax ``ImageClf`` equivalent: flatten (B, N, D) image features and
    apply one linear head (ref: image.py:128-139).

    Divergence (documented): the reference runs its ResNet152 encoder inside
    the torch module; here extraction is the offline host-side
    :class:`ResNet152Extractor` (the TPU-native split — SURVEY.md §2 C7) and
    the head consumes the precomputed features.
    """
    import flax.linen as nn

    class ImageClf(nn.Module):
        n_classes: int

        @nn.compact
        def __call__(self, feats):
            B = feats.shape[0]
            return nn.Dense(self.n_classes, name="clf")(
                feats.reshape(B, -1))

    return ImageClf(n_classes)
