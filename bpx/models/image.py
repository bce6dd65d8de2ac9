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


def extract_to_pickles(extractor, items: Iterable, out_dir: str):
    """Run ``extractor`` over (id, image_array) pairs, writing ``{id}.p``
    pickles in the layout the data adapters read (ref: dataset.py:94-104)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    for item_id, image in items:
        feats = extractor(image[None])[0]
        with open(os.path.join(out_dir, f"{item_id}.p"), "wb") as f:
            pickle.dump(np.asarray(feats), f)
