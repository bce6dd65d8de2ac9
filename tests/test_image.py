"""Image preprocessing tests (ref: data/helpers.py:18-30 get_transforms)."""

import numpy as np
import pytest

from bpx.models.image import IMAGENET_MEAN, IMAGENET_STD, preprocess_image


def test_preprocess_shapes_and_normalisation():
    rng = np.random.RandomState(0)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    out = preprocess_image(img)
    assert out.shape == (3, 224, 224)
    assert out.dtype == np.float32
    # constant-colour image maps exactly to (c/255 - mean)/std
    const = np.full((300, 400, 3), 128, np.uint8)
    out2 = preprocess_image(const)
    expect = (128 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out2.reshape(3, -1).mean(1), expect, atol=1e-5)


def test_preprocess_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    import torch
    from PIL import Image
    tfm = torchvision.transforms.Compose([
        torchvision.transforms.Resize(256),
        torchvision.transforms.CenterCrop(224),
        torchvision.transforms.ToTensor(),
        torchvision.transforms.Normalize(mean=IMAGENET_MEAN,
                                         std=IMAGENET_STD),
    ])
    rng = np.random.RandomState(1)
    img = (rng.rand(300, 500, 3) * 255).astype(np.uint8)
    oracle = tfm(Image.fromarray(img)).numpy()
    ours = preprocess_image(img)
    # PIL bilinear differs slightly from pure-numpy bilinear at edges
    assert np.mean(np.abs(ours - oracle)) < 0.12
