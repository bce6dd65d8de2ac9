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


@pytest.mark.slow
def test_fasterrcnn_extractor_shapes():
    """Random-weight torchvision detector (zero-egress): shape/alignment."""
    pytest.importorskip("torchvision")
    from bpx.models.image import FasterRCNNExtractor
    ex = FasterRCNNExtractor(num_embeds=4, min_size=128, max_size=128,
                             weights=None)
    imgs = [np.random.RandomState(0).rand(3, 96, 96).astype(np.float32)
            for _ in range(2)]
    feats, boxes = ex(imgs)
    assert feats.shape == (2, 4, 1024)
    assert boxes.shape == (2, 4, 5)
    # 5th column is the box area
    areas = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    np.testing.assert_allclose(boxes[..., 4], areas, rtol=1e-5)


def test_fasterrcnn_selection_logic_with_stub_detector():
    """Top-N-in-proposal-order, zero-padding, and area column — exercised
    with a stub detector so it runs without torchvision (the detector
    itself is torchvision's; only the selection is ours, ref image.py:85-99).
    """
    import torch
    from bpx.models.image import FasterRCNNExtractor

    class _ImageList:
        def __init__(self, tensors, sizes):
            self.tensors, self.image_sizes = tensors, sizes

    class _Stub:
        # 1st image: 3 proposals (pads to 4); 2nd: 6 proposals (truncates)
        _lens = (3, 6)

        def transform(self, imgs, _):
            t = torch.stack([torch.as_tensor(i) for i in imgs])
            return _ImageList(t, [i.shape[1:] for i in imgs]), None

        def backbone(self, x):
            return {"0": x}

        def rpn(self, images, features, _):
            props = [torch.arange(n * 4, dtype=torch.float32).reshape(n, 4)
                     for n in self._lens]
            # make x2>x1, y2>y1 so areas are positive
            props = [torch.cat([p[:, :2], p[:, :2] + 1 + p[:, 2:]], dim=1)
                     for p in props]
            return props, None

        class roi_heads:  # noqa: N801 — mimics torchvision attribute
            @staticmethod
            def box_roi_pool(features, proposals, sizes):
                return torch.cat([p for p in proposals])

            @staticmethod
            def box_head(pooled):
                n = pooled.shape[0]
                return (torch.arange(n, dtype=torch.float32)[:, None]
                        .expand(n, 8).contiguous())

    ex = FasterRCNNExtractor.__new__(FasterRCNNExtractor)
    ex._torch = torch
    ex.num_embeds = 4
    ex._model = _Stub()

    imgs = [np.zeros((3, 8, 8), np.float32)] * 2
    feats, boxes = ex(imgs)
    assert feats.shape == (2, 4, 8) and boxes.shape == (2, 4, 5)
    # image 0 had 3 proposals: row 3 zero-padded; features align by index
    np.testing.assert_array_equal(feats[0, :, 0], [0, 1, 2, 0])
    np.testing.assert_array_equal(feats[0, 3], np.zeros(8))
    # image 1 takes the FIRST 4 of its 6 proposals (global rows 3..6)
    np.testing.assert_array_equal(feats[1, :, 0], [3, 4, 5, 6])
    areas = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    np.testing.assert_allclose(boxes[..., 4], areas, rtol=1e-6)


def test_image_clf_head():
    import jax
    import jax.numpy as jnp
    from bpx.models.image import make_image_clf
    clf = make_image_clf(n_classes=7)
    feats = jnp.ones((3, 4, 16))
    params = clf.init(jax.random.PRNGKey(0), feats)["params"]
    out = clf.apply({"params": params}, feats)
    assert out.shape == (3, 7)
    assert params["clf"]["kernel"].shape == (64, 7)
