"""Golden tests for the rectangular offset future-mask
(ref: transformer.py:209-216)."""

import numpy as np
import torch
import pytest

from bpx.ops.masks import offset_future_mask, key_padding_bias


def torch_offset_mask(tq, tk):
    m = torch.triu(torch.full((tq, tk), float("-inf")), 1 + abs(tk - tq))
    return m.numpy()


@pytest.mark.parametrize("tq,tk", [(8, 8), (8, 16), (16, 8), (5, 13), (1, 1),
                                   (512, 200), (200, 512)])
def test_matches_torch_triu(tq, tk):
    ours = np.asarray(offset_future_mask(tq, tk))
    np.testing.assert_array_equal(ours, torch_offset_mask(tq, tk))


def test_square_is_causal():
    m = np.asarray(offset_future_mask(4, 4))
    expect = np.array([[0, -np.inf, -np.inf, -np.inf],
                       [0, 0, -np.inf, -np.inf],
                       [0, 0, 0, -np.inf],
                       [0, 0, 0, 0]], dtype=np.float32)
    np.testing.assert_array_equal(m, expect)


def test_key_padding_bias():
    mask = np.array([[1, 1, 0], [1, 0, 0]], dtype=np.int32)
    bias = np.asarray(key_padding_bias(mask))
    assert bias.shape == (2, 1, 1, 3)
    assert bias[0, 0, 0, 0] == 0.0 and np.isneginf(bias[0, 0, 0, 2])
    assert np.isneginf(bias[1, 0, 0, 1])
