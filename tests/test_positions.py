"""Golden tests for sinusoidal positions and padding-aware ids.

Reference semantics: position_embedding.py:8-80 and the channel-0 quirk at
transformer.py:68.  The torch oracle here is an independent reimplementation
of the documented math (tensor2tensor table + fairseq make_positions
semantics), not a copy of reference code.
"""

import numpy as np
import torch
import pytest

from bpx.ops.positions import (
    padding_aware_positions,
    positional_embedding,
    sinusoidal_table,
)


def torch_sinusoidal_table(num_embeddings, dim, padding_idx=0):
    """tensor2tensor-layout sin/cos table, torch oracle."""
    import math
    half = dim // 2
    emb = math.log(10000) / (half - 1) if half > 1 else 0.0
    freqs = torch.exp(torch.arange(half, dtype=torch.float) * -emb)
    ang = torch.arange(num_embeddings, dtype=torch.float)[:, None] * freqs[None, :]
    out = torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)
    if dim % 2 == 1:
        out = torch.cat([out, torch.zeros(num_embeddings, 1)], dim=1)
    if padding_idx is not None:
        out[padding_idx, :] = 0
    return out


@pytest.mark.parametrize("dim", [16, 64, 300, 17])
def test_table_matches_torch_oracle(dim):
    ours = np.asarray(sinusoidal_table(33, dim))
    theirs = torch_sinusoidal_table(33, dim).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_padding_row_is_zero():
    tab = np.asarray(sinusoidal_table(10, 32))
    assert np.all(tab[0] == 0.0)
    assert np.any(tab[1] != 0.0)


def test_padding_aware_positions_closed_form():
    """Non-pad step j gets position j+1; pad steps get 0.

    This is the closed form of fairseq's masked_scatter construction
    (source and destination share the mask in the same row-major order).
    """
    ch0 = np.array([[1.0, 0.0, 2.0, 0.0],
                    [0.0, 0.0, 3.0, 4.0]], dtype=np.float32)
    pos = np.asarray(padding_aware_positions(ch0))
    np.testing.assert_array_equal(pos, [[1, 0, 3, 0], [0, 0, 3, 4]])


def test_masked_scatter_equivalence():
    """Verify the closed form against an explicit torch masked_scatter."""
    torch.manual_seed(0)
    t = torch.randn(3, 7)
    t[t.abs() < 0.5] = 0.0    # some pads
    mask = t.ne(0)
    positions = torch.arange(1, 8).expand_as(t)
    oracle = t.clone().masked_scatter_(mask, positions[mask].float()).long()
    oracle[~mask] = 0
    ours = np.asarray(padding_aware_positions(t.numpy()))
    np.testing.assert_array_equal(ours, oracle.numpy())


def test_positional_embedding_zeros_on_pad():
    x = np.random.RandomState(0).randn(2, 6, 16).astype(np.float32)
    x[0, 3, 0] = 0.0   # mark one step as padding via channel 0
    pe = np.asarray(positional_embedding(x))
    assert pe.shape == (2, 6, 16)
    assert np.all(pe[0, 3] == 0.0)
    # non-pad step 3 of batch 1 must equal table row 4
    tab = np.asarray(sinusoidal_table(7, 16))
    np.testing.assert_allclose(pe[1, 3], tab[4], atol=1e-6)
