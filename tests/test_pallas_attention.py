"""Flash-attention kernel parity vs the XLA einsum path (interpret mode on
CPU; the same kernels compile on TPU).

Covers: square + rectangular offset bands, unpadded lengths that require
internal padding (e.g. 200), head_dim 64 padding, and gradients through the
custom VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpx.ops.attention import dot_product_attention
from bpx.ops.masks import offset_future_mask
from bpx.ops.pallas_attention import flash_attention


def _mk(B, Tq, Tk, H, D, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Tq, H, D).astype(np.float32) * 0.3
    k = rng.randn(B, Tk, H, D).astype(np.float32) * 0.3
    v = rng.randn(B, Tk, H, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("tq,tk,masked", [
    (128, 128, True),      # square causal
    (128, 256, True),      # wide band (offset 128)
    (256, 128, True),      # tall band
    (200, 200, True),      # ragged whole-Tq tile (no padding since round 2)
    (128, 200, False),     # unmasked with key padding
    (600, 1160, True),     # pad fallback: Tq>512 non-128-mult, Tk>1024
                           # non-128-mult -> both zero-padded, online path
])
def test_flash_matches_einsum(tq, tk, masked):
    B, H, D = 1, 2, 64
    q, k, v = _mk(B, tq, tk, H, D)
    bias = offset_future_mask(tq, tk) if masked else None
    want = dot_product_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, masked=masked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_gradients_match():
    B, H, D, Tq, Tk = 1, 1, 64, 128, 128
    q, k, v = _mk(B, Tq, Tk, H, D, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        bias = offset_future_mask(Tq, Tk)
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_gradients_rectangular():
    B, H, D, Tq, Tk = 1, 1, 64, 128, 256
    q, k, v = _mk(B, Tq, Tk, H, D, seed=4)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        bias = offset_future_mask(Tq, Tk)
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


# ---------------------------------------------------------------------------
# per-sample key lengths (BERT right-padding)
# ---------------------------------------------------------------------------

def test_flash_kv_lens_matches_padded_bias():
    from bpx.ops.masks import key_padding_bias
    B, H, D, T = 2, 2, 64, 128
    q, k, v = _mk(B, T, T, H, D, seed=5)
    kv_lens = jnp.asarray([50, 128], jnp.int32)
    mask01 = (jnp.arange(T)[None, :] < kv_lens[:, None]).astype(jnp.int32)
    want = dot_product_attention(q, k, v, bias=key_padding_bias(mask01))
    got = flash_attention(q, k, v, masked=False, kv_lens=kv_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# fused dropout: the keep mask is a pure function (_keep_mask), so the
# reference path applies the *identical* mask after softmax — exact parity
# for both forward values and gradients.
# ---------------------------------------------------------------------------

def _materialized_keep(seed, B, H, Tq, Tk, tk_p, rate):
    from bpx.ops.pallas_attention import _keep_mask
    bh = jnp.arange(B * H, dtype=jnp.int32).reshape(B, H, 1, 1)
    row = jnp.arange(Tq, dtype=jnp.int32).reshape(1, 1, Tq, 1)
    col = jnp.arange(Tk, dtype=jnp.int32).reshape(1, 1, 1, Tk)
    return _keep_mask(jnp.uint32(seed), bh, row, col, tk_p, rate)


def _dropout_reference(q, k, v, bias, keep, rate):
    """einsum attention applying the materialized keep mask after softmax."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_dropout_exact_parity(masked):
    B, H, D, T, rate, seed = 2, 2, 64, 128, 0.3, 1234
    q, k, v = _mk(B, T, T, H, D, seed=6)
    keep = _materialized_keep(seed, B, H, T, T, 128, rate)
    bias = offset_future_mask(T, T) if masked else None

    got = flash_attention(q, k, v, masked=masked, dropout_rate=rate,
                          dropout_seed=jnp.uint32(seed))
    want = _dropout_reference(q, k, v, bias, keep, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    # keep-rate sanity: mean keep ~ 1 - rate
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1.0 - rate)) < 0.02, frac


def test_flash_dropout_gradients_exact():
    B, H, D, T, rate, seed = 1, 2, 64, 128, 0.25, 77
    q, k, v = _mk(B, T, T, H, D, seed=7)
    keep = _materialized_keep(seed, B, H, T, T, 128, rate)
    bias = offset_future_mask(T, T)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, masked=True, dropout_rate=rate,
                              dropout_seed=jnp.uint32(seed))
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dropout_reference(q, k, v, bias, keep, rate) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_dropout_seeds_differ():
    B, H, D, T, rate = 1, 1, 64, 128, 0.3
    q, k, v = _mk(B, T, T, H, D, seed=8)
    a = flash_attention(q, k, v, masked=False, dropout_rate=rate,
                        dropout_seed=jnp.uint32(1))
    a2 = flash_attention(q, k, v, masked=False, dropout_rate=rate,
                         dropout_seed=jnp.uint32(1))
    b = flash_attention(q, k, v, masked=False, dropout_rate=rate,
                        dropout_seed=jnp.uint32(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


# ---------------------------------------------------------------------------
# fused single-pass backward vs split dq/dkv kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("masked,rate,xla_delta", [
    (True, 0.0, "1"), (False, 0.0, "1"), (True, 0.25, "1"),
    (True, 0.25, "0"),   # in-kernel dO·O delta branch of the fused kernel
])
def test_fused_bwd_matches_split(monkeypatch, masked, rate, xla_delta):
    """The fused dq+dk+dv program (_bwd_fused_kernel) must reproduce the
    split kernels' gradients bit-for-bit — same tiles, same op order per
    output, only the score/prob materialisation is shared."""
    B, H, D, Tq, Tk = 2, 2, 96, 200, 128   # ragged Tq exercises raw tiles
    q, k, v = _mk(B, Tq, Tk, H, D, seed=11)
    monkeypatch.setenv("BPX_XLA_DELTA", xla_delta)

    def loss(q, k, v):
        out = flash_attention(
            q, k, v, masked=masked, dropout_rate=rate,
            dropout_seed=jnp.uint32(99) if rate else None)
        return jnp.sum(out ** 2)

    monkeypatch.setenv("BPX_FUSED_BWD", "1")
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("BPX_FUSED_BWD", "0")
    g_split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_split, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6,
                                   err_msg=f"d{name} mismatch")


def test_long_shape_uses_split_path(monkeypatch):
    """Shapes beyond the single-tile envelope must still route to the
    tiled dq/dkv kernels even with the fused knob on (default)."""
    monkeypatch.setenv("BPX_FUSED_BWD", "1")
    B, H, D, Tq, Tk = 1, 1, 64, 640, 1280   # blocks_q>1, blocks_k>1
    q, k, v = _mk(B, Tq, Tk, H, D, seed=12)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        bias = offset_future_mask(Tq, Tk)
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.slow
def test_flash_fuzz_random_shapes_and_knobs(monkeypatch):
    """Seeded randomized sweep over (B, H, D, Tq, Tk) x mask mode x dropout
    x backward-path knobs, forward AND gradients vs the einsum oracle.
    The fixed-point tests pin the production shapes; this sweep covers the
    corners between them (odd head dims, tiny T, extreme rectangles,
    random per-sample kv lengths) under every backward-kernel combination.
    Deterministic: one RandomState seed drives all trials."""
    from bpx.ops.masks import key_padding_bias

    rng = np.random.RandomState(20260818)
    for t in range(8):
        B = int(rng.choice([1, 2]))
        H = int(rng.choice([1, 2]))
        D = int(rng.choice([16, 25, 32, 48, 64, 80, 96]))
        Tq = int(rng.choice([8, 33, 64, 100, 128, 200]))
        Tk = int(rng.choice([8, 33, 64, 100, 128, 200, 256]))
        mode = str(rng.choice(["band", "kv", "plain"]))
        rate = float(rng.choice([0.0, 0.2])) if mode != "kv" else 0.0
        monkeypatch.setenv("BPX_FUSED_BWD", str(rng.randint(2)))
        monkeypatch.setenv("BPX_XLA_DELTA", str(rng.randint(2)))
        label = (B, H, D, Tq, Tk, mode, rate)

        q, k, v = _mk(B, Tq, Tk, H, D, seed=100 + t)
        masked = mode == "band"
        kv_lens = None
        bias = offset_future_mask(Tq, Tk) if masked else None
        if mode == "kv":
            lens = rng.randint(1, Tk + 1, size=B).astype(np.int32)
            kv_lens = jnp.asarray(lens)
            mask01 = (jnp.arange(Tk)[None, :] < kv_lens[:, None])
            bias = key_padding_bias(mask01.astype(jnp.int32))
        # tk_p == Tk for every fuzzed shape (all Tk <= SINGLE_PASS_MAX_K)
        seed_u = jnp.uint32(1000 + t) if rate else None
        keep = (_materialized_keep(1000 + t, B, H, Tq, Tk, Tk, rate)
                if rate else None)

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, masked=masked, kv_lens=kv_lens,
                                  dropout_rate=rate, dropout_seed=seed_u)
            return jnp.sum(out ** 2), out

        def loss_ref(q, k, v):
            if rate:
                out = _dropout_reference(q, k, v, bias, keep, rate)
            else:
                out = dot_product_attention(q, k, v, bias=bias)
            return jnp.sum(out ** 2), out

        (_, o1), g1 = jax.value_and_grad(
            loss_flash, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        (_, o2), g2 = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"fwd mismatch {label}")
        for a, b, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"d{name} mismatch {label}")


@pytest.mark.parametrize("d", [25, 30])
def test_flash_small_unaligned_head_dim(d):
    """iemocap (head_dim 25) / cmu-mosei (30) shapes: D is consumed raw —
    Mosaic pads VMEM lanes internally; values and gradients must match the
    einsum path."""
    B, H, Tq, Tk = 2, 3, 128, 128
    q, k, v = _mk(B, Tq, Tk, H, d, seed=13)
    bias = offset_future_mask(Tq, Tk)
    want = dot_product_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, masked=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, masked=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")
