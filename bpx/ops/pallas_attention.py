"""Flash attention TPU kernels (Pallas) with fused mask + dropout.

Implements the reference's exact attention semantics
(ref: multihead_attention.py:10-158 — q pre-scaled, fp32 softmax, dropout on
the attention probabilities; ref: transformer.py:209-216 — rectangular offset
future-mask ``col <= row + |Tk - Tq|``) as tiled TPU kernels.

Two statically-selected regimes:

* **single-pass** (``Tk <= 1024`` — every shape in the reference configs):
  the whole key range lives in one VMEM tile, so the softmax is computed
  directly (max / exp / sum once) with no online rescaling — roughly half
  the VPU work of the online form, which matters because these kernels are
  VPU-bound at short sequence lengths;
* **online** (longer Tk): FlashAttention-2 style online-softmax over key
  blocks with analytic band skipping (key blocks entirely above the band are
  skipped — the causal-flash win generalised to the rectangular offset).

backward: when both T ranges fit single tiles (every reference config),
ONE fused program recomputes P from the saved logsumexp once and emits
dQ, dK and dV together (``_bwd_fused_kernel``; the split form recomputed
the score matrix, exp, dropout hash and dO·V^T twice — the VPU work that
dominates at short sequence lengths).  Longer shapes fall back to two
kernels — dQ (grid over Q blocks) and dK/dV (grid over K blocks).
fp32 accumulation, bf16 matmul operands everywhere (the MXU multiplies
bf16 natively; fp32 operands would force the slow decomposition).

**Fused dropout** (ref: multihead_attention.py:123): the keep mask is a
stateless counter-based hash (murmur3 finalizer over the global
(batch·head, row, col) element index mixed with a per-call seed), so the
identical mask is recomputable in every backward kernel regardless of tile
iteration order, costs a handful of VPU integer ops per element, never
touches HBM, and behaves identically under Pallas interpret mode (CPU
tests) and on real TPUs.  The softmax denominator is computed from the
*undropped* probabilities (dropout-after-softmax semantics).  Divergence:
the Bernoulli(keep) stream differs from torch's RNG — same distribution,
different draws (PARITY.md).

**Per-sample key lengths** (``kv_lens``): BERT-style right-padded batches
are masked analytically from a per-sample length instead of an additive
(B, 1, 1, Tk) bias.  Requires padding to be a contiguous suffix —
guaranteed by ``bpx.data.collate``.  When no kv_lens is given and Tk needs
no padding, the compare is skipped entirely (``full_kv`` fast path).

Layout contract: inputs are (B, T, H, D) with **q already scaled** by
``head_dim**-0.5`` (matching bpx.ops.attention).  The kernels consume the
*raw* ragged shapes — D (e.g. 96, 64) and T (e.g. 200) are NOT padded in
HBM; Mosaic pads the VMEM tiles internally, which costs nothing in DMA
traffic.  The q block is the whole Tq whenever it fits one tile
(<= MAX_BLOCK_Q), so K/V stream through exactly once per (batch, head).
Only the rare long-sequence online path (Tk > 1024 or Tq > 512 with a
non-128-multiple length) falls back to zero-padding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
MAX_BLOCK_Q = 512            # largest q tile (VMEM: scores fp32 BQ x Tk)
SINGLE_PASS_MAX_K = 1024     # whole-K tile: direct softmax, no online pass
NEG_INF = -1e30


def _pick_block_q(tq: int) -> int:
    """Q tile size for a (possibly ragged) ``tq``; 0 means "pad first".

    Whole-Tq tile when it fits (the kernels are HBM-bound at these lengths:
    K and V stream through once per q block, so one block per (batch, head)
    minimises DMA); otherwise the largest 128-multiple divisor.  Returns 0
    when no aligned divisor exists — the wrapper zero-pads Tq to 128 then.
    """
    if tq <= MAX_BLOCK_Q:
        return tq
    for cand in range(MAX_BLOCK_Q, 0, -BLOCK_Q):
        if tq % cand == 0:
            return cand
    return 0


def _interpret() -> bool:
    """Interpret mode off-TPU (CPU tests); compiled on real TPUs."""
    import jax
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# stateless dropout mask
# ---------------------------------------------------------------------------

def _keep_mask(seed, bh, row, col, tk_p: int, rate: float):
    """Bernoulli(1-rate) keep mask from a counter-based hash.

    ``row``/``col`` are int32 global coordinate grids; the global element
    index mixed with the seed goes through an avalanche mixer, so fwd and
    both bwd kernels regenerate the identical mask from
    (seed, bh, row, col) alone.  The mixer is a 2-round xorshift-multiply
    variant of the murmur3 finalizer (saves ~1/3 of the per-element
    integer ops in every dropout site) — a Bernoulli threshold test needs
    no perfect avalanche, only absence of visible lane/row correlation,
    which round-trips through two multiplies fine (uniformity pinned by
    the dropout-rate statistics tests).
    """
    idx = (bh.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
           + row.astype(jnp.uint32) * jnp.uint32(tk_p)
           + col.astype(jnp.uint32))
    x = idx * jnp.uint32(0x9E3779B9) + seed
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return x >= threshold


def _score_mask(s, row, col, kv_len, offset: int, masked: bool,
                full_kv: bool):
    """Apply padding + band masks to a score tile (static specialisation).

    Returns (masked scores, ok-mask or None when no mask applies).
    """
    ok = None
    if not full_kv:
        ok = col < kv_len
    if masked:
        band = col <= row + offset
        ok = band if ok is None else jnp.logical_and(ok, band)
    return (s if ok is None else jnp.where(ok, s, NEG_INF)), ok


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(kvl_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                offset: int, masked: bool, full_kv: bool, blocks_k: int,
                rate: float, tk_p: int):
    """One (batch*head, q-block) program."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kv_len = None if full_kv else kvl_ref[b]
    # operands stay in the input dtype (bf16 on TPU): the MXU multiplies
    # bf16 natively and accumulates fp32 via preferred_element_type
    q = q_ref[0]                                        # (BQ, D)
    bq, d = q.shape
    tk = k_ref.shape[1]
    if rate > 0.0:
        seed = seed_ref[0].astype(jnp.uint32)
        inv_keep = jnp.float32(1.0 / (1.0 - rate))

    if blocks_k == 1:
        # -- single-pass: direct softmax over the whole key range ---------
        # coordinate grids only when some per-element predicate needs them
        # (band mask, padding mask, dropout hash) — the deterministic
        # full-kv path skips the iotas entirely
        if masked or not full_kv or rate > 0.0:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
        else:
            row = col = None
        s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s, _ = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
        m = jnp.max(s, axis=1)
        p = jnp.exp(s - m[:, None])
        l = jnp.sum(p, axis=1)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            p = jnp.where(keep, p * inv_keep, 0.0)
        acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
        lse = (m + jnp.log(l_safe)).astype(jnp.float32)
        lse_ref[0] = lse[None, :]
        return

    # -- online softmax over key blocks ----------------------------------
    row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, BLOCK_K), 0)

    def body(kj, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
        v_blk = v_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = kj * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (bq, BLOCK_K), 1)
        s, _ = _score_mask(s, row, col, kv_len, offset, masked, full_kv)

        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        # softmax denominator from the *undropped* probabilities
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            p = jnp.where(keep, p * inv_keep, 0.0)
        # probs cast to the compute dtype before the PV product — the same
        # numerics as the einsum path (attention.py:47-52)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)

    if masked:
        # skip key blocks whose first column is above the band for every
        # row of this q block: kj*BK > (qi+1)*BQ - 1 + offset
        hi = jnp.minimum(
            (((qi + 1) * bq - 1 + offset) // BLOCK_K) + 1, blocks_k)
        acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))
    else:
        acc, m, l = jax.lax.fori_loop(0, blocks_k, body, (acc0, m0, l0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    # stats live as one (1, BQ) sublane row — Mosaic masks the partial
    # sublane store; HBM holds exactly (bh, 1, tq) fp32
    lse = (m + jnp.log(l_safe)).astype(jnp.float32)
    lse_ref[0] = lse[None, :]


def _fwd(q, k, v, kvl, seed, masked: bool, offset: int, rate: float,
         full_kv: bool):
    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = _pick_block_q(tq)
    blocks_q = tq // block_q
    blocks_k = 1 if tk <= SINGLE_PASS_MAX_K else tk // BLOCK_K

    kernel = functools.partial(_fwd_kernel, offset=offset, masked=masked,
                               full_kv=full_kv, blocks_k=blocks_k,
                               rate=rate, tk_p=tk)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, blocks_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32),
        ],
        interpret=_interpret())(kvl, seed, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(kvl_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   o_ref, dq_ref, *,
                   offset: int, masked: bool, full_kv: bool, blocks_k: int,
                   rate: float, tk_p: int, xla_delta: bool):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kv_len = None if full_kv else kvl_ref[b]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    if xla_delta:
        # delta_i = sum_d dO*O precomputed once by an XLA fusion and shared
        # with the dkv kernel — o_ref holds the (1, 1, BQ) delta row
        delta = o_ref[0, 0]
    else:
        # computed here from the saved output instead of materialising a
        # broadcast (bh, 8, tq) tensor in HBM
        delta = jnp.sum(do.astype(jnp.float32)
                        * o_ref[0].astype(jnp.float32), axis=1)
    bq, d = q.shape
    tk = k_ref.shape[1]
    if rate > 0.0:
        seed = seed_ref[0].astype(jnp.uint32)
        inv_keep = jnp.float32(1.0 / (1.0 - rate))

    if blocks_k == 1:
        # -- single-pass --------------------------------------------------
        if masked or not full_kv or rate > 0.0:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
        else:
            row = col = None
        s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        _, ok = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
        p = jnp.exp(s - lse[:, None])
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = (p * (dp - delta[:, None])).astype(k_ref.dtype)
        dq = jax.lax.dot_general(ds, k_ref[0], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0] = dq.astype(dq_ref.dtype)
        return

    row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, BLOCK_K), 0)

    def body(kj, dq):
        k_blk = k_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
        v_blk = v_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = kj * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (bq, BLOCK_K), 1)
        _, ok = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
        p = jnp.exp(s - lse[:, None])
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = (p * (dp - delta[:, None])).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((bq, d), jnp.float32)
    if masked:
        hi = jnp.minimum(
            (((qi + 1) * bq - 1 + offset) // BLOCK_K) + 1, blocks_k)
        dq = jax.lax.fori_loop(0, hi, body, dq0)
    else:
        dq = jax.lax.fori_loop(0, blocks_k, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(kvl_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    o_ref, dk_ref, dv_ref, *,
                    offset: int, masked: bool, full_kv: bool, blocks_q: int,
                    rate: float, tk_p: int, xla_delta: bool):
    b = pl.program_id(0)
    kj = pl.program_id(1)
    kv_len = None if full_kv else kvl_ref[b]
    k_blk = k_ref[0]                                     # (BK, D)
    v_blk = v_ref[0]
    bk, d = k_blk.shape
    tq = q_ref.shape[1]
    if rate > 0.0:
        seed = seed_ref[0].astype(jnp.uint32)
        inv_keep = jnp.float32(1.0 / (1.0 - rate))

    if blocks_q == 1:
        # -- single-pass: the whole Q range in one tile --------------------
        if masked or not full_kv or rate > 0.0:
            row = jax.lax.broadcasted_iota(jnp.int32, (tq, bk), 0)
            col = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (tq, bk), 1)
        else:
            row = col = None
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0]
        if xla_delta:
            delta = o_ref[0, 0]
        else:
            delta = jnp.sum(do.astype(jnp.float32)
                            * o_ref[0].astype(jnp.float32), axis=1)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        _, ok = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
        p = jnp.exp(s - lse[:, None])
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pd = p
        dv = jax.lax.dot_general(pd.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)
        return

    col = kj * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Q, bk), 1)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :]
        do = do_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :]
        lse = lse_ref[0, 0, pl.ds(qi * BLOCK_Q, BLOCK_Q)]
        if xla_delta:
            delta = o_ref[0, 0, pl.ds(qi * BLOCK_Q, BLOCK_Q)]
        else:
            delta = jnp.sum(
                do.astype(jnp.float32)
                * o_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :]
                .astype(jnp.float32), axis=1)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = qi * BLOCK_Q + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, bk), 0)
        _, ok = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
        p = jnp.exp(s - lse[:, None])
        if ok is not None:
            p = jnp.where(ok, p, 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed, b, row, col, tk_p, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pd = p
        dv = dv + jax.lax.dot_general(pd.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    if masked:
        # q blocks whose last row is below the band start: rows with
        # row + offset >= kj*BK exist iff (qi+1)*BQ - 1 >= kj*BK - offset
        lo = jnp.maximum((kj * BLOCK_K - offset) // BLOCK_Q, 0)
        dk, dv = jax.lax.fori_loop(lo, blocks_q, body, (dk0, dv0))
    else:
        dk, dv = jax.lax.fori_loop(0, blocks_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(kvl_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                      lse_ref, o_ref, dq_ref, dk_ref, dv_ref, *,
                      offset: int, masked: bool, full_kv: bool,
                      rate: float, tk_p: int, xla_delta: bool):
    """Single-pass fused backward: dq, dk AND dv from ONE score tile.

    Usable whenever both T ranges fit single tiles (Tq <= MAX_BLOCK_Q and
    Tk <= SINGLE_PASS_MAX_K — every reference config).  The split dq/dkv
    kernels each recompute S = q k^T, the exp, the dropout hash and
    dp = dO v^T; at these short sequence lengths the kernels are VPU-bound
    on exactly that recomputed elementwise work, so fusing the two
    programs halves it and reads q/k/v/dO from HBM once instead of twice.
    """
    b = pl.program_id(0)
    kv_len = None if full_kv else kvl_ref[b]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    tq, _ = q.shape
    tk = k_blk.shape[0]
    if xla_delta:
        delta = o_ref[0, 0]
    else:
        delta = jnp.sum(do.astype(jnp.float32)
                        * o_ref[0].astype(jnp.float32), axis=1)
    if rate > 0.0:
        seed = seed_ref[0].astype(jnp.uint32)
        inv_keep = jnp.float32(1.0 / (1.0 - rate))
    if masked or not full_kv or rate > 0.0:
        row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    else:
        row = col = None
    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    _, ok = _score_mask(s, row, col, kv_len, offset, masked, full_kv)
    p = jnp.exp(s - lse[:, None])
    if ok is not None:
        p = jnp.where(ok, p, 0.0)
    dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed, b, row, col, tk_p, rate)
        pd = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        pd = p
    dv = jax.lax.dot_general(pd.astype(do.dtype), do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta[:, None])).astype(q.dtype)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _use_fused_bwd() -> bool:
    """One fused single-pass backward program instead of split dq / dkv
    kernels (see _bwd_fused_kernel) wherever both T ranges fit single
    tiles.  Default since the round-4 hardware A/B: -13.1 / -11.6 ms/step
    across two independent control pairs at the moviescope bench config
    (798.4 -> 785.3, 804.1 -> 792.5 — one score materialisation instead
    of two).  BPX_FUSED_BWD=0 restores the split pair (kept: it is the
    only backward for multi-tile shapes, and the knob anchors the
    fused-vs-split parity test)."""
    from bpx.utils.env import env_flag
    return env_flag("BPX_FUSED_BWD", True)


def _use_xla_delta() -> bool:
    """delta = sum_d dO*O precomputed by one XLA fusion (reads dO+O once,
    writes (bh, 1, tq) fp32) and consumed by BOTH backward kernels, instead
    of each kernel re-reading O and re-reducing it.  Opt-out knob:
    BPX_XLA_DELTA=0 restores the in-kernel computation."""
    from bpx.utils.env import env_flag
    return env_flag("BPX_XLA_DELTA", True)


def _bwd(masked, offset, rate, full_kv, res, g):
    q, k, v, kvl, seed, out, lse = res
    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = _pick_block_q(tq)
    blocks_q = tq // block_q
    blocks_k = 1 if tk <= SINGLE_PASS_MAX_K else tk // BLOCK_K
    # dkv: one whole-Q pass per key block when Q fits a tile; otherwise the
    # kernel iterates BLOCK_Q-sized tiles of the in-VMEM Q internally.
    dkv_blocks_q = 1 if tq <= SINGLE_PASS_MAX_K else tq // BLOCK_Q
    dkv_block_k = tk if blocks_k == 1 else BLOCK_K

    xla_delta = _use_xla_delta()
    if xla_delta:
        # one fusion shared by both kernels; (bh, 1, tq) like lse
        o_arg = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)[:, None, :]
        dq_o_spec = pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i))
        dkv_o_spec = pl.BlockSpec((1, 1, tq), lambda b, j: (b, 0, 0))
    else:
        o_arg = out
        dq_o_spec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0))
        dkv_o_spec = pl.BlockSpec((1, tq, d), lambda b, j: (b, 0, 0))

    if blocks_q == 1 and blocks_k == 1 and _use_fused_bwd():
        # both T ranges fit single tiles: one program computes dq+dk+dv
        # from a single score/prob materialisation (_bwd_fused_kernel)
        fused_o_spec = (pl.BlockSpec((1, 1, tq), lambda b: (b, 0, 0))
                        if xla_delta
                        else pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, offset=offset,
                              masked=masked, full_kv=full_kv, rate=rate,
                              tk_p=tk, xla_delta=xla_delta),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, tq), lambda b: (b, 0, 0)),
                fused_o_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), k.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), v.dtype),
            ],
            interpret=_interpret())(kvl, seed, q, k, v, g, lse, o_arg)
        return dq, dk, dv, None, None

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, offset=offset, masked=masked,
                          full_kv=full_kv, blocks_k=blocks_k, rate=rate,
                          tk_p=tk, xla_delta=xla_delta),
        grid=(bh, blocks_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            dq_o_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=_interpret())(kvl, seed, q, k, v, g, lse, o_arg)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, offset=offset, masked=masked,
                          full_kv=full_kv, blocks_q=dkv_blocks_q, rate=rate,
                          tk_p=tk, xla_delta=xla_delta),
        grid=(bh, tk // dkv_block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, dkv_block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, dkv_block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, tq, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, tq), lambda b, j: (b, 0, 0)),
            dkv_o_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, dkv_block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, dkv_block_k, d), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, tk, d), v.dtype),
        ],
        interpret=_interpret())(kvl, seed, q, k, v, g, lse, o_arg)
    return dq, dk, dv, None, None


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, kvl, seed, masked: bool, offset: int, rate: float,
           full_kv: bool):
    out, _ = _fwd(q, k, v, kvl, seed, masked, offset, rate, full_kv)
    return out


def _flash_fwd(q, k, v, kvl, seed, masked, offset, rate, full_kv):
    out, lse = _fwd(q, k, v, kvl, seed, masked, offset, rate, full_kv)
    # Under jax.checkpoint with the "save_attn" policy
    # (save_only_these_names below), tagging out/lse makes them remat
    # residuals, which prunes the forward kernel re-run from the backward
    # recompute slice (q/k/v come from the qkv GEMMs that the recompute
    # produces anyway for their own grads).
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, kvl, seed, out, lse)


#: jax.checkpoint policy that keeps flash outputs across a remat boundary —
#: trades ~50 MB/attention of activation memory for skipping the forward
#: kernel re-run in the backward pass.
SAVE_ATTN_POLICY = jax.checkpoint_policies.save_only_these_names(
    "flash_out", "flash_lse")


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    masked: bool = True,
                    kv_lens: Optional[jax.Array] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jax.Array] = None,
                    layout: str = "bthd",
                    out_layout: str = "bthd") -> jax.Array:
    """(B, Tq, H, D) x (B, Tk, H, D) -> (B, Tq, H, D); q pre-scaled.

    ``masked=True`` applies the offset band ``col <= row + |Tk - Tq|``
    computed from the *unpadded* lengths (ref: transformer.py:213).
    ``kv_lens`` (B,) int32 masks per-sample right-padding (keys at
    ``col >= kv_lens[b]``).  ``dropout_rate`` > 0 applies fused dropout on
    the attention probabilities seeded by ``dropout_seed`` (scalar uint32).

    ``layout="bhtd"`` accepts inputs already head-major (B, H, T, D): the
    kernel-facing (B*H, T, D) reshape is then free, removing the HBM
    transpose this wrapper otherwise pays — and, through the custom_vjp,
    the mirrored dq/dk/dv transposes in backward.  ``out_layout="bhtd"``
    likewise returns the context head-major (B, H, Tq, D), removing the
    output transpose (and its dO mirror in backward) when the consumer can
    contract over (h, d) directly.
    """
    if layout == "bhtd":
        B, H, Tq, D = q.shape
        Tk = k.shape[2]
    else:
        B, Tq, H, D = q.shape
        Tk = k.shape[1]
    offset = abs(Tk - Tq)
    # The band col <= row + offset is vacuous when offset >= Tk-1 (every
    # key column is visible to every query row, e.g. Tq=512/Tk=200 ->
    # offset 312): statically drop the whole mask computation (iotas,
    # compares, selects and the loop-bound clamps) from all three kernels.
    if masked and offset >= Tk - 1:
        masked = False

    # The kernels consume raw ragged T and D (Mosaic pads VMEM tiles
    # internally — no HBM traffic); zero-pad only the rare long-sequence
    # shapes the tiled grids cannot cover.
    tq_p = Tq if _pick_block_q(Tq) else _round_up(Tq, BLOCK_Q)
    tk_p = (Tk if Tk <= SINGLE_PASS_MAX_K or Tk % BLOCK_K == 0
            else _round_up(Tk, BLOCK_K))
    full_kv = kv_lens is None and Tk == tk_p

    def prep(x, t_p):
        if layout == "bhtd":
            x = x.reshape(B * H, x.shape[2], D)      # free: already head-major
        else:
            x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        if t_p != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, t_p - x.shape[1]), (0, 0)))
        return x

    qf, kf, vf = prep(q, tq_p), prep(k, tk_p), prep(v, tk_p)
    if kv_lens is None:
        kvl = jnp.full((B * H,), Tk, jnp.int32)
    else:
        kvl = jnp.repeat(kv_lens.astype(jnp.int32), H)
    if dropout_rate > 0.0:
        assert dropout_seed is not None, \
            "dropout_rate > 0 requires dropout_seed"
        seed = jnp.asarray(dropout_seed, jnp.uint32).reshape((1,))
    else:
        seed = jnp.zeros((1,), jnp.uint32)
    out = _flash(qf, kf, vf, kvl, seed, masked, offset, float(dropout_rate),
                 full_kv)
    if tq_p != Tq:
        out = out[:, :Tq]
    out = out.reshape(B, H, Tq, D)
    if out_layout == "bhtd":
        return out
    return jnp.swapaxes(out, 1, 2)
