"""Parity tests: bpx TransformerEncoder(Layer) vs a torch oracle.

The oracle implements the documented pre-LN dataflow of the reference
(ref: transformer.py:102-216) independently in torch: self / cross /
biprojection modes, shared LN0 on cross Q/KV, un-normalised biprojection
query, shared attention weights between the biprojection sublayers, the
``sqrt(E)``-scaled embedding with channel-0-keyed positions, and the final
LayerNorm.  Weights are copied from the flax params into torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from bpx.ops.encoder import TransformerEncoder, TransformerEncoderLayer


def _t(x):
    # passthrough keeps the oracles differentiable when the param tree has
    # been torchified with requires_grad leaves (test_train_parity)
    if isinstance(x, torch.Tensor):
        return x
    return torch.tensor(np.asarray(x, dtype=np.float32))


class TorchOracleLayer:
    """Pre-LN layer oracle with packed-MHA attention."""

    def __init__(self, params, E, H, biprojection):
        p = params
        a = p["attn"]
        self.in_w = torch.cat([_t(a["q_proj"]["kernel"]).T,
                               _t(a["k_proj"]["kernel"]).T,
                               _t(a["v_proj"]["kernel"]).T], dim=0)
        self.in_b = torch.cat([_t(a["q_proj"]["bias"]),
                               _t(a["k_proj"]["bias"]),
                               _t(a["v_proj"]["bias"])])
        self.out_w = _t(a["out_proj"]["kernel"]).T
        self.out_b = _t(a["out_proj"]["bias"])
        self.norms = []
        n = 3 if biprojection else 2
        for i in range(n):
            self.norms.append((_t(p[f"ln{i}"]["scale"]), _t(p[f"ln{i}"]["bias"])))
        self.fc1_w, self.fc1_b = _t(p["fc1"]["kernel"]).T, _t(p["fc1"]["bias"])
        self.fc2_w, self.fc2_b = _t(p["fc2"]["kernel"]).T, _t(p["fc2"]["bias"])
        self.E, self.H = E, H
        self.biprojection = biprojection

    def ln(self, i, x):
        w, b = self.norms[i]
        return F.layer_norm(x, (self.E,), w, b)

    def mha(self, q, k, v, mask):
        # batch-first -> seq-first for the torch functional
        out, _ = F.multi_head_attention_forward(
            q.transpose(0, 1), k.transpose(0, 1), v.transpose(0, 1),
            self.E, self.H, self.in_w, self.in_b, None, None, False, 0.0,
            self.out_w, self.out_b, training=False, need_weights=False,
            attn_mask=mask)
        return out.transpose(0, 1)

    @staticmethod
    def offset_mask(tq, tk):
        return torch.triu(torch.full((tq, tk), float("-inf")), 1 + abs(tk - tq))

    def forward(self, x, x_k=None, x_v=None, attn_mask=True):
        Tq = x.shape[1]
        if x_k is None:
            mask = self.offset_mask(Tq, Tq) if attn_mask else None
            h = self.ln(0, x)
            x = x + self.mha(h, h, h, mask)
            ffn_ln = 1
        elif self.biprojection:
            mask = self.offset_mask(Tq, Tq) if attn_mask else None
            h = self.ln(0, x)
            x = x + self.mha(h, h, h, mask)
            mask = self.offset_mask(Tq, x_k.shape[1]) if attn_mask else None
            k, v = self.ln(1, x_k), self.ln(1, x_v)
            x = x + self.mha(x, k, v, mask)   # un-normalised query
            ffn_ln = 2
        else:
            mask = self.offset_mask(Tq, x_k.shape[1]) if attn_mask else None
            q, k, v = self.ln(0, x), self.ln(0, x_k), self.ln(0, x_v)
            x = x + self.mha(q, k, v, mask)
            ffn_ln = 1
        h = self.ln(ffn_ln, x)
        h = F.linear(F.relu(F.linear(h, self.fc1_w, self.fc1_b)),
                     self.fc2_w, self.fc2_b)
        return x + h


def _run_layer(mode, attn_mask):
    E, H, B = 32, 4, 2
    Tq, Tk = 6, 9
    rng = np.random.RandomState(0)
    x = rng.randn(B, Tq, E).astype(np.float32)
    xk = rng.randn(B, Tk, E).astype(np.float32)

    bip = mode == "biproj"
    layer = TransformerEncoderLayer(embed_dim=E, num_heads=H,
                                    attn_mask=attn_mask, biprojection=bip)
    if mode == "self":
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = layer.apply(variables, jnp.asarray(x))
    else:
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               jnp.asarray(xk), jnp.asarray(xk))
        ours = layer.apply(variables, jnp.asarray(x), jnp.asarray(xk),
                           jnp.asarray(xk))

    oracle = TorchOracleLayer(variables["params"], E, H, bip)
    if mode == "self":
        ref = oracle.forward(_t(x), attn_mask=attn_mask)
    else:
        ref = oracle.forward(_t(x), _t(xk), _t(xk), attn_mask=attn_mask)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1.5e-4)


@pytest.mark.parametrize("mode", ["self", "cross", "biproj"])
@pytest.mark.parametrize("attn_mask", [False, True])
def test_layer_matches_oracle(mode, attn_mask):
    _run_layer(mode, attn_mask)


def test_biprojection_shares_attention_weights():
    """Both biprojection sublayers must use the same attention params
    (ref: transformer.py:161,169 call self.self_attn twice)."""
    E, H = 16, 2
    layer = TransformerEncoderLayer(embed_dim=E, num_heads=H,
                                    biprojection=True)
    x = jnp.zeros((1, 4, E))
    variables = layer.init(jax.random.PRNGKey(0), x, x, x)
    # exactly one attention parameter subtree
    assert "attn" in variables["params"]
    n_attn = sum(1 for k in variables["params"] if k.startswith("attn"))
    assert n_attn == 1


def test_stack_matches_oracle():
    """Full encoder: scale + positions + layers + final LN
    (ref: transformer.py:52-93)."""
    import math
    from bpx.ops.positions import positional_embedding

    E, H, B, Tq, Tk, L = 32, 4, 2, 6, 9, 2
    rng = np.random.RandomState(1)
    x = rng.randn(B, Tq, E).astype(np.float32)
    xk = rng.randn(B, Tk, E).astype(np.float32)

    enc = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                             attn_mask=True, biprojection=False)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(xk), jnp.asarray(xk))
    ours = enc.apply(variables, jnp.asarray(x), jnp.asarray(xk),
                     jnp.asarray(xk))

    # Oracle: embed, run layer oracles, final LN.
    def embed(arr):
        scaled = math.sqrt(E) * arr
        pe = np.asarray(positional_embedding(arr.astype(np.float32)))
        return _t(scaled + pe)

    h = embed(x)
    hk = embed(xk)
    for i in range(L):
        p = variables["params"][f"layer{i}"]
        h = TorchOracleLayer(p, E, H, False).forward(h, hk, hk,
                                                     attn_mask=True)
    fw = _t(variables["params"]["final_norm"]["scale"])
    fb = _t(variables["params"]["final_norm"]["bias"])
    ref = F.layer_norm(h, (E,), fw, fb)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=2e-4)


def test_scan_layers_matches_unrolled():
    """scan_layers+remat must be a pure compile-time transform: identical
    outputs to the unrolled stack given the same (stacked) weights."""
    E, H, L, B, Tq = 32, 4, 3, 2, 6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, Tq, E).astype(np.float32))
    plain = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                               attn_mask=True)
    scan = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                              attn_mask=True, scan_layers=True, remat=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls),
                           *[vp["params"][f"layer{i}"] for i in range(L)])
    vs = {"params": {"layers": stacked,
                     "final_norm": vp["params"]["final_norm"]}}
    a = plain.apply(vp, x)
    b = scan.apply(vs, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # gradients flow through remat+scan
    g = jax.grad(lambda v: float(0) + jnp.sum(scan.apply(v, x) ** 2))(vs)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_scan_layers_cross_mode():
    E, H, L = 32, 4, 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, E).astype(np.float32))
    xk = jnp.asarray(rng.randn(2, 9, E).astype(np.float32))
    scan = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                              attn_mask=True, biprojection=True,
                              scan_layers=True, remat=True)
    v = scan.init(jax.random.PRNGKey(0), x, xk, xk)
    out = scan.apply(v, x, xk, xk)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_remat_policy_save_attn_grads_match_full():
    """save_attn keeps flash out/lse across the remat boundary; grads must
    match full-recompute remat exactly (policy only changes scheduling)."""
    import os
    os.environ["BPX_FORCE_PALLAS"] = "1"
    try:
        E, H, L = 32, 4, 2
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, E).astype(np.float32))
        kv = jnp.asarray(rng.randn(2, 12, E).astype(np.float32))

        def build(policy):
            return TransformerEncoder(
                embed_dim=E, num_heads=H, layers=L, attn_mask=True,
                biprojection=True, attention_impl="pallas",
                scan_layers=True, remat=True, remat_policy=policy)

        m0, m1 = build(None), build("save_attn")
        p = m0.init(jax.random.PRNGKey(0), x, kv, kv)

        def loss(m, p):
            return jnp.sum(m.apply(p, x, kv, kv) ** 2)

        g0 = jax.grad(lambda p: loss(m0, p))(p)
        g1 = jax.grad(lambda p: loss(m1, p))(p)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
    finally:
        os.environ.pop("BPX_FORCE_PALLAS", None)


@pytest.mark.parametrize("qkv_bhtd,out_bhtd", [("1", "0"), ("0", "0"),
                                               ("1", "1"), ("0", "1")])
def test_layout_flags_match_default(monkeypatch, qkv_bhtd, out_bhtd):
    """Head-major q/k/v and output layouts (BPX_QKV_BHTD / BPX_OUT_BHTD)
    are pure layout changes: encoder outputs must match the einsum oracle
    path in every combination."""
    monkeypatch.setenv("BPX_FORCE_PALLAS", "1")
    monkeypatch.setenv("BPX_QKV_BHTD", qkv_bhtd)
    monkeypatch.setenv("BPX_OUT_BHTD", out_bhtd)
    E, H, L = 32, 4, 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, E).astype(np.float32))
    kv = jnp.asarray(rng.randn(2, 24, E).astype(np.float32))
    flash = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                               attn_mask=True, attention_impl="pallas")
    p = flash.init(jax.random.PRNGKey(0), x, kv, kv)
    got = flash.apply(p, x, kv, kv)
    monkeypatch.setenv("BPX_FORCE_PALLAS", "0")
    xla = TransformerEncoder(embed_dim=E, num_heads=H, layers=L,
                             attn_mask=True, attention_impl="xla")
    want = xla.apply(p, x, kv, kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
