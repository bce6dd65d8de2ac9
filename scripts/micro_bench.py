"""Microbenchmarks for hot-path building blocks on the real TPU.

Isolates single ops/layers with per-call host sync (same measurement
protocol as bench.py) to attribute step time:

  python scripts/micro_bench.py ln attn bert_layer enc_layer

Each case prints a JSON line with p50 latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps: int = 10, warmup: int = 3) -> float:
    # Per-call host sync by FETCHING a scalar reduction of the output —
    # block_until_ready through the axon tunnel returns far below the
    # compute floor (see PERF.md "Measurement integrity").
    import jax
    import jax.numpy as jnp

    def synced(*a):
        out = fn(*a)
        return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

    synced = jax.jit(synced)
    for _ in range(warmup):
        float(synced(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(synced(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    cases = sys.argv[1:] or ["ln", "attn", "bert_layer"]
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    B, T, E = 64, 512, 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, E).astype(np.float32)).astype(jnp.bfloat16)

    # fixed per-call cost (tunnel round-trip + dispatch): subtract mentally
    print(json.dumps({"case": "null_sync",
                      "p50_ms": round(_time(lambda x: x * 1.0, x) * 1e3, 3)}))

    if "ln" in cases:
        ln = nn.LayerNorm(dtype=jnp.bfloat16)
        p = ln.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(ln.apply(p, x).astype(jnp.float32))

        fwd = jax.jit(lambda p, x: ln.apply(p, x))
        fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        print(json.dumps({"case": "ln_fwd(64,512,768)bf16",
                          "p50_ms": round(_time(fwd, p, x) * 1e3, 3)}))
        print(json.dumps({"case": "ln_fwdbwd",
                          "p50_ms": round(_time(fwdbwd, p, x) * 1e3, 3)}))

    if "attn" in cases:
        H, D = 12, 64
        q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def run_flash(q):
            from bpx.ops.pallas_attention import flash_attention
            return flash_attention(q, q, q, masked=False)

        def loss_flash(q):
            return jnp.sum(run_flash(q).astype(jnp.float32))

        def run_einsum(q):
            from bpx.ops.attention import dot_product_attention
            return dot_product_attention(q, q, q)

        def loss_einsum(q):
            return jnp.sum(run_einsum(q).astype(jnp.float32))

        for name, f in [("flash_fwd", run_flash),
                        ("flash_fwdbwd", jax.grad(loss_flash)),
                        ("einsum_fwd", run_einsum),
                        ("einsum_fwdbwd", jax.grad(loss_einsum))]:
            print(json.dumps({
                "case": f"{name} B64 T512 H12 D64",
                "p50_ms": round(_time(jax.jit(f), q) * 1e3, 3)}))

    if "bert_layer" in cases:
        from bpx.config import BertConfig
        from bpx.ops.bert import BertLayer
        cfg = BertConfig()
        for impl in ("xla", "pallas"):
            layer = BertLayer(cfg, jnp.bfloat16, impl)
            kvl = jnp.full((B,), T, jnp.int32)
            p = layer.init(jax.random.PRNGKey(0), x, None, kvl)

            def loss(p, x):
                return jnp.sum(layer.apply(p, x, None, kvl)
                               .astype(jnp.float32))

            fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
            print(json.dumps({
                "case": f"bert_layer_fwdbwd impl={impl}",
                "p50_ms": round(_time(fwdbwd, p, x) * 1e3, 3)}))

    if "enc_layer" in cases:
        from bpx.ops.encoder import TransformerEncoderLayer
        kv = jnp.asarray(rng.randn(B, 200, E).astype(np.float32)
                         ).astype(jnp.bfloat16)
        for impl in ("xla", "pallas"):
            layer = TransformerEncoderLayer(
                embed_dim=E, num_heads=8, attn_mask=True, biprojection=True,
                dtype=jnp.bfloat16, attention_impl=impl)
            p = layer.init(jax.random.PRNGKey(0), x, kv, kv)

            def loss(p, x, kv):
                return jnp.sum(layer.apply(p, x, kv, kv)
                               .astype(jnp.float32))

            fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            print(json.dumps({
                "case": f"biproj_layer_fwdbwd 512q/200kv impl={impl}",
                "p50_ms": round(_time(fwdbwd, p, x, kv) * 1e3, 3)}))


if __name__ == "__main__":
    main()
