import sys, os
sys.path.insert(0, "/root/repo")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 64, 512, 8, 96
E = H * D

def kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]; k = k_ref[0]; v = v_ref[0]
    outs = []
    for h in range(H):
        qh = q[:, h*D:(h+1)*D]
        kh = k[:, h*D:(h+1)*D]
        vh = v[:, h*D:(h+1)*D]
        s = jax.lax.dot_general(qh, kh, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1)
        p = jnp.exp(s - m[:, None])
        l = jnp.sum(p, axis=1)
        acc = jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        outs.append(acc / l[:, None])
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)

def attn_fused(q, k, v):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, E), lambda b: (b, 0, 0))]*3,
        out_specs=pl.BlockSpec((1, T, E), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, E), jnp.bfloat16),
    )(q, k, v)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, E).astype(np.float32)).astype(jnp.bfloat16) * 0.1

def timeit(f, *a):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    for _ in range(3): float(g(*a))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter(); float(g(*a)); ts.append(time.perf_counter()-t0)
    return sorted(ts)[5]*1e3

t_fused = timeit(attn_fused, x, x, x)

from bpx.ops.pallas_attention import flash_attention
def attn_ref(x):
    q = x.reshape(B, T, H, D)
    return flash_attention(q, q, q, masked=False)
t_ref = timeit(attn_ref, x)

o1 = attn_fused(x, x, x)
o2 = attn_ref(x).reshape(B, T, E)
err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
print(f"fused-lane-slice kernel: {t_fused:.2f} ms | transpose+flash: {t_ref:.2f} ms | max err {err:.4f}")
