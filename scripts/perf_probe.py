"""Perf probe: p50 train-step latency for arbitrary ModelConfig overrides.

A/B harness behind bench.py — same measurement protocol (per-step host
sync, median), plus optional jax.profiler trace capture.  Usage:

  python scripts/perf_probe.py --attention_impl pallas \
      --bert_attention_impl xla --steps 8
  python scripts/perf_probe.py --profile_dir /tmp/trace --steps 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="moviescope",
                   help="any BASELINE.md config preset")
    p.add_argument("--attention_impl", default=None)
    p.add_argument("--bert_attention_impl", default=None)
    p.add_argument("--remat", type=int, default=None)
    p.add_argument("--remat_bert", type=int, default=None)
    p.add_argument("--group_encoders", type=int, default=None)
    p.add_argument("--scan_encoders", type=int, default=None)
    p.add_argument("--scan_layers", type=int, default=None)
    p.add_argument("--scan_unroll", type=int, default=None)
    p.add_argument("--remat_policy", default=None)
    p.add_argument("--remat_policy_bert", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--grad_accum", type=int, default=None,
                   help="split the global batch into A sequential "
                        "micro-batches inside the step (same update "
                        "semantics; 1/A the activation memory). Default: "
                        "bench.default_accum — the preset's memory envelope")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--cast", type=int, default=0,
                   help="feed float feature streams in compute dtype "
                        "(measured +12% step time -- default off)")
    p.add_argument("--infer", action="store_true",
                   help="forward-only deterministic latency (serving "
                        "shape) instead of the train step")
    p.add_argument("--accum_dtype", default=None, choices=["bfloat16"],
                   help="gradient-accumulation carry dtype (opt-in bf16 "
                        "carry: ~17 ms/step HBM bound at accum 8)")
    p.add_argument("--chain", type=int, default=0,
                   help="run k optimizer steps per dispatch (lax.scan) so "
                        "the tunnel round-trip amortizes to 29/k ms — the "
                        "pipelined-execution throughput; 0 = per-step sync. "
                        "With --infer: k forwards per dispatch, each "
                        "data-dependent on the previous (true device "
                        "latency, tunnel round-trip amortized)")
    p.add_argument("--accum_scan_unroll", type=int, default=1,
                   help="lax.scan unroll factor for the accumulation "
                        "loop (sequential carry kept)")
    p.add_argument("--accum_unroll", type=int, default=None,
                   help="python-unroll the gradient-accumulation loop "
                        "instead of lax.scan (probes the accum-scan's "
                        "~129 ms of inter-trip gaps; see steps.py)")
    args = p.parse_args()

    import bench
    if args.infer and (args.grad_accum or 1) != 1:
        # accum>1 would time a micro-batch forward while reporting
        # full-batch throughput (~A x inflated)
        p.error("--infer times the full-batch forward; --grad_accum "
                "does not apply (it would measure a micro-batch)")
    if args.grad_accum is None:
        # inference never accumulates: the serving forward runs the full
        # batch in one dispatch
        args.grad_accum = (1 if args.infer
                           else bench.default_accum(args.preset, args.batch))
    exp = bench.bench_config(args.preset, args.batch)
    over = {}
    for key in ("attention_impl", "bert_attention_impl"):
        if getattr(args, key) is not None:
            over[key] = getattr(args, key)
    for key in ("remat", "remat_bert", "group_encoders", "scan_encoders",
                "scan_layers"):
        if getattr(args, key) is not None:
            over[key] = bool(getattr(args, key))
    if args.scan_unroll is not None:
        over["scan_unroll"] = args.scan_unroll
    for key in ("remat_policy", "remat_policy_bert"):
        val = getattr(args, key)
        if val is not None:
            # "none" selects full recompute (config value None)
            over[key] = None if val == "none" else val
    if over:
        exp = exp.replace(model=exp.model.replace(**over))
    sys.stderr.write(f"overrides: {over}\n")

    import jax
    import jax.numpy as jnp

    bench.enable_compilation_cache()
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, model_inputs

    from bpx.train.steps import cast_features
    model = get_model(exp.model)
    host = bench._example_batch(exp, args.batch)
    A = args.grad_accum
    assert args.batch % A == 0
    batch = {k: jnp.asarray(v.reshape((A, args.batch // A) + v.shape[1:]))
             for k, v in host.items()}
    if args.cast:
        batch = cast_features(batch, jnp.dtype(exp.model.compute_dtype))
    inputs = model_inputs(exp.model.model,
                          {k: v[0] for k, v in batch.items()})
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)["params"]

    if args.infer:
        if args.chain:
            # k forwards per dispatch so the tunnel's fixed ~29 ms
            # round-trip amortizes to 29/k ms — the true device serving
            # latency.  Each iteration perturbs the first float input by
            # probe*1e-12 of the previous iteration's output scalar, so
            # the chain is data-dependent end-to-end: XLA cannot hoist
            # the loop-invariant forward out of the scan or CSE the k
            # copies, and fetching the last probe forces the whole chain.
            # The 1e-12 perturbation is ~6 orders below fp32 ulp at
            # feature scale — timing-identical, numerics-irrelevant.
            k = args.chain

            def chained(p, *xs):
                flt = next(j for j, x in enumerate(xs)
                           if jnp.issubdtype(x.dtype, jnp.floating))

                def body(carry, _):
                    xs2 = list(xs)
                    xs2[flt] = xs2[flt] + carry.astype(xs2[flt].dtype) * 1e-12
                    out = model.apply({"params": p}, *xs2,
                                      deterministic=True)
                    probe = jax.tree.leaves(out)[0].reshape(-1)[0]
                    return probe.astype(jnp.float32), None

                last, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                       None, length=k)
                return last

            fwd_c = jax.jit(chained)
            t_c = time.perf_counter()
            for _ in range(args.warmup):
                float(fwd_c(params, *inputs))
            sys.stderr.write(
                f"compile+warmup: {time.perf_counter()-t_c:.0f}s\n")
            times = []
            for _ in range(args.steps):
                t0 = time.perf_counter()
                float(fwd_c(params, *inputs))
                times.append((time.perf_counter() - t0) / k)
            p50 = sorted(times)[len(times) // 2]
            print(json.dumps({"p50_ms": round(p50 * 1000, 2),
                              "samples_per_sec": round(args.batch / p50, 2),
                              "mode": "infer", "chain": k,
                              "overrides": over}))
            return
        fwd = jax.jit(lambda p, *xs: model.apply({"params": p}, *xs))
        t_c = time.perf_counter()
        for _ in range(args.warmup):
            jax.block_until_ready(fwd(params, *inputs))
        sys.stderr.write(f"compile+warmup: {time.perf_counter()-t_c:.0f}s\n")
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            out = fwd(params, *inputs)
            # fetch a scalar from the first output leaf: the axon
            # tunnel's async dispatch makes block_until_ready alone
            # unreliable (PERF.md); tree.leaves covers tuple/dict heads
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        print(json.dumps({"p50_ms": round(p50 * 1000, 1),
                          "samples_per_sec": round(args.batch / p50, 2),
                          "mode": "infer", "overrides": over}))
        return

    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)
    loss_fn = make_loss_fn(exp.data.task, exp.data.task_type, False)
    if args.accum_unroll is not None:
        over["accum_unroll"] = bool(args.accum_unroll)
    if args.accum_scan_unroll != 1:
        over["accum_scan_unroll"] = args.accum_scan_unroll
    inner = make_train_step(model, exp.model.model, loss_fn, tx,
                            grad_accum=A, accum_dtype=args.accum_dtype,
                            accum_unroll=bool(args.accum_unroll),
                            accum_scan_unroll=args.accum_scan_unroll)
    if args.chain:
        step = jax.jit(bench.make_chained_step(inner, args.chain),
                       donate_argnums=(0,))
    else:
        step = jax.jit(inner, donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")

    def run_once():
        nonlocal state
        if args.chain:
            state, loss = step(state, batch, rng)
            float(loss)
        else:
            state, metrics = step(state, batch, rng)
            float(metrics["loss"])

    t_c = time.perf_counter()
    for _ in range(args.warmup):
        run_once()
    sys.stderr.write(f"compile+warmup: {time.perf_counter()-t_c:.0f}s\n")

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        run_once()
        times.append((time.perf_counter() - t0) / max(args.chain, 1))

    if args.profile_dir:
        jax.profiler.stop_trace()

    p50 = sorted(times)[len(times) // 2]
    out = {"p50_ms": round(p50 * 1000, 1),
           "samples_per_sec": round(args.batch / p50, 2),
           "overrides": over}
    if args.chain:
        out["chain"] = args.chain
    print(json.dumps(out))


if __name__ == "__main__":
    main()
