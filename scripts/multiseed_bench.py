"""A/B: vmapped multi-seed training vs sequential per-seed steps.

bpx.train.multiseed claims "S small models cost far less than S
sequential runs" (the MXU batches the per-seed matmuls).  This measures
it on hardware: one jitted single-seed train step vs the vmapped S-seed
step on the same small config, same measurement protocol as bench.py
(per-step scalar fetch, p50).  The speedup is
``S * t_single / t_vmapped``.

The config is a scaled-down mmtrvat (the seed sweep's real use is
many SMALL runs — at moviescope scale one seed already saturates the
chip and multi-seed would OOM; the docstring's claim is about small
models, so that is what gets measured).

Usage:
    python scripts/multiseed_bench.py [--seeds 5] [--steps 10]
        [--batch 16] [--hidden 128]
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
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--chain", type=int, default=10,
                   help="steps per host round-trip for the device-time "
                        "row (the ~29 ms tunnel round-trip would "
                        "otherwise dominate these small steps)")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--seq", type=int, default=128)
    args = p.parse_args()

    import bench
    bench.enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from bpx.config import BertConfig, get_preset
    from bpx.data.synthetic import example_batch
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.multiseed import (init_multi_seed,
                                     make_multi_seed_train_step)
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, model_inputs

    E = args.hidden
    exp = get_preset("synthetic-tiny")
    exp = exp.replace(
        model=exp.model.replace(
            model="mmtrvat", hidden_sz=E, num_heads=4, layers=args.layers,
            orig_d_l=E, orig_d_v=48, orig_d_a=96,
            # mmtrvat uses identity length adapters: all three stream
            # lengths must match (ref mmtr.py:664-670).
            num_vectors_l=args.seq, num_vectors_a=args.seq,
            num_vectors_v=args.seq, use_poster=False,
            use_audio_encoder=False, attention_impl="xla",
            bert=dataclasses.replace(BertConfig.tiny(), hidden_size=E,
                                     num_heads=4, intermediate_size=4 * E),
            compute_dtype="bfloat16"),
        data=dataclasses.replace(
            exp.data, batch_sz=args.batch, max_seq_len=args.seq,
            audio_raw_len=args.seq, video_len=args.seq))
    mc = exp.model

    model = get_model(mc)
    host = example_batch(exp, args.batch)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    inputs = model_inputs(mc.model, batch)
    loss_fn = make_loss_fn(exp.data.task, exp.data.task_type, False)
    tx = make_optimizer(1e-4)

    def timed(fn, fetch, n):
        for _ in range(args.warmup):
            fetch(fn())
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fetch(fn())
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    def timed_chained(fn, fetch, n):
        """Per-step device time: args.chain steps per host round-trip.

        At ~30-50 ms steps the per-step-sync protocol is dominated by the
        measured ~29 ms tunnel round-trip (PERF.md "Measurement
        integrity"); chaining k dispatches and fetching one scalar
        exposes what a real seed sweep (which syncs per epoch, not per
        step) would pay.
        """
        for _ in range(args.warmup):
            fetch(fn())
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn()
            fetch(out)
            times.append((time.perf_counter() - t0) / args.chain)
        return sorted(times)[len(times) // 2]

    # --- single seed ------------------------------------------------------
    params = model.init({"params": jax.random.PRNGKey(1)}, *inputs)["params"]
    state = TrainState.create(params, tx)
    sbatch = {k: v[None] for k, v in batch.items()}   # (A=1, B, ...)
    step1 = jax.jit(make_train_step(model, mc.model, loss_fn, tx),
                    donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")
    holder = {"s": state}

    def run_single():
        holder["s"], m = step1(holder["s"], sbatch, rng)
        return m["loss"]

    t_single = timed(run_single, lambda x: float(x), args.steps)
    t_single_dev = timed_chained(run_single, lambda x: float(x), args.steps)

    # --- vmapped S seeds ---------------------------------------------------
    seeds = list(range(1, args.seeds + 1))
    mstate = init_multi_seed(model, mc.model, batch, tx, seeds)
    mstep = jax.jit(make_multi_seed_train_step(model, mc.model, loss_fn, tx),
                    donate_argnums=(0,))
    rngs = jax.random.split(jax.random.key(7, impl="rbg"), args.seeds)
    mholder = {"s": mstate}

    def run_multi():
        mholder["s"], m = mstep(mholder["s"], batch, rngs)
        return m["loss"]

    t_multi = timed(run_multi, lambda x: float(x[0]), args.steps)
    t_multi_dev = timed_chained(run_multi, lambda x: float(x[0]), args.steps)

    print(json.dumps({
        "metric": "multiseed_speedup", "seeds": args.seeds,
        "hidden": E, "layers": args.layers, "batch": args.batch,
        "seq": args.seq, "chain": args.chain,
        "t_single_ms": round(t_single * 1000, 2),
        "t_vmapped_ms": round(t_multi * 1000, 2),
        "sequential_cost_ms": round(args.seeds * t_single * 1000, 2),
        "speedup": round(args.seeds * t_single / t_multi, 2),
        "t_single_dev_ms": round(t_single_dev * 1000, 2),
        "t_vmapped_dev_ms": round(t_multi_dev * 1000, 2),
        "speedup_dev": round(args.seeds * t_single_dev / t_multi_dev, 2)}))


if __name__ == "__main__":
    main()
