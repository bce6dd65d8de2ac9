"""Compiled-memory report: XLA's own accounting for the jitted train step.

Prints one JSON line with the compiler's memory analysis (argument /
output / temp / generated-code bytes) for a preset's train step at the
bench shapes — the numbers behind PERF.md's memory-envelope claims
(micro-batch <= 8 runs remat-free in 15.75 G HBM, etc.).  Compile-only:
no steps execute, so it is safe to run while the chip is busy, and with
the persistent compilation cache a previously-benched config costs
seconds.

Usage:
    python scripts/mem_report.py [--preset moviescope] [--batch 64]
        [--grad_accum A] [--remat 0/1] [--remat_bert 0/1]
        [--mesh data,fsdp,tensor]

With ``--mesh`` the step is SPMD-compiled on a virtual CPU mesh (a
child process, like collective_report) and the report is the PER-CHIP
memory analysis of the GSPMD-partitioned program — the evidence for
"the stress config fits N chips".  Caveat printed in the record:
argument bytes (params + optimizer state + batch shard per chip) are
partitioning facts; temp bytes come from the CPU backend's layouts and
approximate TPU HBM temps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="moviescope")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--grad_accum", type=int, default=None)
    p.add_argument("--remat", type=int, default=None)
    p.add_argument("--remat_bert", type=int, default=None)
    p.add_argument("--mesh", default=None,
                   help="data,fsdp,tensor — SPMD-compile on a virtual "
                        "CPU mesh and report PER-CHIP memory")
    args = p.parse_args()

    import bench

    if args.mesh:
        import scripts.collective_report as cr
        data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
        accum = (args.grad_accum if args.grad_accum is not None
                 else bench.default_accum(args.preset, args.batch))
        out = cr.run_child(args.preset, args.batch, accum, data, fsdp,
                           tensor, timeout=7200)
        gib = 1 << 30
        rec = {"preset": args.preset, "batch": args.batch,
               "grad_accum": accum, "per_chip": True,
               "mesh": out["mesh"], "n_params": out["n_params"],
               "note": ("GSPMD per-chip program on the virtual CPU mesh: "
                        "argument bytes are partitioning facts; temp "
                        "bytes are CPU-backend approximations of TPU "
                        "HBM temps")}
        for field, val in out.get("memory", {}).items():
            rec[field.replace("_size_in_bytes", "_gib")] = round(val / gib,
                                                                 3)
        if all(k in rec for k in ("argument_gib", "temp_gib", "alias_gib")):
            rec["peak_estimate_gib"] = round(
                rec["argument_gib"] + rec["temp_gib"] - rec["alias_gib"], 3)
        print(json.dumps(rec))
        return
    if args.grad_accum is None:
        args.grad_accum = bench.default_accum(args.preset, args.batch)
    exp = bench.bench_config(args.preset, args.batch)
    over = {}
    for key in ("remat", "remat_bert"):
        if getattr(args, key) is not None:
            over[key] = bool(getattr(args, key))
    if over:
        exp = exp.replace(model=exp.model.replace(**over))

    import jax
    import jax.numpy as jnp

    bench.enable_compilation_cache()
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, model_inputs

    model = get_model(exp.model)
    host = bench._example_batch(exp, args.batch)
    A = args.grad_accum
    batch = {k: jnp.asarray(v.reshape((A, args.batch // A) + v.shape[1:]))
             for k, v in host.items()}
    inputs = model_inputs(exp.model.model,
                          {k: v[0] for k, v in batch.items()})
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)["params"]
    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)
    loss_fn = make_loss_fn(exp.data.task, exp.data.task_type, False)
    step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                   grad_accum=A), donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")

    compiled = step.lower(state, batch, rng).compile()
    m = compiled.memory_analysis()
    gib = 1 << 30
    out = {"preset": args.preset, "batch": args.batch, "grad_accum": A,
           "overrides": over}
    for field in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
        val = getattr(m, field, None)
        if val is not None:
            out[field.replace("_size_in_bytes", "_gib")] = round(val / gib, 3)
    # peak live = args + temps (aliased/donated buffers counted once)
    if all(k in out for k in ("argument_gib", "temp_gib", "alias_gib")):
        out["peak_estimate_gib"] = round(
            out["argument_gib"] + out["temp_gib"] - out["alias_gib"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
