"""Compiled-HLO collective inventory per mesh shape.

Quantifies the multi-chip scaling story (SURVEY.md §5.8) the same way
``mem_report.py`` quantifies the memory envelope: for a preset and a
(data, fsdp, tensor) mesh, SPMD-compile the FULL train step (grad-accum
scan + adam update, real ``place_state``/``place_batch`` shardings) on a
virtual n-device CPU backend and parse the optimized HLO for
communication ops — all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all — with byte counts.  Compile-only: no
step executes, and the collectives are inserted by the backend-neutral
GSPMD partitioner from the shardings alone, so the inventory is what a
real TPU mesh would run.  (``attention_impl`` is forced to ``xla`` for
CPU compilability; attention is batch-local under DP/FSDP and
head-sharded under TP, so this changes no collective.)

Two compiles per mesh:

* ``accum=1`` — every collective is top-level; the byte totals ARE the
  per-optimizer-step traffic.
* the preset's default accumulation — collectives that land inside the
  grad-accum ``while`` body execute once per micro-batch, i.e. their
  traffic multiplies by A.  The report marks these ``in_loop_body`` so
  the scaling table can charge them correctly.

Per-chip wire-traffic estimates use ring algorithms over the replica
group g: all-reduce 2(g-1)/g x bytes, all-gather / reduce-scatter
(g-1)/g x bytes (the scaling-book accounting).

Usage:
    python scripts/collective_report.py [--preset moviescope] [--batch 64]
        [--mesh 8,1,1] [--mesh 4,2,1] [--grad_accum A] [--json out.json]

Each --mesh is data,fsdp,tensor over data*fsdp*tensor virtual devices.
Self-provisions a CPU child process per mesh (never initializes the axon
plugin in the parent — the round-3 outage lesson, __graft_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
# iota-style v2 groups: replica_groups=[2,4]<=[8] -> group size = dim 1
_GROUPS_V2_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _shape_bytes(shape_txt: str, async_op: str = "") -> int:
    """Bytes of an HLO shape string; tuples sum their components.

    ``async_op`` (the base op name of a ``-start`` instruction) selects
    the tuple component per the op's async-shape semantics — the tuple is
    ``(operand, result, …context)``, which would double-count if summed:
    * ``reduce-scatter``: the per-shard RESULT (the smallest component —
      the operand is the g× larger unscattered input; _ring_factor's
      ``(g-1)`` factor assumes shard bytes, so taking the max would
      overcount wire traffic ~g-fold);
    * ``all-gather``: the gathered RESULT (the largest component);
    * everything else (all-reduce, all-to-all, collective-permute):
      operand == result size, so max is exact.
    """
    sizes = []
    for dtype, dims in _SHAPE_RE.findall(shape_txt):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * _DTYPE_BYTES[dtype])
    if not sizes:
        return 0
    if not async_op:
        return sum(sizes)
    return min(sizes) if async_op == "reduce-scatter" else max(sizes)


_WHILE_BODY_RE = re.compile(r"\bbody=%?([\w.-]+)")


def inventory_from_hlo(hlo: str, world: int = 0):
    """Parse optimized HLO text into a list of collective records.

    ``world`` is the device count; an all-reduce-class collective with
    ``replica_groups={}`` (HLO's "all devices in one group") is charged
    at group = world rather than 0 (which would zero its wire bytes).
    Loop-body attribution resolves the while instructions' ``body=``
    operands (the reliable signal) plus the 'body'/'while' name
    heuristic as a fallback for oddly-ordered HLO text.
    """
    # pass 1: computations named as a while body
    while_bodies = set(_WHILE_BODY_RE.findall(hlo))

    records = []
    computation = ""
    for line in hlo.splitlines():
        stripped = line.strip()
        if stripped == "}":
            computation = ""   # closed: back to top level between defs
            continue
        # computation headers look like: `%name (p: ...) -> ... {` or
        # `ENTRY %name ... {`
        if stripped.endswith("{") and ("(" in stripped) and \
                not stripped.startswith("ROOT") and "=" not in stripped.split("(")[0]:
            computation = stripped.split("(")[0].replace("ENTRY", "").strip()
            continue
        m = re.match(r"(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\([^)]*\)|\S+)\s+([\w-]+)",
                     stripped)
        if not m:
            continue
        shape_txt, op = m.groups()
        if op.endswith("-done"):
            continue  # async pair: bytes counted at -start
        op_base = op[:-len("-start")] if op.endswith("-start") else op
        if op_base not in _COLLECTIVES:
            continue
        gm = _GROUPS_RE.search(stripped)
        if gm:
            group = len(gm.group(1).split(","))
        else:
            gm2 = _GROUPS_V2_RE.search(stripped)
            if gm2:
                group = int(gm2.group(2))
            elif (op_base != "collective-permute" and
                  "replica_groups={}" in stripped):
                group = world      # empty groups = one group of all devices
            else:
                group = world if (op_base != "collective-permute" and
                                  "replica_groups" not in stripped) else 0
        nbytes = _shape_bytes(
            shape_txt, async_op=op_base if op.endswith("-start") else "")
        records.append({
            "op": op_base,
            "bytes": nbytes,
            "group": group,
            "in_loop_body": (computation.lstrip("%") in while_bodies or
                             "body" in computation or "while" in computation),
            "computation": computation,
        })
    return records


def _ring_factor(op: str, g: int) -> float:
    if op == "collective-permute":
        # no replica_groups (source_target_pairs): one hop, full payload
        return 1.0
    if g <= 1:
        return 0.0
    if op == "all-reduce":
        return 2.0 * (g - 1) / g
    if op in ("all-gather", "all-to-all"):
        # parsed bytes = the full (gathered) result shape
        return (g - 1) / g
    if op == "reduce-scatter":
        # parsed bytes = the per-shard RESULT shape; wire = (g-1) shards
        return float(g - 1)
    return 1.0


def summarize(records, accum: int):
    """Aggregate records -> per-op totals, charging loop-body collectives
    once per micro-batch."""
    agg = {}
    for r in records:
        mult = accum if r["in_loop_body"] else 1
        key = r["op"]
        a = agg.setdefault(key, {"count": 0, "bytes_per_step": 0,
                                 "wire_bytes_per_chip": 0.0})
        a["count"] += mult
        a["bytes_per_step"] += r["bytes"] * mult
        a["wire_bytes_per_chip"] += (
            r["bytes"] * mult * _ring_factor(key, r["group"]))
    for a in agg.values():
        a["wire_bytes_per_chip"] = int(a["wire_bytes_per_chip"])
    return agg


_CHILD_CODE = """
import json, sys
sys.path.insert(0, {root!r})
import bench
bench.enable_compilation_cache()  # CPU compiles are minutes on 1 core
import scripts.collective_report as cr
print("BPX_COLLECTIVES " + json.dumps(
    cr.compile_and_inventory({preset!r}, {batch}, {accum}, {data}, {fsdp},
                             {tensor})))
"""


def compile_and_inventory(preset, batch, accum, data, fsdp, tensor):
    """Runs inside the CPU child: compile the step, return records +
    metadata.  Mirrors bench.py's step construction exactly, with
    abstract (ShapeDtypeStruct) inputs so nothing materializes."""
    import jax
    import numpy as np

    import bench
    from bpx.config import MeshConfig
    from bpx.models import get_model
    from bpx.parallel.mesh import make_mesh
    from bpx.parallel.sharding import param_shardings, replicated
    from bpx.train.losses import make_loss_fn
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, model_inputs

    n = data * fsdp * tensor
    mesh = make_mesh(MeshConfig(data=data, fsdp=fsdp, tensor=tensor),
                     devices=jax.devices()[:n])
    exp = bench.bench_config(preset, batch)
    exp = exp.replace(model=exp.model.replace(
        attention_impl="xla", bert_attention_impl="xla"))
    model = get_model(exp.model)

    host = bench._example_batch(exp, batch)
    batch_tree = {k: np.reshape(v, (accum, batch // accum) + v.shape[1:])
                  for k, v in host.items()}
    inputs = model_inputs(exp.model.model,
                          {k: v[0] for k, v in batch_tree.items()})
    a_params = jax.eval_shape(
        lambda *xs: model.init({"params": jax.random.PRNGKey(0)}, *xs),
        *inputs)["params"]
    tx = make_optimizer(1e-4)
    a_state = jax.eval_shape(lambda p: TrainState.create(p, tx), a_params)

    # sharding trees mirroring place_state/place_batch without device_put
    p_sh = param_shardings(a_state.params, mesh)
    rep = replicated(mesh)
    p_leaves, p_treedef = jax.tree_util.tree_flatten(p_sh)

    def opt_sharding(node):
        leaves, treedef = jax.tree_util.tree_flatten(node)
        if treedef == p_treedef:
            return p_sh
        return jax.tree.map(lambda _: rep, node)

    # opt_state: mirror _place_opt_state exactly — recurse into plain
    # tuples AND NamedTuple fields, so e.g. ScaleByAdamState.mu/.nu each
    # match the param treedef and shard (flattening the NamedTuple whole
    # never matches, which silently replicated the Adam moments and
    # inflated per-chip argument bytes ~5x at fsdp=4 — caught round 5)
    def map_opt(node):
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(map_opt(x) for x in node)
        if hasattr(node, "_fields"):
            return node._replace(**{name: map_opt(getattr(node, name))
                                    for name in node._fields})
        return opt_sharding(node)
    state_sh = a_state.replace(step=rep, params=p_sh,
                               opt_state=map_opt(a_state.opt_state))

    def struct(x, s):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    state_in = jax.tree.map(struct, a_state, state_sh)
    # batch shardings mirror place_batch (micro-batch axis 1 over
    # (data, fsdp)) without device_put:
    from jax.sharding import NamedSharding, PartitionSpec as P

    def bsh(v):
        spec = [None] * v.ndim
        spec[1] = ("data", "fsdp")
        return NamedSharding(mesh, P(*spec))
    batch_in = {k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=bsh(v))
                for k, v in batch_tree.items()}
    rng_in = jax.random.key(0, impl="rbg")  # concrete, like bench.py

    loss_fn = make_loss_fn(exp.data.task, exp.data.task_type, False)
    step = jax.jit(make_train_step(model, exp.model.model, loss_fn, tx,
                                   grad_accum=accum), donate_argnums=(0,))
    with jax.sharding.set_mesh(mesh):
        compiled = step.lower(state_in, batch_in, rng_in).compile()
    hlo = compiled.as_text()
    records = inventory_from_hlo(hlo, world=n)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(a_params))
    # XLA's own per-device accounting for the SPMD-partitioned program:
    # under GSPMD the compiled module is the per-chip program, so these
    # argument/temp bytes are per-chip numbers (mem_report --mesh reads
    # them; layouts/fusions are the CPU backend's, so temp bytes are an
    # approximation of TPU HBM — argument bytes are partitioning facts)
    memory = {}
    try:
        m = compiled.memory_analysis()
        for field in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
            val = getattr(m, field, None)
            if val is not None:
                memory[field] = int(val)
    except Exception:
        pass
    return {"records": records, "n_params": n_params,
            "mesh": {"data": data, "fsdp": fsdp, "tensor": tensor},
            "accum": accum, "memory": memory}


def run_child(preset, batch, accum, data, fsdp, tensor, timeout=10800):
    n = data * fsdp * tensor
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n}").strip()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD_CODE.format(root=root, preset=preset, batch=batch,
                              accum=accum, data=data, fsdp=fsdp,
                              tensor=tensor)
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=timeout)
    for line in proc.stdout.splitlines():
        if line.startswith("BPX_COLLECTIVES "):
            return json.loads(line[len("BPX_COLLECTIVES "):])
    raise RuntimeError(f"child rc={proc.returncode}:\n{proc.stderr[-3000:]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="moviescope")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--grad_accum", type=int, default=None)
    p.add_argument("--mesh", action="append", default=None,
                   help="data,fsdp,tensor (repeatable)")
    p.add_argument("--json", default=None, help="also write results here")
    args = p.parse_args()
    meshes = [tuple(int(x) for x in m.split(","))
              for m in (args.mesh or ["8,1,1", "4,2,1", "2,2,2"])]

    import bench
    accum = (args.grad_accum if args.grad_accum is not None
             else bench.default_accum(args.preset, args.batch))

    results = []
    for (data, fsdp, tensor) in meshes:
        # exact per-step bytes from the accum=1 compile ...
        flat = run_child(args.preset, args.batch, 1, data, fsdp, tensor)
        # ... plus loop-body detection from the default-accum compile
        looped = (flat if accum == 1 else
                  run_child(args.preset, args.batch, accum, data, fsdp,
                            tensor))
        gib = 1 << 30
        memory = {k.replace("_size_in_bytes", "_gib"): round(v / gib, 3)
                  for k, v in looped.get("memory", {}).items()}
        if all(k in memory for k in ("argument_gib", "temp_gib",
                                     "alias_gib")):
            memory["peak_estimate_gib"] = round(
                memory["argument_gib"] + memory["temp_gib"]
                - memory["alias_gib"], 3)
        result = {
            "preset": args.preset, "batch": args.batch,
            "mesh": {"data": data, "fsdp": fsdp, "tensor": tensor},
            "n_params": flat["n_params"],
            "per_step": summarize(flat["records"], 1),
            "accum": accum,
            "at_default_accum": summarize(looped["records"], accum),
            "loop_body_collectives": sum(
                1 for r in looped["records"] if r["in_loop_body"]),
            # per-chip memory of the GSPMD-partitioned program (CPU-
            # backend layouts; argument bytes are partitioning facts)
            "memory_per_chip": memory,
            "top": sorted(looped["records"], key=lambda r: -r["bytes"])[:8],
        }
        results.append(result)
        print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
