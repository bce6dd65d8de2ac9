"""Collective-inventory tooling (scripts/collective_report.py).

The fast test pins the HLO parser's accounting (op detection, async
-start dedup, tuple-shape handling, loop-body attribution, ring wire
math); the slow test SPMD-compiles the tiny preset's real train step on
the 8-device virtual mesh and checks the inventory contains the
data-parallel gradient all-reduce at ~param-tree size — the evidence
behind PERF.md's multi-chip scaling table.
"""

import numpy as np
import pytest

import scripts.collective_report as cr

_HLO = """
HloModule jit_step

%region_body.1 (a: f32[8]) -> f32[8] {
  %ar = f32[1000]{0} all-reduce(f32[1000]{0} %g), replica_groups={{0,1,2,3}}, to_apply=%add
  ROOT %c = f32[8]{0} copy(%a)
}

ENTRY %main (p0: f32[8]) -> f32[8] {
  %ag = (f32[16,2]{1,0}, f32[16,8]{1,0}) all-gather-start(f32[16,2]{1,0} %w), replica_groups=[2,4]<=[8], dimensions={1}
  %agd = f32[16,8]{1,0} all-gather-done(%ag)
  %rs = f32[250]{0} reduce-scatter(f32[1000]{0} %g2), replica_groups={{0,1,2,3}}
  ROOT %r = f32[8]{0} copy(%p0)
}
"""


def test_parser_ops_bytes_groups_loopbody():
    recs = cr.inventory_from_hlo(_HLO)
    by_op = {r["op"]: r for r in recs}
    assert set(by_op) == {"all-reduce", "all-gather", "reduce-scatter"}
    ar = by_op["all-reduce"]
    assert ar["bytes"] == 4000 and ar["group"] == 4 and ar["in_loop_body"]
    ag = by_op["all-gather"]  # -start: max tuple component, -done skipped
    assert ag["bytes"] == 16 * 8 * 4 and ag["group"] == 4
    assert not ag["in_loop_body"]
    rs = by_op["reduce-scatter"]
    assert rs["bytes"] == 1000  # result (per-shard) shape


_HLO_ASYNC = """
HloModule jit_step

%region_17.2033 (a: f32[8]) -> f32[8] {
  %ar2 = f32[500]{0} all-reduce(f32[500]{0} %g), replica_groups={{0,1},{2,3}}, to_apply=%add
  ROOT %c = f32[8]{0} copy(%a)
}

ENTRY %main (p0: f32[8]) -> f32[8] {
  %rss = (f32[1000]{0}, f32[250]{0}) reduce-scatter-start(f32[1000]{0} %g2), replica_groups={{0,1,2,3}}, dimensions={0}
  %rsd = f32[250]{0} reduce-scatter-done(%rss)
  %arw = f32[100]{0} all-reduce(f32[100]{0} %g3), replica_groups={}, to_apply=%add
  %w = (f32[8]{0}) while((f32[8]{0}) %t), condition=%cond.9, body=%region_17.2033
  ROOT %r = f32[8]{0} copy(%p0)
}
"""


def test_parser_async_start_semantics_and_body_resolution():
    """ADVICE round-4 items: async reduce-scatter-start must charge the
    per-shard RESULT component (not the max = full operand, which
    _ring_factor's (g-1) would blow up ~g-fold); while bodies resolve
    from the while instruction's body= operand even when the computation
    name contains neither 'body' nor 'while'; replica_groups={} means
    one group of all `world` devices, not group 0 (zero wire bytes)."""
    recs = cr.inventory_from_hlo(_HLO_ASYNC, world=4)
    by_op = {r["op"]: r for r in recs}
    rs = by_op["reduce-scatter"]
    assert rs["bytes"] == 250 * 4          # result shard, not the operand
    assert rs["group"] == 4
    ar2 = [r for r in recs if r["op"] == "all-reduce"
           and r["computation"].lstrip("%") == "region_17.2033"]
    assert ar2 and ar2[0]["in_loop_body"]  # resolved via body=%region_17.2033
    arw = [r for r in recs if r["op"] == "all-reduce"
           and not r["in_loop_body"]]
    assert len(arw) == 1 and arw[0]["group"] == 4   # {} -> world
    # summarize: the empty-groups all-reduce now carries real wire bytes
    agg = cr.summarize(arw, accum=1)
    assert agg["all-reduce"]["wire_bytes_per_chip"] == int(400 * 2 * 3 / 4)


def test_summary_ring_math_and_accum_multiplier():
    recs = cr.inventory_from_hlo(_HLO)
    agg = cr.summarize(recs, accum=4)
    # loop-body all-reduce charged 4x; ring wire = 2(g-1)/g * bytes
    assert agg["all-reduce"]["count"] == 4
    assert agg["all-reduce"]["bytes_per_step"] == 16000
    assert agg["all-reduce"]["wire_bytes_per_chip"] == int(16000 * 2 * 3 / 4)
    # reduce-scatter wire = (g-1) * shard bytes
    assert agg["reduce-scatter"]["wire_bytes_per_chip"] == 3000
    # all-gather wire = (g-1)/g * gathered bytes
    assert agg["all-gather"]["wire_bytes_per_chip"] == int(512 * 3 / 4)


@pytest.mark.slow
def test_dp_mesh_inventory_has_gradient_allreduce():
    out = cr.compile_and_inventory("synthetic-tiny", batch=8, accum=1,
                                   data=8, fsdp=1, tensor=1)
    param_bytes = out["n_params"] * 4  # fp32 grads
    ar_bytes = sum(r["bytes"] for r in out["records"]
                   if r["op"] == "all-reduce" and r["group"] == 8)
    # pure DP: the gradient tree is all-reduced once per step (plus small
    # scalar reductions); total all-reduce volume must cover the params
    # without grossly exceeding them
    assert ar_bytes >= param_bytes * 0.9
    assert ar_bytes <= param_bytes * 1.5
