"""NamedSharding rules for params and batches.

Megatron-style tensor parallelism over the ``tensor`` axis, optional FSDP over
``fsdp``, batch over ``data``:

* "column-parallel" kernels (q/k/v projections, fc1/intermediate, GMU gate and
  hidden projections) shard their *output* features on the merged
  ``(fsdp, tensor)`` group — the following contraction is local;
* "row-parallel" kernels (attention out_proj, fc2/output) shard their *input*
  features on ``(fsdp, tensor)`` — XLA inserts the psum at the block
  boundary;
* embeddings shard the vocab axis on ``fsdp``;
* everything 1-D (biases, LayerNorms) replicates.

Both matmul rules place the model-parallel axes on the SAME (Megatron-inner)
dim as a merged group: per-device storage is 1/(fsdp*tensor), like the
earlier split layout (column ``P("fsdp", "tensor")`` / row
``P("tensor", "fsdp")``), but the weight dims never carry ``fsdp`` *alone
opposite* the batch's ``(data, fsdp)`` sharding.  That opposite-dim layout
did not just produce "involuntary full rematerialization" warnings — it
MISCOMPILED on XLA:CPU (jax 0.9.0, GSPMD and Shardy alike): a Dense whose
input and weights were bit-identical to the replicated run returned values
off by O(1) in forward (the row-parallel case), and column-parallel
``P("fsdp", "tensor")`` corrupted backward gradients by ~0.3 at grad
magnitude 0.44.  Caught by
test_distributed.py::test_fsdp_tp_matches_single_device; verified leaf-wise
against host recomputation.  The group is written in mesh-major order
``("fsdp", "tensor")`` deliberately: the reversed order is numerically
identical but canonicalizes to a device permutation XLA cannot reconcile
with the batch sharding, re-introducing a full-remat warning at every
param use inside the grad-accumulation loop.

With ``fsdp=1, tensor=1`` this degrades to pure data parallelism — the exact
TPU equivalent of the reference's ``nn.DataParallel`` (ref: train.py:354-356),
with the gradient all-reduce inserted by XLA over ICI.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels whose OUTPUT features are sharded on the tensor axis
_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "query", "key", "value",
                    "fc1", "intermediate", "x_gate", "x_gates", "hidden1",
                    "hidden2", "hidden3", "hidden4", "hidden5")
# kernels whose INPUT features are sharded on the tensor axis
_ROW_PARALLEL = ("out_proj", "fc2", "attention_output", "output")


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))

    if ndim <= 1:
        return P()
    if last == "embedding":
        return P("fsdp", None)
    if last == "kernel" and ndim == 2:
        if any(key in parent for key in _COLUMN_PARALLEL):
            return P(None, ("fsdp", "tensor"))
        if any(key in parent for key in _ROW_PARALLEL):
            return P(("fsdp", "tensor"), None)
        return P("fsdp", None)
    if last == "kernel" and ndim == 3:
        # scanned stacks carry a leading depth axis: (L, in, out) kernels
        # keep the 2-D column/row rule shifted right by one
        if any(key in parent for key in _COLUMN_PARALLEL):
            return P(None, None, ("fsdp", "tensor"))
        if any(key in parent for key in _ROW_PARALLEL):
            return P(None, ("fsdp", "tensor"), None)
        return P(None, None, "tensor")     # conv (K, Cin, Cout)
    return P(*([None] * ndim))


def _fit_spec_to_mesh(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on axes whose size doesn't divide the mesh axis
    (e.g. the (2, H) token-type embedding can't shard its vocab over
    fsdp=4) — those axes replicate instead."""
    fitted = []
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            fitted.append(None)
            continue
        group = names if isinstance(names, tuple) else (names,)
        size = 1
        for name in group:
            size *= mesh.shape[name]
        fitted.append(names if dim % size == 0 else None)
    return P(*fitted)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings mirroring ``params``."""
    def make(path, leaf):
        spec = _fit_spec_to_mesh(_spec_for(path, leaf), leaf.shape, mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(make, params)


def constrain_like_params(tree: Any) -> Any:
    """Pin a param-shaped pytree (e.g. the grad-accumulation scan carry) to
    the same shardings the params use, resolved against the ambient mesh.

    Without this, XLA derives its own (permutation-inequivalent) sharding
    for the scan-carried gradient accumulators and inserts a full
    rematerialization per scan iteration to reconcile it with the param
    layout.  Identity when no (data, fsdp, tensor) mesh context is active.
    """
    am = _ambient_mesh()
    if am is None:
        return tree

    def pin(path, leaf):
        spec = _fit_spec_to_mesh(_spec_for(path, leaf), leaf.shape, am)
        return jax.lax.with_sharding_constraint(leaf, spec)
    return jax.tree_util.tree_map_with_path(pin, tree)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis over data (and fsdp, which also carries batch)."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = ("data", "fsdp")
    return NamedSharding(mesh, P(*spec))


def batch_shardings(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda _: sh, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(x, spec: P):
    """``with_sharding_constraint`` when a (data, fsdp, tensor) mesh context
    is active (``jax.sharding.set_mesh``); identity otherwise.

    Model code calls this to pin activation/weight-view shardings at fusion
    boundaries so GSPMD propagation doesn't invent conflicting layouts (the
    "involuntary full rematerialization" warnings).  Single-device runs and
    tests without a mesh context trace straight through.  The spec is fitted
    against the mesh the same way :func:`param_shardings` fits params —
    axes whose size doesn't divide the mesh group replicate — so a pinned
    view never forces an illegal partition (e.g. hidden 300 on an 8-way
    fsdp*tensor group replicates instead of erroring).
    """
    am = _ambient_mesh()
    if am is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, _fit_spec_to_mesh(spec, x.shape, am))


def _ambient_mesh():
    """The active (data, fsdp, tensor) abstract mesh, or None.  Single
    guard shared by every pin helper — pins silently disable without it."""
    am = jax.sharding.get_abstract_mesh()
    if not am.axis_names or not {"data", "fsdp", "tensor"} <= set(am.axis_names):
        return None
    return am


def constrain_heads(w, head_axis: int):
    """Pin a head-split weight VIEW's head axis to the column/row-parallel
    ``("fsdp", "tensor")`` group when the group divides the head count —
    then the head-axis sharding tiles exactly like the flat 2-D param
    sharding it aliases (contiguous D-sized blocks).

    When the group divides the flat width E = H*D but NOT H (BERT-base's
    12 heads on an 8-way group), no spec on the (H, D) view can express
    the params' contiguous column blocks, so the view is pinned
    REPLICATED: a defined layout (one small per-layer all-gather of the
    weight) in preference to leaving GSPMD to invent one — unpinned
    weight views are the documented source of both the involuntary-full-
    rematerialization warnings and the XLA:CPU SPMD miscompile recorded
    in this module's header.
    """
    am = _ambient_mesh()
    if am is None:
        return w
    group = am.shape["fsdp"] * am.shape["tensor"]
    spec = [None] * w.ndim
    if group > 1 and w.shape[head_axis] % group == 0:
        spec[head_axis] = ("fsdp", "tensor")
    return jax.lax.with_sharding_constraint(w, P(*spec))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh per the rules."""
    return jax.device_put(params, param_shardings(params, mesh))
