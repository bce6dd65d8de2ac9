"""Multi-device mesh tests on the 8-device virtual CPU backend
(SURVEY.md §4: the fake-backend equivalent for TPU codebases).

Covers: mesh construction, param sharding rules, DP gradient equivalence
(sharded step == single-device step), TP execution, and the driver's
dryrun_multichip path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from bpx.config import MeshConfig
from bpx.parallel.mesh import make_mesh
from bpx.parallel.sharding import _spec_for, param_shardings


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))
    assert mesh.shape == {"data": 8, "fsdp": 1, "tensor": 1}
    mesh2 = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert mesh2.shape == {"data": 2, "fsdp": 2, "tensor": 2}
    with pytest.raises(AssertionError):
        make_mesh(MeshConfig(data=3, fsdp=1, tensor=1))


def test_sharding_rules():
    class FakeKey:
        def __init__(self, key):
            self.key = key
    leaf2 = np.zeros((4, 8))
    assert _spec_for((FakeKey("fc1"), FakeKey("kernel")), leaf2) == \
        P(None, ("fsdp", "tensor"))
    assert _spec_for((FakeKey("out_proj"), FakeKey("kernel")), leaf2) == \
        P(("fsdp", "tensor"), None)
    assert _spec_for((FakeKey("ln0"), FakeKey("scale")), np.zeros((8,))) == P()
    assert _spec_for((FakeKey("word_embeddings"), FakeKey("embedding")),
                     leaf2) == P("fsdp", None)


@pytest.mark.slow
def test_dp_matches_single_device():
    """Data-parallel sharded train step must produce the same params as the
    unsharded step (the DataParallel-parity property, ref: train.py:354-356)."""
    from bpx.config import get_preset
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, place_batch, place_state

    exp = get_preset("synthetic-tiny")
    model = get_model(exp.model)
    mc, dc = exp.model, exp.data
    B = 8
    rng = np.random.RandomState(0)
    L = 16
    batch = {
        "txt": jnp.asarray(rng.randint(1, 100, (1, B, L)), jnp.int32),
        "mask": jnp.ones((1, B, L), jnp.int32),
        "segment": jnp.zeros((1, B, L), jnp.int32),
        "video": jnp.asarray(rng.randn(1, B, dc.video_len, mc.orig_d_v)
                             .astype(np.float32)),
        "audio": jnp.asarray(rng.randn(1, B, dc.audio_raw_len, mc.orig_d_a)
                             .astype(np.float32)),
        "poster": jnp.asarray(rng.randn(1, B, mc.orig_d_p)
                              .astype(np.float32)),
        "target": jnp.asarray((rng.rand(1, B, mc.n_classes) > 0.5)
                              .astype(np.float32)),
    }
    inputs = tuple(batch[k][0] for k in
                   ("txt", "mask", "segment", "video", "audio", "poster"))
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)["params"]
    # SGD: the update is lr*grad, so param equality directly tests the
    # sharded gradient all-reduce (adam's step-1 rsqrt(nu) sign-flips on
    # near-zero grads and cannot be compared elementwise).
    import optax
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-2)
    loss_fn = make_loss_fn("synthetic", "multilabel", False)
    step = make_train_step(model, mc.model, loss_fn, tx, grad_accum=1)

    # single device
    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, jax.random.PRNGKey(7))

    # 8-device DP
    mesh = make_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))
    state8 = place_state(TrainState.create(params, tx), mesh)
    sharded_batch = place_batch(batch, mesh, has_accum_axis=True)
    state8, m8 = jax.jit(step)(state8, sharded_batch, jax.random.PRNGKey(7))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_fsdp_tp_matches_single_device():
    """data=2 x fsdp=2 x tensor=2 sharded train step == single-device step
    (VERDICT r2 weak #3: TP/FSDP correctness beyond 'finite loss')."""
    from bpx.config import get_preset
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, place_batch, place_state

    exp = get_preset("synthetic-tiny")
    model = get_model(exp.model)
    mc, dc = exp.model, exp.data
    B = 8
    rng = np.random.RandomState(1)
    L = 16
    batch = {
        "txt": jnp.asarray(rng.randint(1, 100, (1, B, L)), jnp.int32),
        "mask": jnp.ones((1, B, L), jnp.int32),
        "segment": jnp.zeros((1, B, L), jnp.int32),
        "video": jnp.asarray(rng.randn(1, B, dc.video_len, mc.orig_d_v)
                             .astype(np.float32)),
        "audio": jnp.asarray(rng.randn(1, B, dc.audio_raw_len, mc.orig_d_a)
                             .astype(np.float32)),
        "poster": jnp.asarray(rng.randn(1, B, mc.orig_d_p)
                              .astype(np.float32)),
        "target": jnp.asarray((rng.rand(1, B, mc.n_classes) > 0.5)
                              .astype(np.float32)),
    }
    inputs = tuple(batch[k][0] for k in
                   ("txt", "mask", "segment", "video", "audio", "poster"))
    params = model.init({"params": jax.random.PRNGKey(1)}, *inputs)["params"]
    import optax
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-2)
    loss_fn = make_loss_fn("synthetic", "multilabel", False)
    step = make_train_step(model, mc.model, loss_fn, tx, grad_accum=1)

    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, jax.random.PRNGKey(7))

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    state8 = place_state(TrainState.create(params, tx), mesh)
    sharded_batch = place_batch(batch, mesh, has_accum_axis=True)
    state8, m8 = jax.jit(step)(state8, sharded_batch, jax.random.PRNGKey(7))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


_MULTIHOST_WORKER = r"""
import sys
pid = int(sys.argv[1])
from bpx.parallel.mesh import initialize_distributed, make_mesh
initialize_distributed("localhost:{port}", 2, pid)
import jax, numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from bpx.config import MeshConfig
assert jax.process_count() == 2
mesh = make_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))
assert dict(mesh.shape) == {{"data": 8, "fsdp": 1, "tensor": 1}}
# one DP step of a linear model: grads must be the GLOBAL batch gradient
w = jnp.ones((4,), jnp.float32)
rng = np.random.RandomState(0)
X, y = rng.randn(8, 4).astype(np.float32), rng.randn(8).astype(np.float32)
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(("data", "fsdp"))), X[4 * pid:4 * pid + 4], (8, 4))
ys = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(("data", "fsdp"))), y[4 * pid:4 * pid + 4], (8,))
def loss(w, x, t):
    return jnp.mean((x @ w - t) ** 2)
g = jax.jit(jax.grad(loss),
            out_shardings=NamedSharding(mesh, P()))(w, xs, ys)
want = (2.0 / 8) * X.T @ (X @ np.ones(4) - y)
np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)
print("MULTIHOST_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_multihost_two_process_dp(tmp_path):
    """Real 2-process ``jax.distributed`` bring-up on CPU: hybrid mesh via
    make_mesh (process-granule DCN axis) + a cross-process DP gradient
    (VERDICT r2 weak #6: the multi-host branch was unreachable-untested)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_MULTIHOST_WORKER.format(port=port))
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_spec_fitting_to_mesh():
    """Axes that don't divide the mesh axis replicate instead of erroring
    (e.g. the (2, H) token-type embedding under fsdp=4)."""
    from bpx.parallel.sharding import param_shardings
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    params = {
        "token_type_embeddings": {"embedding": np.zeros((2, 64))},
        "word_embeddings": {"embedding": np.zeros((30528, 64))},
        "fc1": {"kernel": np.zeros((64, 256))},
        "odd": {"kernel": np.zeros((63, 255))},
    }
    sh = param_shardings(params, mesh)
    assert sh["token_type_embeddings"]["embedding"].spec == P(None, None)
    assert sh["word_embeddings"]["embedding"].spec == P("fsdp", None)
    assert sh["fc1"]["kernel"].spec == P(None, ("fsdp", "tensor"))
    assert sh["odd"]["kernel"].spec == P(None, None)


def test_constrain_heads_pin_decision():
    """constrain_heads: head axis pinned to the (fsdp, tensor) group when it
    divides H; pinned REPLICATED (defined layout, not GSPMD's choice) when
    it doesn't.  No-mesh contexts trace straight through."""
    from bpx.parallel.mesh import mesh_scoped
    from bpx.parallel.sharding import constrain_heads

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))   # group = 4

    def shard_of(h):
        w = jnp.zeros((16, 3, h, 8))
        out = mesh_scoped(jax.jit(lambda v: constrain_heads(v, head_axis=2)),
                          mesh)(w)
        return out.sharding.spec

    # (XLA canonicalizes away the trailing None)
    assert shard_of(8) == P(None, None, ("fsdp", "tensor"))
    # 6 % 4 != 0: replicated pin, never a partial/invented layout
    assert shard_of(6) == P()
    # no ambient mesh: identity (single-device paths trace through)
    w = jnp.zeros((16, 3, 8, 8))
    assert constrain_heads(w, head_axis=2) is w


@pytest.mark.slow
def test_bhtd_attention_matches_unsharded_under_mesh():
    """The head-major q/k/v + out-projection pins (fused_projection_bhtd,
    constrain_heads) must not change numerics: the same MultiheadAttention
    forward under an fsdp*tensor mesh context equals the no-mesh run, for
    both a group-divisible (H=8) and a non-divisible (H=6) head count."""
    import os
    from bpx.ops.attention import MultiheadAttention
    from bpx.parallel.mesh import mesh_scoped
    from bpx.parallel.sharding import shard_params

    os.environ["BPX_FORCE_PALLAS"] = "1"
    try:
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        for H in (8, 6):
            E = 48
            m = MultiheadAttention(embed_dim=E, num_heads=H, impl="pallas")
            rng = np.random.RandomState(H)
            x = jnp.asarray(rng.randn(4, 16, E).astype(np.float32))
            p = m.init(jax.random.PRNGKey(0), x)
            want = m.apply(p, x)                      # no mesh context
            placed = shard_params(p, mesh)
            got = mesh_scoped(jax.jit(lambda v, a: m.apply(v, a)),
                              mesh)(placed, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-5)
    finally:
        os.environ.pop("BPX_FORCE_PALLAS", None)


@pytest.mark.slow
def test_stress_mesh_topology_tiny():
    """The dryrun_stress mesh (data=2 x fsdp=4 — the round-5 recommended
    stress mesh, BASELINE.md config 5) on
    the stress preset's model *structure* at tiny dims: one sharded train
    step must match the single-device step numerically, not just produce a
    finite loss (a wrong-but-finite sharding passes a finite-only check —
    see bpx/parallel/sharding.py merged-group rationale).  Keeps the 2.21B
    path's mesh/sharding logic continuously exercised (VERDICT r3 weak #7).
    """
    import dataclasses

    import optax

    from bpx.config import BertConfig, get_preset
    from bpx.models import get_model
    from bpx.train.losses import make_loss_fn
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, place_batch, place_state

    exp = get_preset("stress")
    mc = exp.model.replace(
        hidden_sz=64, num_heads=8, layers=2,
        orig_d_l=64, orig_d_v=48, orig_d_a=96, orig_d_p=40,
        num_vectors_l=16, num_vectors_a=8, num_vectors_v=8,
        bert=BertConfig.tiny(), attention_impl="xla",
        compute_dtype="float32")
    dc = dataclasses.replace(exp.data, max_seq_len=16, audio_raw_len=576,
                             video_len=8)
    model = get_model(mc)

    B = 8
    rng = np.random.RandomState(3)
    L = dc.max_seq_len
    batch = {
        "txt": jnp.asarray(rng.randint(1, 100, (1, B, L)), jnp.int32),
        "mask": jnp.ones((1, B, L), jnp.int32),
        "segment": jnp.zeros((1, B, L), jnp.int32),
        "video": jnp.asarray(rng.randn(1, B, dc.video_len, mc.orig_d_v)
                             .astype(np.float32)),
        "audio": jnp.asarray(rng.randn(1, B, dc.audio_raw_len, mc.orig_d_a)
                             .astype(np.float32)),
        "poster": jnp.asarray(rng.randn(1, B, mc.orig_d_p)
                              .astype(np.float32)),
        "target": jnp.asarray((rng.rand(1, B, mc.n_classes) > 0.5)
                              .astype(np.float32)),
    }
    inputs = tuple(batch[k][0] for k in
                   ("txt", "mask", "segment", "video", "audio", "poster"))
    params = model.init({"params": jax.random.PRNGKey(1)}, *inputs)["params"]
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-2)
    loss_fn = make_loss_fn("moviescope", "multilabel", False)
    step = make_train_step(model, mc.model, loss_fn, tx, grad_accum=1,
                           with_grad_norm=True)

    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, jax.random.PRNGKey(7))

    mesh = make_mesh(MeshConfig(data=-1, fsdp=4, tensor=1))
    assert dict(mesh.shape) == {"data": 2, "fsdp": 4, "tensor": 1}
    state8 = place_state(TrainState.create(params, tx), mesh)
    sharded_batch = place_batch(batch, mesh, has_accum_axis=True)
    state8, m8 = jax.jit(step)(state8, sharded_batch, jax.random.PRNGKey(7))

    assert np.isfinite(float(m8["grad_norm"]))
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_adam_moments_sharded_under_fsdp():
    """place_state must shard the Adam mu/nu like the params, through the
    inject_hyperparams wrapper (InjectHyperparamsState.inner_state is a
    plain tuple of NamedTuples: a whole-tree flatten never matches the
    param treedef, and a non-recursive walk silently replicated the
    moments on every chip — ~2x param bytes wasted per chip under fsdp;
    caught by the round-5 per-chip memory report)."""
    from bpx.config import get_preset
    from bpx.models import get_model
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import place_state

    exp = get_preset("synthetic-tiny")
    model = get_model(exp.model)
    mc, dc = exp.model, exp.data
    rng = np.random.RandomState(0)
    inputs = (
        jnp.asarray(rng.randint(1, 100, (2, 16)), jnp.int32),
        jnp.ones((2, 16), jnp.int32),
        jnp.zeros((2, 16), jnp.int32),
        jnp.asarray(rng.randn(2, dc.video_len, mc.orig_d_v), jnp.float32),
        jnp.asarray(rng.randn(2, dc.audio_raw_len, mc.orig_d_a), jnp.float32),
        jnp.asarray(rng.randn(2, mc.orig_d_p), jnp.float32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)["params"]
    tx = make_optimizer(1e-4, "adam")   # inject_hyperparams(adam)
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    state = place_state(TrainState.create(params, tx), mesh)

    p_specs = jax.tree.map(lambda x: x.sharding.spec, state.params)
    adam = state.opt_state.inner_state[0]      # ScaleByAdamState
    for moments in (adam.mu, adam.nu):
        m_specs = jax.tree.map(lambda x: x.sharding.spec, moments)
        assert m_specs == p_specs
    # and at least one kernel is actually sharded (not vacuously equal)
    assert any(spec != P() for spec in jax.tree.leaves(
        p_specs, is_leaf=lambda s: isinstance(s, P)))
    # scalars in the wrapper stay replicated
    assert state.opt_state.count.sharding.spec == P()
