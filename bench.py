"""Headline benchmark: Moviescope 4-modal train-step throughput on TPU.

Prints ONE JSON line:
  {"metric": "samples_per_sec_per_chip", "value": N, "unit": "samples/s",
   "vs_baseline": R}

``vs_baseline`` is the ratio against the PyTorch-CPU reference throughput
(BASELINE.md north star: >=5x).  The torch baseline is measured once on this
host with a FLOP-equivalent torch model at the same config (BERT-base text
encoder + the 12 crossmodal/biprojection encoder stacks + GMU fusion) and
cached in ``baseline_torch_cpu.json``; pass --remeasure-baseline to redo it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baseline_torch_cpu.json")

# Bench config: Moviescope 4-modal (BASELINE.md config 4) at global batch 64.
BATCH = 64
BENCH_STEPS = 30
WARMUP_STEPS = 3


def default_accum(preset: str, batch: int) -> int:
    """Accumulation factor that keeps the preset inside its memory envelope.

    The moviescope preset runs remat-free (config.py), which is only
    HBM-feasible at micro-batch <= 8 (no-remat at micro-batch 16 OOMs by
    1.09 G — PERF.md round 3), so its accumulation scales with the batch:
    the smallest divisor of ``batch`` with micro-batch <= 8 (batch 64 ->
    accum 8, 28 -> 4, 12 -> 2; a prime batch > 8 degrades to per-sample
    micro-batches rather than exceeding the envelope).
    mmimdb: b64/accum2 beats b32/accum1 (49.6 vs 48.0 samples/s, PERF.md).
    """
    if preset == "moviescope" and batch > 8:
        a = -(-batch // 8)                   # ceil(batch / 8)
        while batch % a:
            a += 1
        return a
    if preset == "mmimdb" and batch >= 64 and batch % 2 == 0:
        return 2
    return 1


def bench_config(preset: str = "moviescope", batch: int = None):
    from bpx.config import get_preset
    import dataclasses
    exp = get_preset(preset)
    if batch is None:
        batch = BATCH     # module global, overridable by perf_probe
    return exp.replace(data=dataclasses.replace(exp.data, batch_sz=batch))


def _example_batch(exp, batch):
    """Synthetic batch shaped for the preset's model/task (any of the
    BASELINE.md configs, not just moviescope)."""
    from bpx.data.synthetic import example_batch
    return example_batch(exp, batch)


def make_chained_step(train_step, k: int):
    """Wrap an (unjitted) train step in a ``lax.scan`` over ``k`` optimizer
    steps, so one dispatch (and one host round-trip) covers k real steps.

    Rationale: the per-step protocol below charges every step the axon
    tunnel's fixed ~29 ms round-trip, which production training does not
    pay (it dispatches ahead and syncs rarely).  The chained form
    amortizes the round-trip to 29/k ms and cannot be faked by async
    dispatch: the returned scalar is the k-th step's loss plus a 0-weight
    term read from the *final* params, so its value depends on all k
    losses and the last optimizer update — fetching it forces real
    execution of the whole chain.  Per-iteration dropout keys stay
    distinct because the train step folds ``state.step`` into the rng.

    The chained program is semantically k sequential steps but not
    bitwise so: XLA fuses the scan body differently from the standalone
    step, so per-step rounding differs at the ~1e-7 level
    (tests/test_train.py::test_chained_step_matches_sequential pins the
    semantics with SGD, where the difference stays at rounding scale).
    """
    import jax
    import jax.numpy as jnp

    def chained(state, batch, rng):
        def body(st, _):
            st, metrics = train_step(st, batch, rng)
            return st, metrics["loss"]
        state, losses = jax.lax.scan(body, state, None, length=k)
        probe = jax.tree.leaves(state.params)[0].reshape(-1)[0]
        return state, losses[-1] + 0.0 * probe.astype(jnp.float32)

    return chained


def enable_compilation_cache():
    """Persistent compiled-executable cache: a probe re-run at an already
    compiled config skips the 10-15 min tunnel compile entirely (the
    're-measure suspicious results' protocol in PERF.md becomes cheap).
    Keyed on the full HLO + compile options, so any knob that changes the
    program misses — correctness is never at stake.  Silent no-op if the
    PJRT plugin can't serialize executables.  Opt-out: BPX_JAX_CACHE=0.
    """
    import jax

    from bpx.utils.env import env_flag
    if not env_flag("BPX_JAX_CACHE", True):
        return
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("BPX_JAX_CACHE_DIR", "/tmp/bpx_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:   # cache is an optimisation, never a failure
        sys.stderr.write(f"compilation cache unavailable: {e}\n")


def measure_tpu(exp, batch_size: int, steps: int = BENCH_STEPS,
                accum: int = 1, chain: int = 0, progress=None):
    import jax
    import jax.numpy as jnp
    from bpx.models import get_model

    enable_compilation_cache()
    from bpx.train.losses import make_loss_fn
    from bpx.train.optim import make_optimizer
    from bpx.train.state import TrainState
    from bpx.train.steps import make_train_step, model_inputs

    model = get_model(exp.model)
    host = _example_batch(exp, batch_size)
    # (A, micro, ...) super-batch: same global batch + update math, 1/A the
    # live activations (what lets the Pallas LayerNorm buffers fit at
    # batch 64 alongside the save_attn residuals — see PERF.md round 3)
    assert batch_size % accum == 0
    batch = {k: jnp.asarray(v.reshape((accum, batch_size // accum)
                                      + v.shape[1:]))
             for k, v in host.items()}
    inputs = model_inputs(exp.model.model,
                          {k: v[0] for k, v in batch.items()})
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)["params"]
    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)
    loss_fn = make_loss_fn(exp.data.task, exp.data.task_type, False)
    inner = make_train_step(model, exp.model.model, loss_fn, tx,
                            grad_accum=accum,
                            accum_unroll=exp.train.accum_unroll,
                            accum_scan_unroll=exp.train.accum_scan_unroll)
    if chain:
        step = jax.jit(make_chained_step(inner, chain), donate_argnums=(0,))
    else:
        step = jax.jit(inner, donate_argnums=(0,))
    # rbg: the TPU hardware PRNG for dropout masks (threefry measured ~20%
    # of the step on this model).
    rng = jax.random.key(0, impl="rbg")

    def run_once():
        nonlocal state
        if chain:
            state, loss = step(state, batch, rng)
            float(loss)
        else:
            state, metrics = step(state, batch, rng)
            float(metrics["loss"])

    # Per-step host sync: the axon tunnel's async dispatch makes
    # block-once-at-the-end measurements unreliable (observed reporting
    # far below the compute floor), so fetch the loss every step.  With
    # --chain k, each timed call is one dispatch covering k real steps
    # (see make_chained_step) and times are reported per step.
    progress = progress or (lambda rec: None)
    progress({"ev": "compile_start"})
    for i in range(WARMUP_STEPS):
        run_once()
        progress({"ev": "warmup_done"} if i == WARMUP_STEPS - 1
                 else {"ev": f"warmup_{i}"})

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        times.append(dt / max(chain, 1))
        progress({"t": dt})
    ms = sorted(t * 1000 for t in times)
    stats = {"p50_ms": round(ms[len(ms) // 2], 1),
             "p90_ms": round(ms[min(len(ms) - 1, int(len(ms) * 0.9))], 1),
             "min_ms": round(ms[0], 1),
             "steps": len(ms)}
    if chain:
        stats["chain"] = chain
    # full distribution to stderr so relay-congestion outliers are visible
    sys.stderr.write("step times (ms): " +
                     " ".join(f"{t*1000:.1f}" for t in times) + "\n")
    sys.stderr.write(f"p50 {stats['p50_ms']} ms | p90 {stats['p90_ms']} ms "
                     f"| min {stats['min_ms']} ms over {stats['steps']} steps\n")
    return batch_size / (stats["p50_ms"] / 1000.0), stats


def measure_torch_cpu_baseline(exp, batch: int = 2, steps: int = 2) -> float:
    """FLOP-equivalent torch-CPU reference throughput (fwd+bwd+adam).

    Parameterized by the preset's model shape (BASELINE.md north star is
    per-chip >=5x *per config*): modality count (``use_poster``),
    second-round type (mmtrvapt biprojection = extra self-attn sublayer,
    mmtrvat = plain), audio front-end (conv encoder vs feature projection),
    and the BERT->hidden projection when ``hidden_sz != bert.hidden_size``
    (the mmtrvat configs run hidden 300 under a 768-wide BERT).
    """
    import torch
    import torch.nn as nn

    mc, dc = exp.model, exp.data
    E, H, LYR = mc.hidden_sz, mc.num_heads, mc.layers
    quad = bool(mc.use_poster)                 # 4-modal (v, a, p, text)
    second_extra = mc.model == "mmtrvapt"      # biprojection second round

    class Enc(nn.Module):
        """One crossmodal encoder stack: per layer MHA + 4x FFN, pre-LN —
        the reference encoder's cost shape (transformer.py:102-202)."""

        def __init__(self, extra_attn=False):
            super().__init__()
            self.layers = nn.ModuleList()
            self.extra = extra_attn
            for _ in range(LYR):
                self.layers.append(nn.ModuleDict({
                    "attn": nn.MultiheadAttention(E, H, batch_first=True),
                    "ln0": nn.LayerNorm(E), "ln1": nn.LayerNorm(E),
                    "fc1": nn.Linear(E, 4 * E), "fc2": nn.Linear(4 * E, E),
                }))

        def forward(self, x, kv=None):
            kv = x if kv is None else kv
            for l in self.layers:
                h = l["ln0"](x)
                if self.extra:   # biprojection: extra self-attn sublayer
                    s, _ = l["attn"](h, h, h, need_weights=False)
                    x = x + s
                    h = x
                a, _ = l["attn"](h, l["ln0"](kv), l["ln0"](kv),
                                 need_weights=False)
                x = x + a
                x = x + l["fc2"](torch.relu(l["fc1"](l["ln1"](x))))
            return x

    class Baseline(nn.Module):
        def __init__(self):
            super().__init__()
            bcfg = mc.bert
            bert_layer = nn.TransformerEncoderLayer(
                bcfg.hidden_size, bcfg.num_heads, bcfg.intermediate_size,
                batch_first=True, activation="gelu")
            self.embed = nn.Embedding(bcfg.vocab_size, bcfg.hidden_size)
            self.bert = nn.TransformerEncoder(bert_layer, bcfg.num_layers)
            self.proj_l = (nn.Linear(bcfg.hidden_size, E, bias=False)
                           if bcfg.hidden_size != E else None)
            self.audio = nn.Sequential(
                nn.Conv1d(mc.orig_d_a, mc.orig_d_a, 128, stride=2),
                nn.Conv1d(mc.orig_d_a, mc.orig_d_a, 128, stride=2),
                nn.AdaptiveAvgPool1d(mc.num_vectors_a)) \
                if mc.use_audio_encoder else None
            self.proj_v = nn.Linear(mc.orig_d_v, E, bias=False)
            self.proj_a = nn.Linear(mc.orig_d_a, E, bias=False)
            self.proj_p = (nn.Linear(mc.orig_d_p, E, bias=False)
                           if quad else None)
            self.first = nn.ModuleList([Enc() for _ in range(6)])
            self.second = nn.ModuleList([Enc(extra_attn=second_extra)
                                         for _ in range(6)])
            self.gmus = nn.ModuleList([
                nn.Linear(2 * E, 3 * E, bias=False) for _ in range(6)])
            n_fused = 4 if quad else 3
            self.final_gmu = nn.Linear(n_fused * E, 2 * n_fused * E,
                                       bias=False)
            self.head = nn.Sequential(nn.Linear(E, E), nn.ReLU(),
                                      nn.Linear(E, E))
            self.out = nn.Linear(E, mc.n_classes)

        def forward(self, txt, video, audio, poster=None):
            l = self.bert(self.embed(txt))
            if self.proj_l is not None:
                l = self.proj_l(l)
            v = self.proj_v(video)
            if self.audio is not None:
                audio = self.audio(audio.transpose(1, 2)).transpose(1, 2)
            a = self.proj_a(audio)
            pad = lambda x, n: torch.nn.functional.pad(
                x, (0, 0, 0, n - x.shape[1]))
            l = pad(l, mc.num_vectors_l)
            v = pad(v, mc.num_vectors_v)
            a = pad(a, mc.num_vectors_a)
            firsts = [self.first[0](v, a), self.first[1](a, v),
                      self.first[2](v, l), self.first[3](l, v),
                      self.first[4](a, l), self.first[5](l, a)]
            seconds = [self.second[i % 6](x, firsts[i % 6])
                       for i, x in enumerate([l, l, a, a, v, v])]
            outs = []
            for i, s in enumerate(seconds[:6:2]):
                g = self.gmus[i](torch.cat([s, seconds[2 * i + 1]], -1))
                outs.append(g[..., :E][:, 0] + g[..., :E][:, -1])
            if self.proj_p is not None:
                outs.append(self.proj_p(poster))
            fused = self.final_gmu(torch.cat(outs, -1))[:, :E]
            return self.out(self.head(fused) + fused)

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = Baseline()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = nn.BCEWithLogitsLoss()
    b = _example_batch(exp, batch)
    txt = torch.tensor(b["txt"][:, :mc.num_vectors_l].astype(np.int64))
    video = torch.tensor(b["video"])
    audio = torch.tensor(b["audio"])
    poster = torch.tensor(b["poster"]) if quad else None
    tgt = torch.tensor(b["target"].astype(np.float32))
    if tgt.ndim == 1:                       # regression task (cmu-mosi)
        tgt = tgt[:, None].expand(-1, mc.n_classes)
        crit = nn.L1Loss()

    # warmup
    loss = crit(model(txt, video, audio, poster), tgt)
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(steps):
        loss = crit(model(txt, video, audio, poster), tgt)
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def get_baseline(exp, preset: str, remeasure: bool = False) -> float:
    """Per-preset cached torch-CPU baseline (samples/s)."""
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if "samples_per_sec" in cache:   # migrate the round<=3 single-entry
            cache = {"moviescope": {k: v for k, v in cache.items()}}
    if not remeasure and preset in cache:
        return cache[preset]["samples_per_sec"]
    sys.stderr.write(f"measuring torch-CPU baseline ({preset})...\n")
    val = measure_torch_cpu_baseline(exp)
    cache[preset] = {"samples_per_sec": val,
                     "config": f"{preset}-flop-equivalent",
                     "host_cpus": os.cpu_count()}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    return val


def wait_for_device(deadline_s: float) -> bool:
    """Block until the accelerator answers a tiny op, or the deadline passes.

    The axon TPU tunnel has multi-hour relay outages (observed rounds 3-4);
    without this guard a bench launched mid-outage hangs in dispatch and
    records nothing.  The probe runs in a subprocess because the plugin
    registration itself can hang at interpreter startup — an in-process
    probe could block forever with no way to time it out.
    """
    import subprocess
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); (x @ x).block_until_ready()")
    t0 = time.monotonic()
    while True:
        try:
            if subprocess.run([sys.executable, "-c", probe], timeout=90,
                              capture_output=True).returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() - t0 > deadline_s:
            sys.stderr.write("device probe still failing at deadline\n")
            return False
        sys.stderr.write("device probe failed; retrying in 30 s...\n")
        time.sleep(30)


# --- outage-proof orchestration ------------------------------------------
#
# Round 3's driver artifact was rc=124 / parsed:null: the bench sat in the
# probe loop until the driver's timeout SIGKILLed it with no JSON on stdout.
# The contract now is *a structured JSON line exists on stdout no matter
# what*:
#   - device unreachable at deadline  -> {"value": null, "error":
#     "device_unreachable", ...}
#   - compile/step hang past budget   -> partial stats from the steps that
#     DID complete ({"partial": true, "error": "measurement_timeout"}), via
#     a progress file the measurement child streams step times into
#   - driver SIGTERM at any phase     -> same, flushed from the signal
#     handler before exit
# The measurement runs in a child process (bench.py --_child) because a
# hang inside a PJRT RPC never returns to the Python interpreter, so an
# in-process watchdog could neither fire nor recover.

_TERM_STATE = {"phase": "startup", "child": None, "progress": None,
               "result": None, "t0": None}


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


def _base_result(args) -> dict:
    out = {"metric": "samples_per_sec_per_chip", "value": None,
           "unit": "samples/s", "vs_baseline": None,
           "preset": args.preset, "batch": args.batch}
    if args.chain:
        out["chain"] = args.chain
    return out


def _partial_from_progress(path: str, batch: int, chain: int) -> dict:
    """Stats from whatever per-step times the child streamed out."""
    times = []
    events = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "t" in rec:
                    times.append(rec["t"])
                elif "ev" in rec:
                    events.append(rec["ev"])
    except OSError:
        pass
    out = {"events": events, "steps": len(times)}
    if times:
        per_step = [t / max(chain, 1) for t in times]
        ms = sorted(t * 1000 for t in per_step)
        out.update(p50_ms=round(ms[len(ms) // 2], 1), min_ms=round(ms[0], 1),
                   value=round(batch / (ms[len(ms) // 2] / 1000.0), 2))
    return out


def _on_term(signum, frame):
    """Driver timeout (SIGTERM) — flush an in-band result, then exit.

    Uses os._exit: the main thread may be blocked inside subprocess.wait
    and must not unwind through arbitrary frames from signal context.
    """
    st = _TERM_STATE
    try:
        if st["child"] is not None:
            try:
                st["child"].kill()
            except Exception:
                pass
        result = st["result"] or {"metric": "samples_per_sec_per_chip",
                                  "value": None, "unit": "samples/s",
                                  "vs_baseline": None}
        result["error"] = f"killed_by_signal_{signum}"
        result["phase"] = st["phase"]
        if st["t0"] is not None:
            result["elapsed_s"] = round(time.monotonic() - st["t0"], 1)
        if st["progress"]:
            part = _partial_from_progress(
                st["progress"], result.get("batch", BATCH),
                result.get("chain", 0))
            result["value"] = part.pop("value", None)
            result["partial"] = True
            result.update(part)
        _emit(result)
    finally:
        os._exit(0)


def _child_main(args) -> None:
    """Measurement child: stream per-step times to the progress file, print
    the stats dict as the last stdout line."""
    def progress(rec):
        with open(args._progress, "a") as f:
            f.write(json.dumps(rec) + "\n")

    progress({"ev": "child_start"})
    exp = bench_config(args.preset, args.batch)
    tpu_sps, stats = measure_tpu(exp, args.batch, args.steps, args.accum,
                                 chain=args.chain, progress=progress)
    print(json.dumps({"tpu_sps": tpu_sps, **stats}), flush=True)


def run_measurement(args, budget_s: float):
    """Run the measurement child under a wall-clock budget; return
    (stats dict or None, error string or None)."""
    import subprocess
    import tempfile

    fd, progress_path = tempfile.mkstemp(prefix="bpx_bench_", suffix=".jsonl")
    os.close(fd)
    _TERM_STATE["progress"] = progress_path
    cmd = [sys.executable, os.path.abspath(__file__), "--_child",
           "--_progress", progress_path,
           "--preset", args.preset, "--batch", str(args.batch),
           "--steps", str(args.steps), "--accum", str(args.accum),
           "--chain", str(args.chain)]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    _TERM_STATE["child"] = proc
    try:
        out, _ = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        return None, "measurement_timeout"
    finally:
        _TERM_STATE["child"] = None
    if proc.returncode != 0:
        return None, f"measurement_failed_rc_{proc.returncode}"
    for line in reversed(out.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, "no_measurement_output"


# Single-chip presets measured by the default multi-preset run, headline
# first so it always lands inside the measurement budget; the remaining
# rows run at SWEEP_STEPS each (p50 over 10 steps matched the 30-step
# bench to <1.5% across rounds 3-4 — PERF.md).
SWEEP_PRESETS = ("moviescope", "mmimdb", "iemocap", "cmu-mosei",
                 "counseling", "cmu-mosi")
SWEEP_STEPS = 10


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--remeasure-baseline", action="store_true")
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--preset", default=None,
                        help="any BASELINE.md config preset "
                             "(moviescope|mmimdb|iemocap|cmu-mosei|...); "
                             "default: sweep every single-chip preset, "
                             "one JSON line each, headline first")
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--steps", type=int, default=BENCH_STEPS)
    parser.add_argument("--accum", type=int, default=None,
                        help="micro-batch accumulation inside the step "
                             "(default: keeps the preset inside its memory "
                             "envelope — micro-batch 8 for the remat-free "
                             "moviescope preset; see default_accum)")
    parser.add_argument("--chain", type=int, default=0,
                        help="run k optimizer steps per dispatch (lax.scan) "
                             "so the tunnel round-trip amortizes to 29/k ms "
                             "— the pipelined-execution throughput; 0 = "
                             "per-step host sync (default)")
    parser.add_argument("--_child", action="store_true", dest="_child",
                        help=argparse.SUPPRESS)
    parser.add_argument("--_progress", dest="_progress",
                        help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args._child:
        if args.accum is None:
            args.accum = default_accum(args.preset, args.batch)
        _child_main(args)
        return

    import signal
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    _TERM_STATE["t0"] = time.monotonic()

    # default run = preset sweep (one JSON line per preset, headline
    # first); an explicit --preset narrows to that one
    presets = [args.preset] if args.preset else list(SWEEP_PRESETS)

    _TERM_STATE["phase"] = "device_wait"
    wait_s = float(os.environ.get("BPX_BENCH_DEVICE_WAIT_S", 1500))
    if not wait_for_device(wait_s):
        first = argparse.Namespace(**{**vars(args), "preset": presets[0],
                                      "accum": 0})
        result = _base_result(first)
        result.update(error="device_unreachable", waited_s=round(wait_s))
        _emit(result)
        return

    budget_total = float(os.environ.get("BPX_BENCH_MEASURE_S", 2700))
    t_meas = time.monotonic()
    for i, preset in enumerate(presets):
        run = argparse.Namespace(**vars(args))
        run.preset = preset
        if i > 0:
            run.steps = min(args.steps, SWEEP_STEPS)
        if args.accum is None:
            run.accum = default_accum(preset, args.batch)
        remaining = budget_total - (time.monotonic() - t_meas)
        if i > 0 and remaining < 120:
            sys.stderr.write(f"budget exhausted before {preset}; "
                             f"{remaining:.0f}s left\n")
            break

        result = _base_result(run)
        _TERM_STATE["result"] = result
        _TERM_STATE["phase"] = f"measurement:{preset}"
        stats, err = run_measurement(run, remaining)
        if stats is None:
            part = _partial_from_progress(_TERM_STATE["progress"],
                                          run.batch, run.chain)
            result["value"] = part.pop("value", None)
            result.update(error=err, partial=True, **part)
            _emit(result)
            continue
        tpu_sps = stats.pop("tpu_sps")

        _TERM_STATE["phase"] = f"baseline:{preset}"
        # every BASELINE.md single-chip config gets a torch-CPU ratio; the
        # multi-chip-by-design stress preset and the smoke preset don't
        if args.skip_baseline or preset in ("stress", "synthetic-tiny"):
            baseline = None
        else:
            try:
                exp = bench_config(preset, run.batch)
                baseline = get_baseline(exp, preset,
                                        args.remeasure_baseline)
            except Exception as e:  # baseline failure must not kill it
                sys.stderr.write(f"baseline measurement failed: {e}\n")
                baseline = None

        result.update(value=round(tpu_sps, 2),
                      vs_baseline=round(tpu_sps / baseline, 2) if baseline
                      else None, **stats)
        _emit(result)


if __name__ == "__main__":
    main()
