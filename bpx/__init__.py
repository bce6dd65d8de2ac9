"""bpx — a TPU-native (JAX/XLA/Pallas/pjit) Biprojection Multimodal Transformer framework.

A from-scratch rebuild of the capabilities of
Damorgal/Biprojection-Multimodal-Transformer (reference: /root/reference) as an
idiomatic TPU framework:

* ``bpx.ops``      — compute primitives: fused multi-head attention (einsum +
  Pallas flash kernels), sinusoidal positions with padding-aware ids, the
  rectangular offset future-mask, the GMU (gated multimodal unit) family, the
  audio conv encoders and a native Flax BERT.
* ``bpx.models``   — the BPMulT model family (``mmtrvapt`` 4-input and
  ``mmtrvat`` 3-input) plus the model registry.
* ``bpx.data``     — host-side data pipeline: jsonl datasets, per-task feature
  adapters, static-shape batching and double-buffered device prefetch.
* ``bpx.parallel`` — device meshes, sharding rules (DP/FSDP/TP), multi-host init.
* ``bpx.train``    — jitted train/eval steps with microbatch gradient
  accumulation, plateau LR scheduling, early stopping, checkpoint/resume,
  the seed-sweep driver and per-task metrics.
* ``bpx.utils``    — logging, checkpointing (orbax), artifacts, seeding.
* ``bpx.cli``      — a CLI preserving the reference's flag surface
  (ref: train.py:32-97).
"""

__version__ = "0.1.0"
