"""Device mesh construction over the ICI fabric.

The reference's only parallelism is ``nn.DataParallel`` over <=2 GPUs in one
process (ref: train.py:354-356) plus a SLURM task farm of independent jobs
(ref: slurm:26-27).  TPU-native equivalent: an explicit
``jax.sharding.Mesh`` with (data, fsdp, tensor) axes — batch-axis data
parallelism reproduces DataParallel semantics with the gradient all-reduce
riding ICI, and the fsdp/tensor axes scale beyond it (SURVEY.md §5.8).

Multi-host: call :func:`initialize_distributed` before mesh creation; XLA
then lays DCN on the outermost (data) axis automatically via
``create_hybrid_device_mesh`` when more than one process is present.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from bpx.config import MeshConfig


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (SLURM/TPU-pod); no-op on a single process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def mesh_scoped(fn, mesh: Optional[Mesh]):
    """Wrap a (jitted) callable so every call — including the tracing call —
    runs under ``jax.sharding.set_mesh(mesh)``.

    The ambient mesh is what lets :func:`bpx.parallel.sharding.constrain`
    pin activation/weight-view shardings inside the model; ``set_mesh`` is
    only legal outside ``jax.jit``, so the scope wraps the call boundary.
    No-op when ``mesh`` is None (single device).
    """
    if mesh is None:
        return fn

    def wrapped(*args, **kwargs):
        with jax.sharding.set_mesh(mesh):
            return fn(*args, **kwargs)
    return wrapped


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the (data, fsdp, tensor) mesh; data=-1 absorbs the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data, fsdp, tensor = config.data, config.fsdp, config.tensor
    if data == -1:
        assert n % (fsdp * tensor) == 0, \
            f"{n} devices not divisible by fsdp*tensor={fsdp * tensor}"
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, \
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    if jax.process_count() > 1:
        # The DCN granule is the TPU slice when the platform reports one
        # slice per process; CPU (and single-slice multi-process setups)
        # report fewer slices than processes, so fall back to process
        # boundaries (exercised by the 2-process CPU smoke test,
        # test_distributed.py::test_multihost_two_process_dp).
        n_slices = len({getattr(d, "slice_index", None) for d in devices})
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            (data // jax.process_count(), fsdp, tensor),
            (jax.process_count(), 1, 1), devices=devices,
            process_is_granule=n_slices != jax.process_count())
    else:
        mesh_devices = mesh_utils.create_device_mesh((data, fsdp, tensor),
                                                     devices=devices)
    return Mesh(mesh_devices, config.axis_names)
