"""Experiment task-farm scheduler.

The reference fans experiments out with SLURM + an MPI task scheduler: each
line of ``jobs_to_run.txt`` is an independent ``python3 bpmult/train.py …``
command and MPI only distributes whole experiments — zero in-job
communication (ref: slurm:26-27, jobs_to_run.txt:1; SURVEY.md §2 C25).

TPU-native equivalent: a process task-farm that pops job lines and runs each
as a subprocess, pinning one job per TPU slice/host.  On a multi-host TPU
pod, run one scheduler per host with disjoint ``visible_devices``; under
SLURM, launch via ``scripts/slurm_taskfarm.sh`` (same sbatch shape as the
reference's script).  Failed jobs are retried up to ``max_retries`` and the
per-job logs land in ``log_dir`` — the reference's failure story was
"re-run the SLURM job" (SURVEY.md §5.3); retries make it automatic.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import sys
import threading
import time
from dataclasses import dataclass, field
from queue import Queue
from typing import Dict, List, Optional, Sequence


@dataclass
class JobResult:
    command: str
    returncode: int
    attempts: int
    seconds: float
    log_path: Optional[str] = None


class TaskFarm:
    """Run independent job command lines over a pool of worker slots."""

    def __init__(self, n_workers: int = 1, log_dir: Optional[str] = None,
                 max_retries: int = 1,
                 device_env: Optional[Sequence[Dict[str, str]]] = None):
        """``device_env``: optional per-slot env overrides (e.g. one TPU
        slice per slot via ``TPU_VISIBLE_DEVICES`` / ``JAX_PLATFORMS``)."""
        self.n_workers = n_workers
        self.log_dir = log_dir
        self.max_retries = max_retries
        self.device_env = list(device_env) if device_env else [{}] * n_workers
        assert len(self.device_env) == n_workers

    def _run_one(self, slot: int, idx: int, command: str) -> JobResult:
        env = dict(os.environ)
        env.update(self.device_env[slot])
        log_path = None
        attempts = 0
        t0 = time.time()
        while attempts <= self.max_retries:
            attempts += 1
            stdout = subprocess.DEVNULL
            if self.log_dir:
                os.makedirs(self.log_dir, exist_ok=True)
                log_path = os.path.join(self.log_dir, f"job{idx:04d}.log")
                stdout = open(log_path, "ab")
            try:
                proc = subprocess.run(shlex.split(command), env=env,
                                      stdout=stdout,
                                      stderr=subprocess.STDOUT)
            finally:
                if stdout is not subprocess.DEVNULL:
                    stdout.close()
            if proc.returncode == 0:
                break
        return JobResult(command, proc.returncode, attempts,
                         time.time() - t0, log_path)

    def run(self, commands: Sequence[str]) -> List[JobResult]:
        queue: "Queue" = Queue()
        for i, cmd in enumerate(commands):
            cmd = cmd.strip()
            if cmd and not cmd.startswith("#"):
                queue.put((i, cmd))
        results: List[JobResult] = []
        lock = threading.Lock()

        def worker(slot: int):
            while True:
                try:
                    idx, cmd = queue.get_nowait()
                except Exception:
                    return
                res = self._run_one(slot, idx, cmd)
                with lock:
                    results.append(res)
                queue.task_done()

        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in range(self.n_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return sorted(results, key=lambda r: r.command)


def run_jobs_file(path: str, n_workers: int = 1,
                  log_dir: Optional[str] = None,
                  max_retries: int = 1) -> List[JobResult]:
    """Execute every line of a jobs file (ref: jobs_to_run.txt format)."""
    with open(path) as f:
        commands = f.readlines()
    farm = TaskFarm(n_workers=n_workers, log_dir=log_dir,
                    max_retries=max_retries)
    return farm.run(commands)


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        description="bpx task-farm scheduler (MPI_Scheduler equivalent)")
    parser.add_argument("jobs_file")
    parser.add_argument("--workers", type=int, default=1)
    parser.add_argument("--log_dir", type=str, default="outputs")
    parser.add_argument("--max_retries", type=int, default=1)
    args = parser.parse_args(argv)
    results = run_jobs_file(args.jobs_file, args.workers, args.log_dir,
                            args.max_retries)
    failed = [r for r in results if r.returncode != 0]
    for r in results:
        status = "OK" if r.returncode == 0 else f"FAIL({r.returncode})"
        print(f"{status} [{r.seconds:.0f}s x{r.attempts}] {r.command}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
