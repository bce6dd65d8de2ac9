"""Cluster-level experiment orchestration (ref: slurm, jobs_to_run.txt)."""

from bpx.cluster.scheduler import TaskFarm, run_jobs_file
