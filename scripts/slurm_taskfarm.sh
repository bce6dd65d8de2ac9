#!/bin/bash
# SLURM batch script fanning out independent bpx training jobs
# (ref equivalent: the reference's `slurm` script driving MPI_Scheduler over
# jobs_to_run.txt — each line is a full training command; SURVEY.md C25).
#
# Usage: mkdir -p outputs && sbatch scripts/slurm_taskfarm.sh jobs_to_run.txt
# (outputs/ must exist at submit time: slurmstepd opens the #SBATCH
# --output path before the script body runs and does not create dirs.)
#
#SBATCH --job-name=bpx-taskfarm
#SBATCH --output=outputs/slurm-%j.out
#SBATCH --ntasks-per-node=1
#SBATCH --nodes=1

JOBS_FILE=${1:-jobs_to_run.txt}
WORKERS=${BPX_FARM_WORKERS:-1}   # one job per TPU slice on this host

srun python -m bpx.cluster.scheduler "$JOBS_FILE" \
    --workers "$WORKERS" --log_dir outputs --max_retries 1
