"""Task-farm scheduler tests (ref: slurm + MPI_Scheduler, SURVEY.md C25)."""

import os

from bpx.cluster.scheduler import TaskFarm, run_jobs_file


def test_taskfarm_runs_jobs(tmp_path):
    marker = tmp_path / "out"
    farm = TaskFarm(n_workers=2, log_dir=str(tmp_path / "logs"))
    cmds = [f"python3 -c \"open('{marker}{i}','w').write('done')\""
            for i in range(4)]
    results = farm.run(cmds)
    assert len(results) == 4
    assert all(r.returncode == 0 for r in results)
    for i in range(4):
        assert os.path.exists(f"{marker}{i}")
    assert all(r.log_path and os.path.exists(r.log_path) for r in results)


def test_taskfarm_retries_and_reports_failure(tmp_path):
    farm = TaskFarm(n_workers=1, max_retries=2, log_dir=str(tmp_path))
    results = farm.run(["python3 -c \"import sys; sys.exit(3)\""])
    assert results[0].returncode == 3
    assert results[0].attempts == 3      # initial + 2 retries


def test_jobs_file_skips_comments(tmp_path):
    jobs = tmp_path / "jobs.txt"
    jobs.write_text("# comment line\npython3 -c \"print('hi')\"\n\n")
    results = run_jobs_file(str(jobs), n_workers=1)
    assert len(results) == 1 and results[0].returncode == 0
