#!/usr/bin/env python
"""Scheduler-abstracted job launcher (Slurm / Flux / PBS / local).

Equivalent of the reference's scripts/job_launcher.py (scheduler
abstraction for the machine matrix in docs/usrman-src/performance.rst):
detects the available scheduler, renders a submission script for a
hypredrive-tpu CLI run (single- or multi-host JAX), and submits or
prints it.

Multi-host runs use JAX's coordinator model instead of mpirun: every
task gets JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
(consumed by hypredrive_tpu.core.runtime when present).

Usage:
  python scripts/job_launcher.py config.yml                 # auto-detect
  python scripts/job_launcher.py -s slurm -N 4 -t 30 config.yml
  python scripts/job_launcher.py --dry-run config.yml       # print only
"""

import argparse
import os
import shutil
import subprocess
import sys

TEMPLATES = {
    "slurm": """#!/bin/bash
#SBATCH -N {nodes}
#SBATCH -t {minutes}
#SBATCH -J {name}
#SBATCH -o {name}-%j.out
{extra}
export JAX_COORDINATOR_ADDRESS=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1):12345
export JAX_NUM_PROCESSES=$SLURM_NNODES
srun --ntasks-per-node=1 bash -c 'JAX_PROCESS_ID=$SLURM_PROCID {python} -m hypredrive_tpu.cli {args}'
""",
    "flux": """#!/bin/bash
{extra}
flux run -N {nodes} --output={name}.out \\
  bash -c 'export JAX_COORDINATOR_ADDRESS=$(flux hostlist -n0 local):12345; \\
           export JAX_NUM_PROCESSES={nodes}; \\
           JAX_PROCESS_ID=$FLUX_TASK_RANK {python} -m hypredrive_tpu.cli {args}'
""",
    "pbs": """#!/bin/bash
#PBS -l nodes={nodes}
#PBS -l walltime=00:{minutes}:00
#PBS -N {name}
#PBS -j oe
{extra}
cd $PBS_O_WORKDIR
export JAX_COORDINATOR_ADDRESS=$(head -1 $PBS_NODEFILE):12345
export JAX_NUM_PROCESSES={nodes}
pbsdsh -- bash -c 'JAX_PROCESS_ID=$PBS_TASKNUM {python} -m hypredrive_tpu.cli {args}'
""",
    "local": """#!/bin/bash
{extra}
{python} -m hypredrive_tpu.cli {args}
""",
}

SUBMIT = {"slurm": "sbatch", "flux": "bash", "pbs": "qsub", "local": "bash"}


def detect_scheduler() -> str:
    for sched, probe in (("slurm", "sbatch"), ("flux", "flux"),
                         ("pbs", "qsub")):
        if shutil.which(probe):
            return sched
    return "local"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config", nargs="+", help="YAML config file(s) + CLI args")
    ap.add_argument("-s", "--scheduler",
                    choices=["slurm", "flux", "pbs", "local", "auto"],
                    default="auto")
    ap.add_argument("-N", "--nodes", type=int, default=1)
    ap.add_argument("-t", "--minutes", type=int, default=30)
    ap.add_argument("-J", "--name", default="hypredrive-tpu")
    ap.add_argument("-e", "--env", action="append", default=[],
                    help="extra KEY=VALUE exports")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the submission script, do not submit")
    args = ap.parse_args(argv)

    sched = detect_scheduler() if args.scheduler == "auto" else args.scheduler
    extra = "\n".join(f"export {kv}" for kv in args.env)
    script = TEMPLATES[sched].format(
        nodes=args.nodes, minutes=args.minutes, name=args.name,
        python=sys.executable, args=" ".join(args.config), extra=extra)

    if args.dry_run:
        print(f"# scheduler: {sched}")
        print(script)
        return 0
    path = f"{args.name}.{sched}.sh"
    with open(path, "w") as f:
        f.write(script)
    os.chmod(path, 0o755)
    rc = subprocess.run([SUBMIT[sched], path]).returncode
    print(f"submitted {path} via {SUBMIT[sched]} (rc={rc})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
