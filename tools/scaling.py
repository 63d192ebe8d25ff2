"""Scaling-efficiency evidence (BASELINE.json:2,14): the north rule's
N → 4N executor criterion, sandboxed as two local[] parallelism levels
on the same input (per driver instruction — no real cluster here).

Method:
- measure the machine's own parallel-scaling envelope first (pure-CPU
  multiprocessing md5 burn) — on this box sustained clocks drop as
  cores activate, so even embarrassingly parallel work cannot show
  eff 1.0 (measured ceiling ~0.84 at 8→32); the report carries this
  context so the pipeline's efficiency is read against it;
- run the full KG pipeline at N and 4N cores in separate processes
  (fresh JVM each) on the same synthetic corpus; efficiency =
  (T_N / T_4N) / 4.

Defaults: N=4 → 4N=16 (within the box's physical-core envelope) on
the sf1.0 corpus (500k pages) where compute dominates fixed overhead.
Env: SCALING_N, SCALING_SF_DIR.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(k):
    import hashlib

    h = b"x"
    for _ in range(k):
        h = hashlib.md5(h).digest()
    return 1


def cpu_envelope(n: int, n4: int) -> dict:
    import multiprocessing as mp

    burn = _burn
    out = {}
    for procs in (n, n4):
        with mp.Pool(procs) as p:
            p.map(burn, [10000] * procs)
            jobs = procs * 12
            t0 = time.time()
            p.map(burn, [800000] * jobs)
            out[procs] = jobs / (time.time() - t0)
    return {
        "throughput_jobs_per_sec": out,
        "hardware_ceiling_efficiency": round(out[n4] / out[n] / (n4 / n), 3),
    }


def run_once(sf_dir: str, cpus: int, repeat: int = 1) -> dict:
    # repeat > 1: bench.py reports the per-stage MINIMUM over N
    # in-session executions — the host-noise mitigation BASELINE.md
    # documents (wall-clock varies up to 4x between runs; the minimum
    # approximates the true cost)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-only"]
    if repeat > 1:
        cmd += ["--repeat", str(repeat)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SCALING_SF_DIR", os.path.join(REPO, ".synthdata/sf1.0"))
    n = int(os.environ.get("SCALING_N", "4"))
    repeat = int(os.environ.get("SCALING_REPEAT", "1"))
    n4 = 4 * n
    hw = cpu_envelope(n, n4)
    r_n = run_once(sf_dir, n, repeat)
    r_n4 = run_once(sf_dir, n4, repeat)

    def t_pipeline(r):
        # true cost ≈ min over in-session runs (host-noise methodology,
        # BASELINE.md): bench emits cold in `queries` and min-of-rest
        # in `queries_warm` — take the overall minimum
        cold = r["queries"]["kg_pipeline_triples"]
        warm = r.get("queries_warm", {}).get("kg_pipeline_triples")
        return min(cold, warm) if warm is not None else cold

    t_n = t_pipeline(r_n)
    t_n4 = t_pipeline(r_n4)
    eff = (t_n / t_n4) / (n4 / n)
    report = {
        "sf_dir": sf_dir,
        "N_cpus": n,
        "4N_cpus": n4,
        "pipeline_sec_N": t_n,
        "pipeline_sec_4N": t_n4,
        "triples": r_n4["rows"]["kg_pipeline_triples"],
        "triples_per_sec_N": round(r_n["rows"]["kg_pipeline_triples"] / t_n, 1),
        "triples_per_sec_4N": round(r_n4["rows"]["kg_pipeline_triples"] / t_n4, 1),
        "speedup": round(t_n / t_n4, 3),
        "scaling_efficiency": round(eff, 3),
        "hardware_envelope": hw,
        "repeat": repeat,
        "gate": "PASS" if eff >= 0.8 else "FAIL",
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
