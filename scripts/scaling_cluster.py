"""N-vs-4N scaling on a REAL standalone Spark cluster (one box), with
each worker's process tree pinned to its own disjoint CPU set.

Why this exists (SCALING.md round-2/3 findings): `local[N]` shares one
JVM, and even `local-cluster[W,C,M]` only caps concurrent *tasks* per
executor — the pandas-UDF python workers, GC/JIT/netty service threads
all run beyond the nominal core count, so a "2-core" leg actually
consumes ~2× its nominal CPUs and the N-vs-4N ratio is systematically
deflated. Here each leg is a real standalone cluster: one Master JVM,
W Worker JVMs each launched under ``taskset -c <cpuset>`` (executors
and their python workers inherit the affinity mask), driver unpinned in
both legs (a real cluster's driver node is identical at both sizes).
This is the closest in-sandbox realization of the north rule's
"spark-submit on a multi-executor cluster at N and 4N executors":
separate executor JVMs, separate BlockManagers/shuffle, separate python
worker pools, disjoint CPU budgets that actually quadruple.

Usage:
  python scripts/scaling_cluster.py                # 1 vs 4 workers x 2 cores
  PYLATE_CLUSTER_LEGS="1:2,4:2" PYLATE_SCALE_DOCS=3200000 \
      PYLATE_CLUSTER_REPEATS=2 python scripts/scaling_cluster.py

Writes SCALING.json (same shape as scripts/scaling.py).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_URL = "spark://127.0.0.1:7077"
N_DOCS = int(os.environ.get("PYLATE_SCALE_DOCS", "3200000"))
LEGS = [
    tuple(int(x) for x in leg.split(":"))
    for leg in os.environ.get("PYLATE_CLUSTER_LEGS", "1:2,4:2").split(",")
]
REPEATS = max(1, int(os.environ.get("PYLATE_CLUSTER_REPEATS", "2")))
MEM_MB = int(os.environ.get("PYLATE_CLUSTER_WORKER_MB", "6144"))


def _spawn(cmd: list[str], env: dict | None = None) -> subprocess.Popen:
    e = dict(os.environ)
    e.update(env or {})
    return subprocess.Popen(
        cmd, env=e, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )


def _wait_port(port: int, timeout_s: float = 30.0) -> None:
    import socket

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.3)
    raise RuntimeError(f"port {port} never opened")


class Cluster:
    """A pinned standalone cluster: master + W workers × C cores each,
    worker i pinned to CPUs [i*C, (i+1)*C)."""

    def __init__(self, workers: int, cores: int):
        self.procs: list[subprocess.Popen] = []
        self.workers, self.cores = workers, cores

    def __enter__(self):
        self.procs.append(
            _spawn([SPARK_CLASS, "org.apache.spark.deploy.master.Master",
                    "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8089"])
        )
        _wait_port(7077)
        for i in range(self.workers):
            cpus = f"{i * self.cores}-{(i + 1) * self.cores - 1}"
            wdir = tempfile.mkdtemp(prefix=f"pylate_worker{i}_")
            local = "/dev/shm/pylate-worker-tmp" if os.access("/dev/shm", os.W_OK) else wdir
            self.procs.append(
                _spawn(
                    ["taskset", "-c", cpus, SPARK_CLASS,
                     "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                     "-c", str(self.cores), "-m", f"{MEM_MB}M",
                     "-d", wdir, "--webui-port", str(8190 + i)],
                    env={"SPARK_LOCAL_DIRS": local},
                )
            )
        return self

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
        time.sleep(1.0)


#: weak-scaling modes (PYLATE_SCALE_WEAK):
#:   "1"/"docs" — each leg's docs AND queries scale with its core count
#:     (constant work per core). Query legs run mode=exhaustive, where
#:     per-query work really is ~linear in corpus size, so the
#:     work-normalized efficiency (qps × n_docs) is honest — the
#:     cascade's block-max pruning is sublinear in N and would
#:     overstate it.
#:   "queries" — corpus FIXED, query batch ∝ cores: the raw qps ratio
#:     IS the efficiency, no normalization of any kind (the
#:     complementary leg the round-4 verdict asked for).
WEAK_MODE = os.environ.get("PYLATE_SCALE_WEAK", "")
WEAK_DOCS = WEAK_MODE in ("1", "docs")
WEAK_QUERIES = WEAK_MODE == "queries"
WEAK = WEAK_DOCS or WEAK_QUERIES


def run_leg(workers: int, cores: int, scale: float = 1.0) -> dict:
    """One full build+query measurement against a pinned cluster,
    in a subprocess so every leg gets a fresh driver JVM. ``scale``
    multiplies the leg's docs+queries (weak-docs mode) or queries only
    (weak-queries mode)."""
    n_docs = int(N_DOCS * scale) if WEAK_DOCS else N_DOCS
    corpus_dir = os.path.join(tempfile.gettempdir(), f"pylate_scale_corpus_{n_docs}")
    env = dict(os.environ)
    if scale != 1.0:
        env["PYLATE_SCALE_QUERIES"] = str(
            int(int(os.environ.get("PYLATE_SCALE_QUERIES", "2000")) * scale)
        )
    if WEAK_DOCS:
        env["PYLATE_SCALE_QUERY_MODE"] = "exhaustive"
    with Cluster(workers, cores):
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "scaling_run.py"),
             MASTER_URL, str(n_docs), corpus_dir,
             str(workers), str(cores)],
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["workers"] = workers
    return rec


def main() -> None:
    subprocess.run(["sh", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
                   check=True, capture_output=True)
    base_cores = min(w * c for w, c in LEGS)
    results = None
    all_runs: list[dict] = []
    for _ in range(REPEATS):
        batch = [
            run_leg(w, c, scale=(w * c / base_cores) if WEAK else 1.0)
            for (w, c) in LEGS
        ]
        all_runs.extend(batch)
        if results is None:
            results = batch
        else:
            results = [a if a["qps"] >= b["qps"] else b for a, b in zip(results, batch)]
    # sort by total cores before picking the endpoints: a user-supplied
    # PYLATE_CLUSTER_LEGS like "4:2,1:2" must not silently invert the
    # reported speedup/efficiency
    results = sorted(results, key=lambda r: r["cores"])
    lo, hi = results[0], results[-1]
    factor = hi["cores"] / lo["cores"]
    if WEAK_DOCS:
        weak_note = (", WEAK scaling by docs (docs+queries ∝ cores; query "
                     "mode=exhaustive — per-query work ~linear in postings "
                     "there, so qps × n_docs normalization is honest; the "
                     "cascade's sublinear block-max pruning would overstate it)")
    elif WEAK_QUERIES:
        weak_note = (", WEAK scaling by queries (queries ∝ cores, corpus "
                     "FIXED; raw qps ratio, no normalization)")
    else:
        weak_note = ""
    summary = {
        "protocol": ("standalone cluster, taskset-pinned workers "
                     f"(legs {LEGS}, driver unpinned both legs), interleaved "
                     f"x{REPEATS}, per-leg best by qps" + weak_note),
        "runs": results,
        "all_runs": all_runs,
        "build_scaling_efficiency": round(
            hi["build_docs_per_sec"] / (factor * lo["build_docs_per_sec"]), 3),
        # weak-docs mode scales the CORPUS too, and per-query exhaustive
        # work is ∝ corpus size (the postings of a query's terms grow
        # with N), so query work per leg is qps × n_docs — a bare qps
        # ratio would demand each query get faster while doing 4× the
        # work. Weak-queries and strong modes report the raw ratio.
        "query_scaling_efficiency": round(
            (hi["qps"] * hi["n_docs"]) / (factor * lo["qps"] * lo["n_docs"]), 3
        ) if WEAK_DOCS else round(hi["qps"] / (factor * lo["qps"]), 3),
        "build_speedup": round(hi["build_docs_per_sec"] / lo["build_docs_per_sec"], 2),
        "query_speedup": round(hi["qps"] / lo["qps"], 2),
    }
    out_name = ("SCALING_WEAK.json" if WEAK_DOCS
                else "SCALING_WEAK_QUERIES.json" if WEAK_QUERIES
                else "SCALING.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
