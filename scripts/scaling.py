"""Scaling study orchestrator: run the identical workload at local[8]
and local[32] (separate JVMs), compute throughput scaling efficiency,
print a summary JSON line and write SCALING.json.

Efficiency definition (north rule, BASELINE.md §B):
    E = throughput_4N / (4 * throughput_N)
for both index-build docs/sec and query qps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_DOCS = int(os.environ.get("PYLATE_SCALE_DOCS", "200000"))
MASTERS = os.environ.get("PYLATE_SCALE_MASTERS", "local[8],local[32]").split(",")


def run(master: str, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "scaling_run.py"),
         master, str(N_DOCS), corpus_dir],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    corpus_dir = os.path.join(tempfile.gettempdir(), f"pylate_scale_corpus_{N_DOCS}")
    results = [run(m, corpus_dir) for m in MASTERS]
    lo, hi = results
    factor = hi["cores"] / lo["cores"]
    summary = {
        "runs": results,
        "build_scaling_efficiency": round(
            hi["build_docs_per_sec"] / (factor * lo["build_docs_per_sec"]), 3
        ),
        "query_scaling_efficiency": round(hi["qps"] / (factor * lo["qps"]), 3),
        "build_speedup": round(hi["build_docs_per_sec"] / lo["build_docs_per_sec"], 2),
        "query_speedup": round(hi["qps"] / lo["qps"], 2),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
