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
# split on commas OUTSIDE brackets: local-cluster[4,2,6144] has its own
import re

MASTERS = re.split(r",(?![^\[]*\])", os.environ.get("PYLATE_SCALE_MASTERS", "local[8],local[32]"))
#: whole-run repeats, INTERLEAVED (lo,hi,lo,hi,...) so both widths
#: sample the same host-noise windows; per-width result = best
#: throughput observation (the box is host-time-shared: identical runs
#: swing ±40%, and which 5-minute window a leg lands in dominates a
#: single comparison — see SCALING.md noise section)
REPEATS = max(1, int(os.environ.get("PYLATE_SCALE_REPEATS", "1")))


def run(master: str, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "scaling_run.py"),
         master, str(N_DOCS), corpus_dir],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _best(a: dict, b: dict) -> dict:
    """The better WHOLE observation of a configuration (by query qps,
    the headline metric) — records stay internally consistent
    (qps == n_queries/query_sec within one record); all raw runs are
    published alongside in ``all_runs``."""
    return a if a["qps"] >= b["qps"] else b


def main() -> None:
    corpus_dir = os.path.join(tempfile.gettempdir(), f"pylate_scale_corpus_{N_DOCS}")
    results = None
    all_runs: list[dict] = []
    for _ in range(REPEATS):
        batch = [run(m, corpus_dir) for m in MASTERS]
        all_runs.extend(batch)
        results = batch if results is None else [_best(x, y) for x, y in zip(results, batch)]
    lo, hi = results
    factor = hi["cores"] / lo["cores"]
    summary = {
        "runs": results,          # best-by-qps whole observation per width
        "all_runs": all_runs,     # every raw observation, in order
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
