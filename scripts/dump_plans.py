"""Dump .explain("formatted") for every catalog query plus the bench
operator paths into plans/r07/<name>_<tag>.txt (tag = before/after).

Usage: python scripts/dump_plans.py <tag> [name ...]

Plans are captured at sf0.001 (the correctness scale) — plan SHAPE
(Exchange count, join strategy, PushedFilters, Python-eval nodes) is
what the optimization round pins; sizes differ at bench scale but the
shape claims hold at both.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PYLATE_TEST_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r07")


def main(tag: str, only: list[str]) -> None:
    from pylate_spark.session import get_spark

    import __spark_entry__ as entry_mod

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{tag}")
    queries = entry_mod.queries()
    names = only or sorted(queries)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "before", sys.argv[2:])
