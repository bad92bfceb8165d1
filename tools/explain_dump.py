"""Dump .explain("formatted") for named contract queries to
plans/<round>/<query>_<tag>.txt — the before/after plan evidence for the
optimization rounds (judge checks plan claims against these files).

Usage: python tools/explain_dump.py <tag> <query> [query ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1 — bench scale).
       SCIO_PLANS_ROUND picks the plans/ subdir (default r16).
"""

from __future__ import annotations

import os
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from scio_spark.context import build_session

    spark = build_session("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SCIO_PLANS_ROUND", "r16")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        from scio_spark.functions.dedup import release_cached

        release_cached(df)


if __name__ == "__main__":
    main()
