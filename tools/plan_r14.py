"""Dump .explain('formatted') for named queries to plans/r14/<name>_<tag>.txt.

Usage: python tools/plan_r14.py before q1_pricing_summary fts_match_trigram ...
       python tools/plan_r14.py after  ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from litebase_spark import operators  # noqa: F401
from litebase_spark.catalog import REGISTRY
from litebase_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-r13")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {tag} (sf_dir={sf_dir})\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
