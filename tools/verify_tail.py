"""Seeded uniform-sample oracle gate over the WHOLE registry.

The driver's CORRECTNESS_rN.json scores only the first 50 queries in
alphabetical order, and the registry's growth sorts almost entirely
after that prefix — so the driver gate is structurally blind to the
tail. This tool closes the local blind spot: it draws N names
uniformly from the registry with a deterministic seed, and with
--changed-first additionally forces IN every registry name that
appears in the `git diff --base..HEAD` text (i.e. every query a
change since --base could have touched), so edited queries can never
be missed by the sample. Forced names are included on top of the N
uniform picks.

Usage:
  python tools/verify_tail.py [--n 25] [--seed 11] [--sf-dir DIR]
  python tools/verify_tail.py --tail-only   # sample only past the
                                            # driver's 50-name window
  python tools/verify_tail.py --base HEAD~1 --changed-first
"""

from __future__ import annotations

import argparse
import random
import sys

sys.path.insert(0, ".")

from litebase_spark import operators  # noqa: F401  (registers queries)
from litebase_spark.catalog import REGISTRY

DRIVER_WINDOW = 50  # first-N-alphabetical names the driver re-checks


def changed_names(base: str) -> set[str]:
    """Every registry name whose DEFINING MODULE differs from `base`
    (check_oracle's module-granular map — an edit anywhere in an
    operator file forces all of that file's queries, which is the
    over-approximation we want). A cross-cutting change (catalog /
    session / functions / plans) affects every plan; the tail sample
    can't cover that, so force nothing and say so — run the full
    sweep instead."""
    from tools.check_oracle import changed_query_names

    picked = changed_query_names(base)
    if picked is None:
        print(
            "# verify_tail: cross-cutting diff — --changed-first "
            "forces nothing; run the FULL check_oracle sweep"
        )
        return set()
    return set(picked)


def sample_names(
    n: int, seed: int, tail_only: bool, forced: set[str]
) -> list[str]:
    names = sorted(REGISTRY)
    pool = names[DRIVER_WINDOW:] if tail_only else names
    forced_in = sorted(forced & set(pool))
    rest = [p for p in pool if p not in forced]
    if n >= len(rest):
        return sorted(set(rest) | set(forced_in))
    rng = random.Random(seed)
    return sorted(set(rng.sample(rest, n)) | set(forced_in))


def head_seed() -> int:
    """Default gate seed derived from the repo's HEAD commit hash.
    Why: a hand-picked 'fresh' seed tends to land on the obvious pick
    (round 12: builder and judge both chose the next-date integer),
    which defeats the gate's unpredictability. HEAD changes with
    every commit and cannot be chosen to flatter the sample; the run
    header prints it so the committed artifact stays reproducible."""
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return int(sha, 16) % 2**32
    except Exception:
        return 11  # not a git checkout: fixed fallback


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument(
        "--seed", type=int, default=None,
        help="sample seed (default: derived from HEAD commit hash — "
        "see head_seed)",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--tail-only", action="store_true",
        help="sample only names sorting AFTER the driver's 50-query "
        "window (its structural blind spot)",
    )
    ap.add_argument(
        "--base", default="HEAD~1",
        help="git ref the --changed-first bias diffs against",
    )
    ap.add_argument(
        "--changed-first", action="store_true",
        help="force-include every registry name mentioned in the "
        "diff since --base, on top of the uniform sample",
    )
    args = ap.parse_args()
    if args.seed is None:
        args.seed = head_seed()

    forced = changed_names(args.base) if args.changed_first else set()
    picked = sample_names(args.n, args.seed, args.tail_only, forced)
    in_window = sum(
        1 for p in picked if p in sorted(REGISTRY)[:DRIVER_WINDOW]
    )
    print(
        f"# verify_tail: {len(picked)} of {len(REGISTRY)} queries, "
        f"seed={args.seed}, {in_window} inside / "
        f"{len(picked) - in_window} outside the driver window"
        + (f", {len(forced)} changed since {args.base} forced in"
           if args.changed_first else "")
    )
    sys.argv = [
        "check_oracle.py", "--sf-dir", args.sf_dir, *picked,
    ]
    from tools import check_oracle

    return check_oracle.main()


if __name__ == "__main__":
    sys.exit(main())
