"""A/B replay-throughput audit for the post-stamp z-order lake changes.

The final round-6 scaling ladder was stamped at 78bc3ae with a no-diff
audit on the replay-path modules; the z-order clustering commit then
touched `ztdf_spark/lake.py` (`_write_files` / `_adopt_staged` grew
`zorder_by`/`stat_cols` parameters that are inert on the ingest path —
merge deltas and plain compacts pass neither). This measures whether the
ladder numbers still hold: 3 alternating OLD/NEW same-window pairs on the
same seeded binlog, differing ONLY by the --py-files zip (OLD zip built
from a worktree at the stamp commit; replay_once.py / scaling.py are
diff-identical between the trees).

Writes BENCH/ab_zorder_r6.json.

Usage: python bench/ab_zorder_r6.py [--pairs 3] [--events 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scaling import REPO, build_zip, run_level  # noqa: E402

import bench  # noqa: E402

STAMP = "78bc3ae"


def build_old_zip(worktree: str) -> str:
    zpath = "/tmp/ztdf_spark_old.zip"
    pkg = os.path.join(worktree, "ztdf_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for name in sorted(os.listdir(pkg)):
            if name.endswith(".py"):
                z.write(os.path.join(pkg, name), f"ztdf_spark/{name}")
    return zpath


def steady(res: dict) -> float:
    return res["steady_events_per_sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    wt = "/tmp/ab_old_r6"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, STAMP], cwd=REPO, check=True
        )
    old_zip = build_old_zip(wt)
    new_zip = build_zip()
    binlog = bench.ensure_binlog(
        args.events, n_files=args.files, seed=11, n_docs=args.events // 2
    )

    pairs = []
    for i in range(args.pairs):
        # alternate order inside each window so window drift cancels
        order = [("old", old_zip), ("new", new_zip)] if i % 2 == 0 else [
            ("new", new_zip), ("old", old_zip)
        ]
        row: dict = {}
        for tag, zp in order:
            res = run_level(8, binlog, zp, verify=False, batches=4)
            row[tag] = round(steady(res), 1)
        row["ratio_new_over_old"] = round(row["new"] / row["old"], 3)
        pairs.append(row)
        print(json.dumps(row))

    out = {
        "purpose": (
            "A/B replay-throughput check after the z-order lake commit "
            "(compact(zorder_by=...), read_where secondary pruning, "
            "_adopt_staged stat_cols): is the 78bc3ae scaling ladder still "
            "valid for HEAD?"
        ),
        "protocol": (
            f"{args.pairs} alternating OLD/NEW same-window pairs, same seeded "
            f"binlog ({args.events} events, {args.files} files, 4 batches, "
            f"seed 11), local[8] spark-submit --py-files, steady median "
            f"batch; OLD zip = worktree at {STAMP}, NEW zip = HEAD; "
            "replay_once.py/scaling.py diff-identical between trees"
        ),
        "pairs": pairs,
        "median_old": statistics.median(p["old"] for p in pairs),
        "median_new": statistics.median(p["new"] for p in pairs),
    }
    r = out["median_new"] / out["median_old"]
    out["conclusion"] = (
        f"median NEW/OLD = {r:.3f} — "
        + (
            "throughput-neutral; the ladder numbers remain the numbers for HEAD "
            "(the z-order parameters are inert on the ingest path: merge deltas "
            "and plain compacts pass zorder_by=None/stat_cols=None, adding one "
            "falsy check per adopted file)"
            if r >= 0.95
            else "REGRESSION — re-run the ladder on HEAD"
        )
    )
    with open(os.path.join(REPO, "BENCH", "ab_zorder_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_new_over_old": round(r, 3)}))


if __name__ == "__main__":
    main()
