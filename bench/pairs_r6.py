"""Alternating same-window L4<->L1 paired scaling measurement (round 6).

The sequential ladder's cross-window drift (this VM's throughput moves
10-20% between windows) is cancelled by measuring each efficiency ratio
inside ONE window: run L4 then L1 back-to-back, compute
(eps_4 / eps_1) / 4 per pair, repeat. Same protocol as the round-5
paired runs recorded in BENCH/BASELINE.md; writes BENCH/pairs_r6.json.

Usage: python bench/pairs_r6.py [--pairs 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scaling import REPO, build_zip, run_level  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--events", type=int, default=32_000_000)
    ap.add_argument("--files", type=int, default=1024)
    args = ap.parse_args()

    binlog = bench.ensure_binlog(args.events, n_files=args.files, seed=42,
                                 n_docs=args.events // 2)
    zpath = build_zip()
    out = {"protocol": "alternating L4,L1 per pair, same 32M/4-batch/2-core "
                       "settings as the sequential ladder, verify off "
                       "(round-trip already PASS at all ladder levels)",
           "pairs": []}
    for i in range(args.pairs):
        r4 = run_level(4, binlog, zpath, verify=False, batches=4,
                       exec_mode="local-cluster", exec_cores=2)
        r1 = run_level(1, binlog, zpath, verify=False, batches=4,
                       exec_mode="local-cluster", exec_cores=2)
        pair = {
            "l4_eps": r4["steady_events_per_sec"],
            "l1_eps": r1["steady_events_per_sec"],
            "l4_batch_wall_s": r4["batch_wall_s"],
            "l1_batch_wall_s": r1["batch_wall_s"],
            "efficiency": round(r4["steady_events_per_sec"]
                                / r1["steady_events_per_sec"] / 4, 3),
        }
        out["pairs"].append(pair)
        print(json.dumps(pair), flush=True)
    effs = sorted(p["efficiency"] for p in out["pairs"])
    out["efficiencies"] = effs
    out["median"] = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    with open(os.path.join(REPO, "BENCH", "pairs_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"efficiencies": effs, "median": out["median"]}))


if __name__ == "__main__":
    main()
