"""Event-log stage forensics: attribute wall time per stage and find the
non-scaling component between two parallelism levels.

    python tools/evlog.py /tmp/ztdf-evlog/<app1> [/tmp/ztdf-evlog/<app2>]

For each app: per-stage wall, task count, sum of executor run/CPU/GC/
deserialize times, input/shuffle bytes, and the idle gaps between stages
(driver-side time no task is running). Comparing the same job at N and 4N
cores: a stage whose WALL does not shrink while its task-time SUM is
unchanged is straggler/wave-bound; a stage whose task-time SUM grows at
higher parallelism is contention-bound; growing GAPS are driver overhead.
"""

import json
import sys
from collections import defaultdict


def analyze(path: str) -> None:
    stages = {}
    tasks = defaultdict(list)
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                app_end = e.get("Timestamp")
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                    "n_tasks": si.get("Number of Tasks"),
                }
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                ti = e.get("Task Info") or {}
                tasks[e["Stage ID"]].append(
                    {
                        "run": m.get("Executor Run Time", 0),
                        "cpu": m.get("Executor CPU Time", 0) / 1e6,  # ns → ms
                        "gc": m.get("JVM GC Time", 0),
                        "deser": m.get("Executor Deserialize Time", 0),
                        "launch": ti.get("Launch Time", 0),
                        "finish": ti.get("Finish Time", 0),
                        "input_mb": (m.get("Input Metrics") or {}).get("Bytes Read", 0) / 1e6,
                    }
                )
    print(f"== {path}")
    total_wall = (app_end - app_start) / 1000 if app_start and app_end else None
    print(f"app wall: {total_wall}s")
    spans = []
    for sid in sorted(stages):
        s = stages[sid]
        ts = tasks.get(sid, [])
        if not ts or not s.get("submit"):
            continue
        wall = (s["complete"] - s["submit"]) / 1000
        spans.append((s["submit"], s["complete"]))
        print(
            f"stage {sid:>3} [{s['name']:<60}] wall={wall:7.2f}s tasks={len(ts):>4} "
            f"run_sum={sum(t['run'] for t in ts)/1000:8.1f}s cpu_sum={sum(t['cpu'] for t in ts)/1000:8.1f}s "
            f"gc={sum(t['gc'] for t in ts)/1000:6.1f}s deser={sum(t['deser'] for t in ts)/1000:5.1f}s "
            f"in={sum(t['input_mb'] for t in ts):8.0f}MB "
            f"maxtask={max((t['finish']-t['launch']) for t in ts)/1000:6.2f}s"
        )
    # idle gaps: time not covered by any stage span
    spans.sort()
    gap = 0.0
    cur_end = None
    for a, b in spans:
        if cur_end is not None and a > cur_end:
            gap += (a - cur_end) / 1000
        cur_end = b if cur_end is None else max(cur_end, b)
    print(f"inter-stage idle (driver) time: {gap:.1f}s over {len(spans)} stages")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
