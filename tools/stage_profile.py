#!/usr/bin/env python3
"""Summarize a Spark event log: per-stage wall time, task-time sum, max task,
shuffle read/write, spill. Usage: stage_profile.py <eventlog-file> [topN]"""
import json
import sys


def main(path, top=25):
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0, "sh_r": 0,
                                             "sh_w": 0, "spill": 0})
                st["name"] = si["Stage Name"]
                # Failed/skipped stages can miss a timestamp; a 0 default
                # would report the absolute completion epoch as wall time.
                if "Completion Time" in si and "Submission Time" in si:
                    st["wall_ms"] = (si["Completion Time"] -
                                     si["Submission Time"])
                else:
                    st["wall_ms"] = 0
                st["n"] = si["Number of Tasks"]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                st = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0, "sh_r": 0,
                                             "sh_w": 0, "spill": 0})
                ti = e.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["tasks"] += 1
                st["task_ms"] += dur
                st["max_task_ms"] = max(st["max_task_ms"], dur)
                m = e.get("Task Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["sh_r"] += (sr.get("Remote Bytes Read", 0) +
                               sr.get("Local Bytes Read", 0))
                st["sh_w"] += sw.get("Shuffle Bytes Written", 0)
                st["spill"] += m.get("Disk Bytes Spilled", 0)

    rows = sorted(stages.items(), key=lambda kv: -kv[1].get("task_ms", 0))
    print(f"{'sid':>4} {'wall_s':>7} {'tasksum_s':>9} {'maxtask_s':>9} "
          f"{'ntask':>5} {'shR_GB':>7} {'shW_GB':>7} {'spill_GB':>8}  name")
    for sid, st in rows[:top]:
        print(f"{sid:>4} {st.get('wall_ms', 0)/1e3:>7.1f} "
              f"{st['task_ms']/1e3:>9.1f} {st['max_task_ms']/1e3:>9.1f} "
              f"{st['tasks']:>5} {st['sh_r']/2**30:>7.2f} "
              f"{st['sh_w']/2**30:>7.2f} {st['spill']/2**30:>8.2f}  "
              f"{st.get('name', '?')[:60]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
