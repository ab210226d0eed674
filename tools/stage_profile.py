#!/usr/bin/env python3
"""Summarize a Spark event log: top stages by total executor run time.
Dev-only profiling aid (pairs with SPARK_GRAFT_EVENTLOG)."""
import collections
import glob
import json
import sys


def files(root):
    out = []
    for p in glob.glob(root + "/*"):
        if p.endswith(".inprogress") or "eventlog_v2" in p:
            out.extend(g for g in glob.glob(p + "/events*") ) or out.append(p)
        else:
            out.append(p)
    return [f for f in out if "appstatus" not in f]


def main(root):
    run = collections.Counter()
    write = collections.Counter()
    read = collections.Counter()
    names = {}
    ntasks = collections.Counter()
    for f in files(root):
        for line in open(f):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageSubmitted" or ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                names[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:90]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                run[sid] += m.get("Executor Run Time", 0)
                ntasks[sid] += 1
                sw = m.get("Shuffle Write Metrics") or {}
                write[sid] += sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                read[sid] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
    total = sum(run.values())
    print(f"total executor run time: {total/1000:.1f}s across {len(run)} stages")
    for sid, t in run.most_common(25):
        print(f"stage {sid:4d} {t/1000:8.1f}s tasks={ntasks[sid]:4d} "
              f"wr={write[sid]/1e6:8.1f}MB rd={read[sid]/1e6:8.1f}MB  {names.get(sid,'?')}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events")
