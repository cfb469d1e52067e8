#!/usr/bin/env python3
"""Sum per-stage executor CPU / run time from a Spark event log dir.

Usage: parse_evlog_cpu.py /tmp/evlogs_new [/tmp/evlogs_mid ...]
For each dir: finds the newest event log file, aggregates task metrics
by stage, prints total CPU seconds and the top-5 CPU stages with their
names — the bucket-loop aggregate stage is the one the r12 loop A/B
attributes its effect to (wall-clock at sf10-he is noise-dominated on
the shared disk; CPU seconds are not)."""
import json, os, sys, glob


def open_log(d):
    """Yield lines across ALL rolling parts (events_1..N, +zstd).
    Reading only the newest part silently drops completed stages —
    exactly the mistake that misattributed the r12 loop A/B on first
    parse."""
    import subprocess
    cands = glob.glob(os.path.join(d, "*"))
    log = max(cands, key=os.path.getmtime)
    parts = [log]
    if os.path.isdir(log):
        parts = sorted(
            glob.glob(os.path.join(log, "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]))
        assert parts, f"no events_* in {log}"
    for part in parts:
        if part.endswith(".zstd"):
            # no zstd CLI / python module in the sandbox: lean on
            # Spark's own zstd-jni via the tiny /tmp/zcat helper
            p = subprocess.run(
                ["java", "-cp", "/tmp/zcat:/opt/spark/jars/*", "Zcat",
                 part], capture_output=True, check=True)
            for line in p.stdout.decode().splitlines():
                yield line
        else:
            with open(part) as f:
                for line in f:
                    yield line


def parse(d):
    cpu = {}   # stage id -> ns
    run = {}   # stage id -> ms
    names = {}
    srd = {}   # shuffle read bytes
    swr = {}   # shuffle write bytes
    spill = {}  # disk spill bytes
    if True:
        for line in open_log(d):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                names[si["Stage ID"]] = si["Stage Name"]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                cpu[sid] = cpu.get(sid, 0) + m.get("Executor CPU Time", 0)
                run[sid] = run.get(sid, 0) + m.get("Executor Run Time", 0)
                spill[sid] = spill.get(sid, 0) + m.get(
                    "Disk Bytes Spilled", 0)
                srd[sid] = srd.get(sid, 0) + (m.get(
                    "Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0) + (m.get(
                            "Shuffle Read Metrics") or {}).get(
                                "Local Bytes Read", 0)
                swr[sid] = swr.get(sid, 0) + (m.get(
                    "Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0)
    tot_cpu = sum(cpu.values()) / 1e9
    tot_run = sum(run.values()) / 1e3
    tot_spill = sum(spill.values()) / 2**30
    print(f"{d}: total_cpu={tot_cpu:.1f}s total_run={tot_run:.1f}s "
          f"spill={tot_spill:.1f}GiB stages={len(cpu)}")
    for sid in sorted(cpu, key=cpu.get, reverse=True)[:5]:
        nm = names.get(sid, "?").split("\n")[0][:60]
        print(f"  stage {sid}: cpu={cpu[sid]/1e9:8.1f}s "
              f"run={run[sid]/1e3:8.1f}s "
              f"srd={srd.get(sid,0)/2**30:6.2f}GiB "
              f"swr={swr.get(sid,0)/2**30:6.2f}GiB "
              f"spill={spill.get(sid,0)/2**30:6.2f}GiB  {nm}")


for d in sys.argv[1:]:
    parse(d)
