#!/usr/bin/env python3
"""Per-job wall timeline from a Spark event log dir (dev tooling).

Usage: parse_evlog_jobs.py /tmp/evlogs [substr]
Prints every job (id, wall seconds, gap since previous job's end, task
count, job description / callsite) in submission order, plus the sum of
job walls and of gaps — the r15 finding was that at sf0.1 ~1/3 of bench
wall is DRIVER GAPS between jobs, so both columns matter. Optional
substr filters on the job description (e.g. "bench:dedup").
"""
import json, os, sys, glob, subprocess


def lines_of(d):
    apps = sorted(glob.glob(os.path.join(d, "eventlog_v2_*")),
                  key=os.path.getmtime)
    parts = sorted(glob.glob(os.path.join(apps[-1], "events_*")))
    out = []
    for p in parts:
        if p.endswith(".zstd"):
            # Zcat helper from parse_evlog_cpu's fallback chain: java
            # against Spark's own zstd-jni (handles multi-frame parts)
            helper_dir = "/tmp/graft_zcat_classes"
            src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "Zcat.java")
            if not os.path.exists(os.path.join(helper_dir, "Zcat.class")):
                os.makedirs(helper_dir, exist_ok=True)
                subprocess.run(["javac", "-cp", "/opt/spark/jars/*", "-d",
                                helper_dir, src], check=True)
            r = subprocess.run(
                ["java", "-cp", f"{helper_dir}:/opt/spark/jars/*", "Zcat", p],
                capture_output=True, check=True)
            out += r.stdout.decode(errors="replace").splitlines()
        else:
            out += open(p, errors="replace").read().splitlines()
    return out


def main(d, substr=None):
    jobs = {}
    stage_tasks = {}
    for ln in lines_of(d):
        try:
            e = json.loads(ln)
        except json.JSONDecodeError:
            continue
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get(
                "spark.job.description") or e.get("Properties", {}).get(
                "callSite.short", "")
            sids = [s["Stage ID"] for s in e.get("Stage Infos", [])]
            ntask = sum(s.get("Number of Tasks", 0)
                        for s in e.get("Stage Infos", []))
            jobs[jid] = {"start": e["Submission Time"], "desc": desc,
                         "stages": sids, "ntask": ntask, "end": None}
        elif t == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
    order = sorted(jobs.values(), key=lambda j: j["start"])
    if substr:
        order = [j for j in order if substr in (j["desc"] or "")]
    prev_end = None
    tot_wall = tot_gap = 0.0
    for j in order:
        wall = ((j["end"] or j["start"]) - j["start"]) / 1e3
        gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
        prev_end = j["end"] or j["start"]
        tot_wall += wall
        tot_gap += max(0.0, gap)
        print(f"wall={wall:7.3f}s gap={gap:7.3f}s tasks={j['ntask']:4d} "
              f"stages={j['stages']} {j['desc'][:90]}")
    print(f"TOTAL job wall {tot_wall:.3f}s, gaps {tot_gap:.3f}s "
          f"over {len(order)} jobs")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
