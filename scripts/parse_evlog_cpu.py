#!/usr/bin/env python3
"""Sum per-stage executor CPU / run time from a Spark event log dir.

Usage: parse_evlog_cpu.py /tmp/evlogs_new [/tmp/evlogs_mid ...]
For each dir: finds the newest event log file, aggregates task metrics
by stage, prints total CPU seconds and the top-5 CPU stages with their
names — the bucket-loop aggregate stage is the one the r12 loop A/B
attributes its effect to (wall-clock at sf10-he is noise-dominated on
the shared disk; CPU seconds are not)."""
import json, os, sys, glob


def _zstd_lines(part):
    """Decompress one .zstd event-log part, trying in order: the
    python zstandard module, the zstd CLI, then the committed
    scripts/Zcat.java helper (compiled on demand against Spark's own
    zstd-jni jar). Raises with a clear message naming all three if
    none is available."""
    import subprocess
    try:
        import zstandard
        with open(part, "rb") as f:
            # read_across_frames: a rolling part can hold multiple zstd
            # frames; the default stops at the first frame's end and
            # silently truncates the log (dropping later TaskEnds).
            data = zstandard.ZstdDecompressor().stream_reader(
                f, read_across_frames=True).read()
        return data.decode().splitlines()
    except ImportError:
        pass
    try:
        p = subprocess.run(["zstd", "-dc", part],
                           capture_output=True, check=True)
        return p.stdout.decode().splitlines()
    except (FileNotFoundError, subprocess.CalledProcessError):
        pass
    helper_src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "Zcat.java")
    helper_dir = "/tmp/graft_zcat_classes"
    cls = os.path.join(helper_dir, "Zcat.class")
    if not os.path.exists(cls):
        os.makedirs(helper_dir, exist_ok=True)
        c = subprocess.run(
            ["javac", "-cp", "/opt/spark/jars/*", "-d", helper_dir,
             helper_src], capture_output=True)
        if c.returncode != 0:
            raise RuntimeError(
                f"cannot decompress {part}: no python zstandard module, "
                f"no zstd CLI, and compiling {helper_src} failed:\n"
                + c.stderr.decode())
    p = subprocess.run(
        ["java", "-cp", f"{helper_dir}:/opt/spark/jars/*", "Zcat", part],
        capture_output=True)
    if p.returncode != 0:
        raise RuntimeError(
            f"Zcat helper failed on {part}:\n" + p.stderr.decode())
    return p.stdout.decode().splitlines()


def open_log(d):
    """Yield lines across ALL rolling parts (events_1..N, +zstd).
    Reading only the newest part silently drops completed stages —
    exactly the mistake that misattributed the r12 loop A/B on first
    parse."""
    cands = glob.glob(os.path.join(d, "*"))
    if not cands:
        raise SystemExit(
            f"{d}: no event log found (empty or missing dir — did the "
            "bench run crash before spark.eventLog wrote anything?)")
    log = max(cands, key=os.path.getmtime)
    parts = [log]
    if os.path.isdir(log):
        parts = sorted(
            glob.glob(os.path.join(log, "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]))
        assert parts, f"no events_* in {log}"
    for part in parts:
        if part.endswith(".zstd"):
            for line in _zstd_lines(part):
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
