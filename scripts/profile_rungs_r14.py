"""Round-14 event-log profiler (VERDICT r13 #4): per-stage attribution
for named rungs using the `bench:<rung>` job labels added in r13.

Runs each named rung ONCE (after a warmup pass of the same rung so
codegen/index builds don't pollute the profile), with
spark.eventLog.enabled=true, then parses the event log into a per-rung
stage table: stage name, executor-run time, shuffle read/write bytes,
input bytes, task count, max/median task time (skew signal).

Usage: python scripts/profile_rungs_r14.py <rung> [rung ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from lakota_spark.session import get_spark  # noqa: E402


def main() -> None:
    rungs = sys.argv[1:]
    if not rungs:
        print("usage: profile_rungs_r14.py <rung> [rung ...]")
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="r14-eventlog-")
    spark = get_spark(
        "lakota-profile-r14",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # one plain-text file (rolled logs are zstd-compressed,
            # unreadable with the stdlib)
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["tpch_q1"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    for name in rungs:
        fn = qs[name]
        # warmup run absorbs one-off index/memo builds; the PROFILED run
        # is the steady-state shape the bench times
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(f"bench:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"RUN {name}: {time.perf_counter() - t0:.3f}s")
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ---------------------------------------
    entries = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".")
    ]
    assert len(entries) == 1, entries
    # Spark 4 rolled format: a directory holding events_* part files
    if os.path.isdir(entries[0]):
        files = sorted(
            os.path.join(entries[0], f)
            for f in os.listdir(entries[0])
            if f.startswith("events")
        )
    else:
        files = entries
    assert files, entries
    job_desc = {}       # jobId -> description
    stage_to_job = {}   # stageId -> jobId
    stages = {}         # stageId -> dict
    task_times = {}     # stageId -> [ms]
    def _lines():
        for path in files:
            with open(path) as fh:
                yield from fh

    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                for s in ev.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks"),
                    "run_ms": acc.get("internal.metrics.executorRunTime"),
                    "cpu_ns": acc.get("internal.metrics.executorCpuTime"),
                    "sh_read": acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0
                    )
                    or 0,
                    "sh_read_l": acc.get(
                        "internal.metrics.shuffle.read.localBytesRead", 0
                    )
                    or 0,
                    "sh_write": acc.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0
                    )
                    or 0,
                    "input": acc.get("internal.metrics.input.bytesRead", 0)
                    or 0,
                    "fetch_ms": acc.get(
                        "internal.metrics.shuffle.read.fetchWaitTime", 0
                    )
                    or 0,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                task_times.setdefault(sid, []).append(
                    (ti.get("Finish Time", 0) or 0)
                    - (ti.get("Launch Time", 0) or 0)
                )

    per_rung = {}
    for sid, st in sorted(stages.items()):
        jid = stage_to_job.get(sid)
        desc = job_desc.get(jid, "")
        if not desc.startswith("bench:"):
            continue
        rung = desc.split(":", 1)[1]
        tt = sorted(task_times.get(sid, [0]))
        st = dict(st)
        st["stage_id"] = sid
        st["task_max_ms"] = tt[-1]
        st["task_med_ms"] = tt[len(tt) // 2]
        per_rung.setdefault(rung, []).append(st)

    for rung in rungs:
        print(f"\n=== {rung} ===")
        rows = per_rung.get(rung, [])
        rows.sort(key=lambda s: -(s["run_ms"] or 0))
        tot = sum(s["run_ms"] or 0 for s in rows)
        print(
            f"stages={len(rows)} total_executor_run={tot}ms  "
            "(columns: run_ms cpu_ms tasks sh_read_mb sh_write_mb "
            "input_mb fetch_ms task_max/med_ms  name)"
        )
        for s in rows:
            print(
                f"  {s['run_ms'] or 0:>7} "
                f"{(s['cpu_ns'] or 0) // 1_000_000:>7} "
                f"{s['tasks']:>4} "
                f"{(s['sh_read'] + s['sh_read_l']) / 1e6:>8.1f} "
                f"{s['sh_write'] / 1e6:>8.1f} "
                f"{s['input'] / 1e6:>8.1f} "
                f"{s['fetch_ms']:>6} "
                f"{s['task_max_ms']:>6}/{s['task_med_ms']:<6} "
                f"{s['name'][:60]}"
            )
    print(f"\nevent log: {files}")


if __name__ == "__main__":
    main()
