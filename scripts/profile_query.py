"""Profile one or more registry queries: run each through the noop sink
with the Spark event log enabled, then parse the log into a per-job /
per-stage breakdown (wall, task time, shuffle bytes, python eval
presence). The UI is disabled in this sandbox, so the event log is the
only stage-level evidence available (guide §1.1/§7.1).

Usage: python scripts/profile_query.py q1 [q2 ...]
       SPARK_GRAFT_PROFILE_RUNS=2 python scripts/profile_query.py q1
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))
EVDIR = "/tmp/spark-events-profile"


def summarize(log_path: str, t_mark: float, t_end: float = float("inf")) -> None:
    """Print per-job wall + per-stage task-time/shuffle summary for
    everything submitted in [t_mark, t_end) (ms epoch)."""
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(log_path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                if not (t_mark <= ev["Submission Time"] < t_end):
                    continue
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                # merge, don't replace: TaskEnd events for this stage
                # have already accumulated task_ms/shuffle bytes
                stages.setdefault(sid, {}).update(
                    {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "n_tasks": si["Number of Tasks"],
                        "t0": si.get("Submission Time", 0),
                        "t1": si.get("Completion Time", 0),
                    }
                )
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                # Spark 4 event logs carry task metrics as
                # internal.metrics.* accumulables under Task Info
                acc = {
                    a["Name"]: a.get("Update", 0)
                    for a in (ev.get("Task Info") or {}).get(
                        "Accumulables", []
                    )
                    if a["Name"].startswith("internal.metrics.")
                }
                p = "internal.metrics."
                st["task_ms"] = st.get("task_ms", 0) + acc.get(
                    p + "executorRunTime", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + acc.get(
                    p + "jvmGCTime", 0
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + acc.get(
                    p + "shuffle.read.fetchWaitTime", 0
                )
                st["sh_read"] = (
                    st.get("sh_read", 0)
                    + acc.get(p + "shuffle.read.remoteBytesRead", 0)
                    + acc.get(p + "shuffle.read.localBytesRead", 0)
                )
                st["sh_write"] = st.get("sh_write", 0) + acc.get(
                    p + "shuffle.write.bytesWritten", 0
                )

    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        print(f"  job {jid:3d} {wall:7.3f}s  {j['desc']}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or "t1" not in s or not s.get("t1"):
                continue
            swall = (s["t1"] - s["t0"]) / 1000.0
            print(
                f"    stage {sid:3d} {swall:6.3f}s wall"
                f" {s.get('task_ms', 0) / 1000.0:7.2f}s task"
                f" gc {s.get('gc_ms', 0) / 1000.0:5.2f}s"
                f" fw {s.get('fetch_ms', 0) / 1000.0:5.2f}s"
                f" {s.get('n_tasks', 0):4d}t"
                f" shR {s.get('sh_read', 0) / 1e6:7.2f}MB"
                f" shW {s.get('sh_write', 0) / 1e6:7.2f}MB"
                f"  {s.get('name', '?')}"
            )


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py query [query ...]", file=sys.stderr)
        sys.exit(2)

    os.makedirs(EVDIR, exist_ok=True)
    import shutil
    for old in glob.glob(f"{EVDIR}/*"):
        shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)

    from hours_api_clickup_spark.plans.registry import QUERIES
    from hours_api_clickup_spark.session import get_spark

    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            # Spark 4 defaults to the rolling (directory) event log,
            # which the single-file reader below cannot open
            "spark.eventLog.rolling.enabled": "false",
            # ... and to compressing the log (zstd), which open() can't read
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    marks: list[tuple[str, float, float]] = []
    for name in names:
        fn = QUERIES[name].fn
        # warm runs first so the profiled run sees steady state
        for i in range(max(N_RUNS - 1, 0)):
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        t_mark = time.time() * 1000.0
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        marks.append((name, t_mark, dt))
    spark.stop()  # closes (and renames) the event log
    time.sleep(1.0)
    logs = sorted(glob.glob(f"{EVDIR}/*"), key=os.path.getmtime)
    if not logs:
        print("no event log found", file=sys.stderr)
        sys.exit(1)
    for i, (name, t_mark, dt) in enumerate(marks):
        t_next = marks[i + 1][1] if i + 1 < len(marks) else float("inf")
        print(f"\n=== {name}: {dt:.3f}s (steady-state profiled run) ===")
        summarize(logs[-1], t_mark, t_next)


if __name__ == "__main__":
    main()
