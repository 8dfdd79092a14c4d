"""Profile jobs/stages/tasks per floor-bound headline query at sf0.1."""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark, suite

spark = get_spark("profile")
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"
qs = suite.queries()
NAMES = ["resample_1h", "join_multi_star", "join_left", "merge_asof_backward", "topk_orders"]

# warmup all
for n in NAMES:
    qs[n](spark, SF).write.format("noop").mode("overwrite").save()

tracker = sc.statusTracker()
for n in NAMES:
    jobs0 = set(tracker.getJobIdsForGroup(None) or [])
    # use job group to isolate
    sc.setJobGroup(n, n)
    t0 = time.time()
    qs[n](spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    jids = tracker.getJobIdsForGroup(n) or []
    nstages = 0
    ntasks = 0
    for j in jids:
        ji = tracker.getJobInfo(j)
        if ji:
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    nstages += 1
                    ntasks += si.numTasks
    print(json.dumps({"q": n, "sec": round(dt,3), "jobs": len(jids), "stages": nstages, "tasks": ntasks}))
    sc.setJobGroup("", "")
