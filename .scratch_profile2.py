import sys, time, json
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark, suite

spark = get_spark("profile2")
SF = "/root/testdata/sf0.1"
qs = suite.queries()
NAMES = ["resample_1h", "join_multi_star", "join_left", "merge_asof_backward"]
for n in NAMES:
    qs[n](spark, SF).write.format("noop").mode("overwrite").save()

for n in NAMES:
    # median of 5 for each phase
    builds, execs = [], []
    for _ in range(5):
        t0 = time.time()
        df = qs[n](spark, SF)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        builds.append(t1 - t0); execs.append(t2 - t1)
    builds.sort(); execs.sort()
    print(json.dumps({"q": n, "build_py": round(builds[2],3), "exec": round(execs[2],3)}))

# empty action floor: how long does a trivial 1-row action take?
e = []
for _ in range(5):
    t0 = time.time()
    spark.range(1).write.format("noop").mode("overwrite").save()
    e.append(time.time() - t0)
e.sort()
print(json.dumps({"q": "floor_range1", "exec": round(e[2],4)}))
# single shuffle floor
e = []
for _ in range(5):
    t0 = time.time()
    spark.range(1000).groupBy((spark.range(1).limit(0).sparkSession.range(1).selectExpr("1").columns and None) or "id").count().write.format("noop").mode("overwrite").save()
    e.append(time.time() - t0)
e.sort()
print(json.dumps({"q": "floor_groupby1k", "exec": round(e[2],4)}))
