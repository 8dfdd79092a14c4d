import sys, time
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark, suite
spark = get_spark("sp10")
qs = suite.queries()
for d in ["/root/testdata/sf0.01", "/root/testdata/sf0.1", "/root/repo/.scratch/sf1ish"]:
    df = qs["spearman_corr"](spark, d)
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(3):
        t0=time.time()
        qs["spearman_corr"](spark, d).write.format("noop").mode("overwrite").save()
        ts.append(time.time()-t0)
    ts.sort()
    print(d, "median", round(ts[1],3))
