import sys, time
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark
spark = get_spark("floor")

def med(fn, n=7):
    ts = []
    for _ in range(n):
        t0 = time.time(); fn(); ts.append(time.time()-t0)
    ts.sort(); return round(ts[n//2]*1000,1)

r = spark.range(1)
r.write.format("noop").mode("overwrite").save()
print("range1_noop_ms", med(lambda: spark.range(1).write.format("noop").mode("overwrite").save()))
print("range1_count_ms", med(lambda: spark.range(1).count()))
print("range1_collect_ms", med(lambda: spark.range(1).collect()))
spark.conf.set("spark.sql.adaptive.enabled", "false")
print("AQE off:")
print("range1_noop_ms", med(lambda: spark.range(1).write.format("noop").mode("overwrite").save()))
g = spark.range(1000).groupBy("id").count()
g.write.format("noop").mode("overwrite").save()
print("groupby1k_noop_ms", med(lambda: spark.range(1000).groupBy("id").count().write.format("noop").mode("overwrite").save()))
spark.conf.set("spark.sql.adaptive.enabled", "true")
print("AQE on:")
print("groupby1k_noop_ms", med(lambda: spark.range(1000).groupBy("id").count().write.format("noop").mode("overwrite").save()))
