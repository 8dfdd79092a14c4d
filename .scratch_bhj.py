import sys
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark
from pyspark.sql import functions as F
spark = get_spark("bhj")
c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
j = F.broadcast(c).join(o, c["c_custkey"] == o["o_custkey"], "left")
j.explain()
