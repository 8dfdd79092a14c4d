import sys
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark
import __spark_entry__ as entry_mod
from pandas_spark.operators.diagnostics import plan_report
from tests.test_plan_gate import SINGLE_PARTITION_OK
spark = get_spark("audit")
SF = "/root/testdata/sf0.001"
still, freed = [], []
for name in sorted(SINGLE_PARTITION_OK):
    try:
        r = plan_report(entry_mod.queries()[name](spark, SF))
        (still if r["single_partition_exchanges"] else freed).append(name)
    except Exception as e:
        still.append(f"{name} (ERR {type(e).__name__})")
print("FREED (no real single-partition exchange left):")
for n in freed: print("  ", n)
print("STILL NEEDED:")
for n in still: print("  ", n)
# spearman specifically
r = plan_report(entry_mod.queries()["spearman_corr"](spark, SF))
print("spearman_corr report:", {k: r[k] for k in ("shuffles","single_partition_exchanges","global_agg_exchanges")})
