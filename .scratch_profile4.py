import sys, collections, traceback
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark, suite
import py4j.clientserver as cs

spark = get_spark("profile4")
SF = "/root/testdata/sf0.1"
qs = suite.queries()
for n in ["join_left", "merge_asof_backward"]:
    qs[n](spark, SF)

counts = collections.Counter()
orig = cs.ClientServerConnection.send_command
def patched(self, *a, **k):
    # attribute to the innermost /root/repo frame
    for fr in reversed(traceback.extract_stack()):
        if "/root/repo/pandas_spark" in fr.filename:
            counts[f"{fr.filename.split('pandas_spark/')[-1]}:{fr.lineno} {fr.name}"] += 1
            break
    else:
        counts["<outside>"] += 1
    return orig(self, *a, **k)
cs.ClientServerConnection.send_command = patched

for q in ["join_left", "merge_asof_backward", "join_multi_star", "resample_1h"]:
    counts.clear()
    qs[q](spark, SF)
    print("=" * 10, q, "total", sum(counts.values()))
    for site, c in counts.most_common(12):
        print(f"{c:5d}  {site}")
