import sys, time, cProfile, pstats, io as _io
sys.path.insert(0, "/root/repo")
from pandas_spark import get_spark, suite
spark = get_spark("profile3")
SF = "/root/testdata/sf0.1"
qs = suite.queries()
for n in ["join_left", "resample_1h", "merge_asof_backward", "join_multi_star"]:
    qs[n](spark, SF)
for n in ["join_left", "resample_1h", "merge_asof_backward", "join_multi_star"]:
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(3):
        qs[n](spark, SF)
    pr.disable()
    s = _io.StringIO()
    ps_ = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps_.print_stats(14)
    print("="*20, n)
    print("\n".join(s.getvalue().splitlines()[4:24]))
