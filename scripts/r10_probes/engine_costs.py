import json, sys, time
sys.path.insert(0, "/root/repo")
from etl_asana_spark import catalog
from etl_asana_spark.session import build_session
spark = build_session(app_name="engine_costs")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
costs = json.load(open("/root/repo/scripts/key_costs.json"))
top = sorted(costs, key=lambda k: -costs[k])[:30]
qs = catalog.queries()
out = {}
for key in top:
    fn = qs[key]
    try:
        fn(spark, sf).collect()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter(); fn(spark, sf).collect(); ts.append(time.perf_counter() - t0)
        out[key] = round(min(ts), 3)
    except Exception as exc:
        out[key] = f"ERR {type(exc).__name__}"
for k in sorted(out, key=lambda k: -(out[k] if isinstance(out[k], float) else 0)):
    print(k, out[k])
