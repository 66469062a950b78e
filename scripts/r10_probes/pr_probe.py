import sys, time
sys.path.insert(0, "/root/repo")
from etl_asana_spark import catalog
from etl_asana_spark.session import build_session
spark = build_session(app_name="pr_probe")
spark.sparkContext.setLogLevel("ERROR")
fn = catalog.queries()["q_graph_pagerank"]
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    def run():
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    run()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    print(f"{sf}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")
