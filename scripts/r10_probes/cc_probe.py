import sys, time
sys.path.insert(0, "/root/repo")
from etl_asana_spark import catalog, pipelines
from etl_asana_spark.registry import load_tables
from etl_asana_spark.session import build_session
spark = build_session(app_name="cc_probe")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
fn = catalog.queries()["q_dedup_clusters"]
def run_key():
    fn(spark, sf).write.format("noop").mode("overwrite").save()
def run_pipe():
    docs = load_tables(spark, sf)["documents"]
    pipelines.curate_corpus(docs).curated.count()
for name, run, reps in (("q_dedup_clusters", run_key, 3), ("pipeline_curation", run_pipe, 3)):
    run()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")
