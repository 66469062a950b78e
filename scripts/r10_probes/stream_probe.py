import sys, time
sys.path.insert(0, "/root/repo")
from etl_asana_spark import catalog
from etl_asana_spark.session import build_session
spark = build_session(app_name="stream_probe")
spark.sparkContext.setLogLevel("ERROR")
qs = catalog.queries()
keys = ["q_stream_tumbling", "q_stream_sliding", "q_stream_dedup", "q_stream_static_join",
        "q_stream_session", "q_stream_upsert", "q_stream_stream_join", "q_stream_source_sync"]
total = 0.0
for key in keys:
    fn = qs[key]
    fn(spark, "/root/testdata/sf0.01").collect()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); fn(spark, "/root/testdata/sf0.01").collect(); ts.append(time.perf_counter() - t0)
    total += min(ts)
    print(f"{key}: min={min(ts):.3f}")
# bench extra at sf0.1
fn = qs["q_stream_tumbling"]
fn(spark, "/root/testdata/sf0.1").collect()
ts = []
for _ in range(3):
    t0 = time.perf_counter(); fn(spark, "/root/testdata/sf0.1").collect(); ts.append(time.perf_counter() - t0)
print(f"q_stream_tumbling@sf0.1: min={min(ts):.3f}")
print(f"TOTAL sf0.01 8keys: {total:.3f}")
