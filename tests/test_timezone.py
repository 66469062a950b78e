"""Timezone-defense regression tests.

The driver hands each registered query ITS OWN SparkSession — the engine
does not control that session's ``spark.sql.session.timeZone`` (nor the
host TZ the driver's JVM started under).  DuckDB, the correctness oracle,
is timezone-naive-UTC, so any key whose semantics touch timestamps
(windowing, date arithmetic, watermark drains) silently depends on the
session TZ being UTC at execution time.

The defense is ``ensure_engine_confs`` (etl_asana_spark/session.py), which
``load_table`` applies to whatever session arrives — re-pinning the
dynamic TZ conf to UTC before any plan is built.  These tests pin that
defense:

1. a session whose TZ conf was perturbed gets re-pinned by the first
   table load, and
2. a TZ-sensitive registered key still matches its DuckDB oracle when the
   session arrives mis-configured.

An end-to-end probe with a genuinely non-UTC JVM (``-Duser.timezone=
America/New_York`` + host TZ env) was run out-of-band in round 4 across
all 16 date/window/streaming-sensitive keys — all matched; that JVM-level
variant needs a second SparkSession so it stays out of the shared-session
suite, but the conf-level perturbation here exercises the same defense
line.
"""

from __future__ import annotations

from etl_asana_spark.registry import load_table
from etl_asana_spark.testing import check_query

#: Representative TZ-sensitive keys: a tumbling event-time window (bucket
#: boundaries shift under a non-UTC session TZ) and date-part arithmetic
#: (year/month extraction shifts across midnight-boundary instants).
_TZ_SENSITIVE_KEYS = ("q_win_tumbling", "q_fn_date")


def test_load_table_repins_session_timezone(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_tz_sensitive_keys_match_oracle_after_tz_perturbation(
    spark, duck, sf_dir
):
    for key in _TZ_SENSITIVE_KEYS:
        # Perturb before EVERY key: each registered query must re-pin on
        # its own (the driver may interleave foreign work between calls).
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            problems = check_query(spark, duck, key, sf_dir)
            assert not problems, f"{key} diverged under perturbed TZ: {problems}"
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
