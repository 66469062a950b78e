"""Catalog verification-rotation ordering (no SparkSession needed).

The external correctness gate checks a ~50-key prefix of ``queries()`` per
round, so the rotation's ordering rules ARE the coverage strategy:

1. keys whose LATEST driver check FAILED sort first of all — a fix must be
   externally re-proven the very next round, not rejoin the waiting pool;
2. never-verified keys sort before verified ones;
3. within never-verified, OLDER generations first — a key added in a later
   round can never displace a key that has been waiting longer;
4. within a generation, cheaper keys first (more keys fit the time budget);
5. ``SPARK_GRAFT_STATIC_ORDER=1`` restores registration order exactly.
"""

from __future__ import annotations

import etl_asana_spark.catalog as catalog


def _order(monkeypatch, keys, passed, costs, gens, failed=frozenset(),
           static=False, oracle_gens=None, hash_passed=None):
    # hash_passed=None keeps the pre-r07 semantics: every pass was a full
    # SQL hash pass (the subtier then never fires).
    hp = set(passed) if hash_passed is None else set(hash_passed)
    monkeypatch.setattr(
        catalog, "_driver_check_history", lambda: (passed, set(failed), hp)
    )
    monkeypatch.setattr(catalog, "_key_costs", lambda: costs)
    monkeypatch.setattr(catalog, "_key_generations", lambda: gens)
    monkeypatch.setattr(
        catalog, "_oracle_generations", lambda: dict(oracle_gens or {})
    )
    if static:
        monkeypatch.setenv("SPARK_GRAFT_STATIC_ORDER", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_STATIC_ORDER", raising=False)
    return catalog._rotated(keys)


def test_unverified_before_verified(monkeypatch):
    got = _order(
        monkeypatch,
        ["a", "b", "c"],
        passed={"a": 1, "c": 2},
        costs={},
        gens={"a": 1, "b": 1, "c": 1},
    )
    assert got == ["b", "a", "c"]  # never-verified, then oldest round first


def test_new_generation_queues_behind_waiting_keys(monkeypatch):
    # "new" was added in a later round (or missing from the snapshot file):
    # it must NOT displace old never-verified keys, even when cheaper.
    got = _order(
        monkeypatch,
        ["old_slow", "old_fast", "new"],
        passed={},
        costs={"old_slow": 9.0, "old_fast": 0.1, "new": 0.01},
        gens={"old_slow": 2, "old_fast": 2},
    )
    assert got == ["old_fast", "old_slow", "new"]


def test_cheapest_first_within_generation(monkeypatch):
    got = _order(
        monkeypatch,
        ["x", "y", "z"],
        passed={},
        costs={"x": 3.0, "y": 0.5, "z": 1.0},
        gens={"x": 1, "y": 1, "z": 1},
    )
    assert got == ["y", "z", "x"]


def test_failed_key_resorts_before_everything(monkeypatch):
    # A key whose latest check failed must lead the prefix — even ahead of
    # never-verified keys from older generations with lower cost. (The r02
    # q_cumulative_uniques red otherwise landed at position 94, outside the
    # ~50-key gate budget, and its fix would have gone unproven.)
    got = _order(
        monkeypatch,
        ["ok", "waiting_cheap", "failed_costly"],
        passed={"ok": 2},
        costs={"ok": 0.1, "waiting_cheap": 0.1, "failed_costly": 9.0},
        gens={"ok": 1, "waiting_cheap": 1, "failed_costly": 1},
        failed={"failed_costly"},
    )
    assert got == ["failed_costly", "waiting_cheap", "ok"]


def test_fail_then_pass_counts_as_passed(tmp_path):
    # A key that failed r01 and passed r02: the LATEST check decides, so it
    # must be in the passed map and not the failed set. Runs against
    # SYNTHETIC fixtures in a tmpdir — the r03 judge flagged the previous
    # version for asserting against the LIVE repo-root CORRECTNESS_r*.json
    # artifacts, which the driver mutates every round (the test went red the
    # moment CORRECTNESS_r03.json landed, with no engine change).
    import json

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad_hash = dict(ok, hash_match=False)
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": "TypeError: boom"}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"flaky": bad_hash, "steady": ok})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"flaky": ok, "crasher": crashed, "counted": rows_only})
    )
    passed, failed, hash_passed = catalog._driver_check_history(
        root=str(tmp_path)
    )
    assert passed.get("flaky") == 2          # latest check (r02) passed
    assert "flaky" not in failed
    assert passed.get("steady") == 1
    assert "crasher" in failed               # err recorded, never passed
    assert "crasher" not in passed
    assert passed.get("counted") == 2        # no_oracle + rows counts
    assert "counted" not in failed
    # hash evidence: full SQL passes only — the rows-only key has none
    assert {"flaky", "steady"} <= hash_passed
    assert "counted" not in hash_passed


def test_oracle_upgrade_requeues_key(monkeypatch):
    # r05 verdict item 1: a key gate-checked rows-only in round 1 whose SQL
    # oracle landed in round 5 must re-enter the never-verified pool — its
    # strongest check has never run externally. Without the oracle-generation
    # override it would keep its round-1 "passed" slot and sort behind every
    # round-2+ pass, outside the ~50-key gate prefix.
    got = _order(
        monkeypatch,
        ["upgraded", "waiting", "r2_pass"],
        passed={"upgraded": 1, "r2_pass": 2},
        costs={"upgraded": 5.0, "waiting": 0.1, "r2_pass": 0.1},
        gens={"upgraded": 1, "waiting": 1, "r2_pass": 1},
        oracle_gens={"upgraded": 5},
    )
    # never-verified pool: waiting (gen 1, cheap) then upgraded (gen 1,
    # costly) — both ahead of the genuinely-passed r2 key.
    assert got == ["waiting", "upgraded", "r2_pass"]


def test_oracle_generation_superseded_by_newer_pass(monkeypatch):
    # Once the driver hash-passes the key at round >= the oracle generation,
    # the entry is inert: the key sorts by its (new) pass round again.
    got = _order(
        monkeypatch,
        ["upgraded", "old_pass"],
        passed={"upgraded": 6, "old_pass": 2},
        costs={},
        gens={"upgraded": 1, "old_pass": 1},
        oracle_gens={"upgraded": 5},
    )
    assert got == ["old_pass", "upgraded"]


def test_oracle_generations_snapshot_is_sane():
    # Every entry in the live snapshot must name a registered key that HAS
    # an oracle (the file exists to re-queue oracle upgrades; an entry for a
    # rows-only or unknown key is a typo).
    catalog.load_all()
    ogens = catalog._oracle_generations()
    assert ogens, "snapshot missing or unreadable"
    unknown = sorted(set(ogens) - set(catalog._QUERIES))
    assert not unknown, f"oracle_generations.json names unknown keys: {unknown}"
    no_oracle = sorted(k for k in ogens if k not in catalog._ORACLES)
    assert not no_oracle, (
        f"oracle_generations.json names keys without oracles: {no_oracle}"
    )


def test_static_order_flag(monkeypatch):
    keys = ["c", "a", "b"]
    got = _order(
        monkeypatch,
        keys,
        passed={"c": 1},
        costs={"a": 9.0},
        gens={},
        static=True,
    )
    assert got == keys


def test_library_default_is_registration_order(monkeypatch):
    # catalog.queries() must NOT depend on repo-root artifacts by default;
    # only the gate-facing ordering reads them.
    calls = []

    def _boom():
        calls.append(1)
        return {}, set(), set()

    monkeypatch.setattr(catalog, "_driver_check_history", _boom)
    keys_default = list(catalog.queries())
    assert not calls, "default ordering consulted verification artifacts"
    keys_static = list(catalog.queries(ordering="registration"))
    assert keys_default == keys_static
    # the rotation path DOES consult them
    list(catalog.queries(ordering="verification-rotation"))
    assert calls


def test_unknown_ordering_rejected():
    import pytest

    with pytest.raises(ValueError):
        catalog.queries(ordering="nope")


def test_generation_snapshot_covers_catalog():
    # Every registered key must have a generation: a key missing from the
    # snapshot silently queues last (gen 999), which is only correct for
    # keys genuinely added after the last regen. Force the regen script to
    # be run whenever keys are added.
    gens = catalog._key_generations()
    catalog.load_all()
    missing = sorted(set(catalog._QUERIES) - set(gens))
    assert not missing, f"run scripts/regen_key_generations.py: {missing}"


def test_oracle_text_changes_are_requeued():
    """r06 verdict item 8: an oracle edit must never coast on a stale
    driver pass. scripts/oracle_hashes.json snapshots md5(normalized SQL)
    per key; scripts/regen_oracle_hashes.py is the only sane way to update
    it, and that script bumps oracle_generations.json for every changed
    key (re-entering it into the never-verified rotation pool). This test
    fails the moment a registered oracle's text drifts from the snapshot."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "regen_oracle_hashes", os.path.join(repo, "scripts", "regen_oracle_hashes.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    with open(os.path.join(repo, "scripts", "oracle_hashes.json")) as fh:
        snapshot = json.load(fh)
    current = mod.current_hashes()
    drifted = sorted(
        k for k in set(snapshot) | set(current)
        if snapshot.get(k) != current.get(k)
    )
    assert not drifted, (
        "oracle SQL changed without bookkeeping — run "
        f"scripts/regen_oracle_hashes.py (drifted: {drifted})"
    )


def test_corrupt_oracle_generations_warns_not_silently_disables(tmp_path):
    """r06 advice: a typo'd hand edit of oracle_generations.json must warn
    loudly instead of silently disabling the re-queue fix."""
    import warnings

    scripts = tmp_path / "scripts"
    scripts.mkdir()
    (scripts / "oracle_generations.json").write_text("{not json")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = catalog._oracle_generations(root=str(tmp_path))
    assert got == {}
    assert any("re-queueing is DISABLED" in str(w.message) for w in caught)

    # a parseable non-object degrades the same way, also loudly
    (scripts / "oracle_generations.json").write_text("[1, 2]\n")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = catalog._oracle_generations(root=str(tmp_path))
    assert got == {}
    assert any("re-queueing is DISABLED" in str(w.message) for w in caught)

    # an ABSENT file is a legitimate no-upgrades state: silent no-op
    (scripts / "oracle_generations.json").unlink()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert catalog._oracle_generations(root=str(tmp_path)) == {}
    assert not caught


def test_oracle_generations_file_roundtrips_with_newline():
    """r06 advice: the live hand-curated file must parse as strict JSON and
    end with a newline (a truncated or typo'd edit fails here before it can
    silently disable re-queueing at the gate)."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "scripts", "oracle_generations.json")
    with open(path) as fh:
        raw = fh.read()
    assert raw.endswith("\n"), "file must end with a trailing newline"
    data = json.loads(raw)
    assert isinstance(data, dict) and data
    assert all(isinstance(v, int) for v in data.values())


def test_rows_only_upgrades_outrank_oracle_refreshes(monkeypatch):
    """r07: within the never-verified pool, a key whose ONLY pass evidence
    is rows-only and which NOW has an oracle (first-ever SQL check) sorts
    before a key re-queued for an oracle edit (which already hash-passed
    an earlier form) — even when the upgrade is more expensive. Keys never
    checked at all keep ordinary generation precedence."""
    monkeypatch.setitem(catalog._ORACLES, "upgraded_rows_only", "SELECT 1")
    monkeypatch.setitem(catalog._ORACLES, "refreshed_oracle", "SELECT 2")
    monkeypatch.setitem(catalog._ORACLES, "brand_new", "SELECT 3")
    got = _order(
        monkeypatch,
        ["brand_new", "refreshed_oracle", "upgraded_rows_only"],
        passed={"refreshed_oracle": 3, "upgraded_rows_only": 4},
        costs={"upgraded_rows_only": 9.0, "refreshed_oracle": 0.1},
        gens={"refreshed_oracle": 1, "upgraded_rows_only": 1},
        oracle_gens={"refreshed_oracle": 7, "upgraded_rows_only": 7},
        hash_passed={"refreshed_oracle"},  # rows-only key never hash-passed
    )
    assert got == ["upgraded_rows_only", "refreshed_oracle", "brand_new"]

    # a FAILED key still beats everything, upgrades included
    got = _order(
        monkeypatch,
        ["upgraded_rows_only", "broken"],
        passed={"upgraded_rows_only": 4, "broken": 2},
        costs={},
        gens={"upgraded_rows_only": 1, "broken": 1},
        oracle_gens={"upgraded_rows_only": 7},
        failed={"broken"},
        hash_passed=set(),
    )
    assert got == ["broken", "upgraded_rows_only"]
