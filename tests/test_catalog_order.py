"""Catalog verification-rotation ordering (no SparkSession needed).

The external correctness gate checks a ~50-key prefix of ``queries()`` per
round, so the rotation's ordering rules ARE the coverage strategy:

1. never-verified (or last-failed) keys sort before verified ones;
2. within never-verified, OLDER generations first — a key added in a later
   round can never displace a key that has been waiting longer;
3. within a generation, cheaper keys first (more keys fit the time budget);
4. ``SPARK_GRAFT_STATIC_ORDER=1`` restores registration order exactly.
"""

from __future__ import annotations

import etl_asana_spark.catalog as catalog


def _order(monkeypatch, keys, verified, costs, gens, static=False):
    monkeypatch.setattr(catalog, "_last_verified_round", lambda: verified)
    monkeypatch.setattr(catalog, "_key_costs", lambda: costs)
    monkeypatch.setattr(catalog, "_key_generations", lambda: gens)
    if static:
        monkeypatch.setenv("SPARK_GRAFT_STATIC_ORDER", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_STATIC_ORDER", raising=False)
    return catalog._rotated(keys)


def test_unverified_before_verified(monkeypatch):
    got = _order(
        monkeypatch,
        ["a", "b", "c"],
        verified={"a": 1, "c": 2},
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
        verified={},
        costs={"old_slow": 9.0, "old_fast": 0.1, "new": 0.01},
        gens={"old_slow": 2, "old_fast": 2},
    )
    assert got == ["old_fast", "old_slow", "new"]


def test_cheapest_first_within_generation(monkeypatch):
    got = _order(
        monkeypatch,
        ["x", "y", "z"],
        verified={},
        costs={"x": 3.0, "y": 0.5, "z": 1.0},
        gens={"x": 1, "y": 1, "z": 1},
    )
    assert got == ["y", "z", "x"]


def test_failed_key_resorts_to_front(monkeypatch):
    # A key checked but FAILED is absent from _last_verified_round() output,
    # so it sorts with the never-verified group for re-verification.
    got = _order(
        monkeypatch,
        ["ok", "failed"],
        verified={"ok": 2},
        costs={"ok": 0.1, "failed": 0.1},
        gens={"ok": 1, "failed": 1},
    )
    assert got == ["failed", "ok"]


def test_static_order_flag(monkeypatch):
    keys = ["c", "a", "b"]
    got = _order(
        monkeypatch,
        keys,
        verified={"c": 1},
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
        return {}

    monkeypatch.setattr(catalog, "_last_verified_round", _boom)
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
