"""Regenerate scripts/key_generations.json, preserving existing generations.

Every catalog key gets the round in which it first appeared: keys already in
the file keep their recorded generation; keys the catalog has but the file
lacks are stamped with the round passed on the command line (default: the
highest existing generation + 1). The catalog's verification rotation sorts
never-verified keys oldest-generation-first, so a key added in a later round
can never displace a key that has been waiting longer for external
verification (see etl_asana_spark/catalog.py::_key_generations).

Usage: python scripts/regen_key_generations.py [round]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from etl_asana_spark import catalog  # noqa: E402


def main() -> None:
    path = os.path.join(os.path.dirname(__file__), "key_generations.json")
    try:
        with open(path) as fh:
            gens = {k: int(v) for k, v in json.load(fh).items()}
    except (OSError, ValueError):
        gens = {}

    catalog.load_all()
    keys = set(catalog._QUERIES)
    rnd = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else (max(gens.values()) + 1 if gens else 1)
    )
    added = [k for k in sorted(keys) if k not in gens]
    for k in added:
        gens[k] = rnd
    dropped = [k for k in sorted(gens) if k not in keys]
    for k in dropped:
        del gens[k]

    with open(path, "w") as fh:
        json.dump(gens, fh, indent=0, sort_keys=True)
    print(f"{len(gens)} keys; +{len(added)} at generation {rnd}; -{len(dropped)} stale")


if __name__ == "__main__":
    main()
