"""Snapshot every registered oracle's SQL text hash, re-queueing changed keys.

Usage:
    python scripts/regen_oracle_hashes.py          # update snapshot + bump
    python scripts/regen_oracle_hashes.py --init   # snapshot only, no bumps

Why (r06 verdict item 8): ``scripts/oracle_generations.json`` — the file
that re-queues a key for external gate verification when its oracle is
newer than its last driver pass — was hand-curated, so an oracle edit that
forgot the bookkeeping would silently coast on stale pass evidence.
This script makes the bookkeeping mechanical:

- ``scripts/oracle_hashes.json`` holds md5(normalized oracle SQL) per key;
  tests/test_catalog_order.py fails whenever a registered oracle's current
  text no longer matches the snapshot, with instructions to run this script.
- Running it rewrites the snapshot AND bumps ``oracle_generations.json``
  for every changed key to the NEXT round (max CORRECTNESS_r*.json round
  + 1), so the changed oracle re-enters the never-verified pool and the
  external gate re-checks it before it can coast.

Normalization: absolute repo paths inside oracle text (fixture
``read_json`` sources) are replaced with ``<REPO>`` so the hash is
machine-location-independent; whitespace runs collapse so reformatting
is not a semantic change.
"""

from __future__ import annotations

import glob
import hashlib
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
HASHES = REPO / "scripts" / "oracle_hashes.json"
GENERATIONS = REPO / "scripts" / "oracle_generations.json"

sys.path.insert(0, str(REPO))


def normalized_hash(sql: str) -> str:
    text = sql.replace(str(REPO), "<REPO>")
    text = re.sub(r"\s+", " ", text).strip()
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def current_hashes() -> dict[str, str]:
    from etl_asana_spark import catalog

    catalog.load_all()
    return {k: normalized_hash(sql) for k, sql in catalog._ORACLES.items()}


def next_round() -> int:
    rounds = [0]
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> int:
    init = "--init" in sys.argv
    current = current_hashes()
    try:
        with open(HASHES) as fh:
            old = json.load(fh)
    except (OSError, ValueError):
        old = {}

    changed = sorted(k for k, h in current.items() if old.get(k) != h)
    removed = sorted(set(old) - set(current))

    # Bump generations BEFORE rewriting the hash snapshot: if this process
    # dies between the two writes (SIGPIPE from a piped run did exactly
    # that once), a stale snapshot re-detects the change on the next run,
    # whereas a fresh snapshot with unbumped generations would silently
    # skip the re-queue forever — the precise failure this script exists
    # to prevent.
    if changed and not init:
        with open(GENERATIONS) as fh:
            gens = json.load(fh)
        rnd = next_round()
        for k in changed:
            gens[k] = max(int(gens.get(k, 0)), rnd)
        with open(GENERATIONS, "w") as fh:
            json.dump(gens, fh, indent=0, sort_keys=True)
            fh.write("\n")

    with open(HASHES, "w") as fh:
        json.dump(current, fh, indent=0, sort_keys=True)
        fh.write("\n")

    print(f"snapshot: {len(current)} oracles, {len(changed)} changed, "
          f"{len(removed)} removed")
    if init:
        print("--init: oracle_generations.json left untouched")
    elif changed:
        rnd = next_round()
        for k in changed:
            print(f"re-queued {k} at generation {rnd}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
