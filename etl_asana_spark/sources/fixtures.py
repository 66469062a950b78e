"""Deterministic Asana-shaped ndjson fixtures (FIXTURES.md §B).

Offline stand-ins for the Asana REST API payloads the reference's extract
stage consumes (SURVEY §0.3 R1, reconstruction — empty snapshot). Shapes
follow the public API resource schemas (developers.asana.com): tasks with
nested assignee/projects/memberships/tags/custom_fields, projects, users,
stories. ``gid`` values are decimal strings and stay strings end-to-end.

Two task batches emulate incremental syncs: batch2 re-delivers a subset of
batch1 gids with advanced ``modified_at`` (upsert/incremental targets,
SURVEY §2.1 #7–#8) plus brand-new tasks.

Everything is seeded (seed=42, matching the testdata convention) so the
committed files, the generator, and the DuckDB oracles agree forever.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

#: Repo-level fixtures directory — committed output lives here so the DuckDB
#: oracle SQL can reference stable absolute paths.
FIXTURES_DIR = Path(__file__).resolve().parents[2] / "fixtures"

SEED = 42
N_TASKS = 200          # batch1
N_UPDATED = 40         # batch1 gids re-delivered in batch2, modified_at advanced
N_NEW = 40             # brand-new gids in batch2
N_USERS = 20
N_PROJECTS = 8
N_STORIES = 300

_TAG_POOL = [
    ("9990001", "bug"), ("9990002", "urgent"), ("9990003", "backend"),
    ("9990004", "frontend"), ("9990005", "design"), ("9990006", "infra"),
    ("9990007", "docs"), ("9990008", "qa"),
]
_SECTIONS = [("8880001", "Backlog"), ("8880002", "In Progress"), ("8880003", "Done")]
_PRIORITIES = ["Low", "Medium", "High", "Critical"]
_WORDS = (
    "fix update review deploy login search index cache retry flaky timeout "
    "migration schema parquet shuffle join window stream batch token api"
).split()


def _iso(day: int, hour: int, minute: int = 0) -> str:
    return f"2024-01-{day:02d}T{hour:02d}:{minute:02d}:00.000Z"


def _task(rng: random.Random, i: int, users: list[dict], projects: list[dict],
          modified_day: int) -> dict:
    gid = str(1201234567890000 + i)
    created_day = rng.randint(1, 10)
    name = " ".join(rng.sample(_WORDS, 3)).capitalize()
    assignee = rng.choice(users) if rng.random() > 0.15 else None
    n_tags = rng.choice([0, 0, 1, 2, 3])
    tags = [
        {"gid": g, "name": n}
        for g, n in rng.sample(_TAG_POOL, n_tags)
    ]
    proj = rng.choice(projects)
    memberships = [
        {
            "project": {"gid": proj["gid"]},
            "section": dict(zip(("gid", "name"), rng.choice(_SECTIONS))),
        }
    ]
    completed = rng.random() < 0.3
    custom_fields = [
        {"gid": "cf001", "name": "priority", "type": "enum",
         "display_value": rng.choice(_PRIORITIES)},
    ]
    if rng.random() > 0.25:
        custom_fields.append(
            {"gid": "cf002", "name": "estimate", "type": "number",
             "display_value": str(rng.choice([0.5, 1.0, 2.0, 3.5, 5.0, 8.0]))})
    if rng.random() > 0.5:
        custom_fields.append(
            {"gid": "cf003", "name": "team", "type": "text",
             "display_value": rng.choice(["core", "growth", "platform"])})
    parent = str(1201234567890000 + rng.randrange(i)) if i > 0 and rng.random() < 0.1 else None
    return {
        "gid": gid,
        "name": name,
        "notes": " ".join(rng.choices(_WORDS, k=rng.randint(0, 12))),
        "completed": completed,
        "completed_at": _iso(modified_day, rng.randint(0, 23)) if completed else None,
        "created_at": _iso(created_day, rng.randint(0, 23)),
        "modified_at": _iso(modified_day, rng.randint(0, 23), rng.randint(0, 59)),
        "due_on": f"2024-02-{rng.randint(1, 28):02d}" if rng.random() > 0.3 else None,
        "start_on": None,
        "assignee": {"gid": assignee["gid"], "name": assignee["name"]} if assignee else None,
        "parent": {"gid": parent} if parent else None,
        "projects": [{"gid": proj["gid"], "name": proj["name"]}],
        "memberships": memberships,
        "tags": tags,
        "num_likes": rng.randint(0, 5),
        "custom_fields": custom_fields,
    }


def generate(out_dir: Path | str = FIXTURES_DIR) -> dict[str, Path]:
    """Write all fixture files; deterministic for a given SEED. Returns paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(SEED)

    users = [
        {"gid": str(5550000 + i), "name": f"User {i}",
         "email": f"user{i}@example.com"}
        for i in range(N_USERS)
    ]
    projects = [
        {"gid": str(7770000 + i), "name": f"Project {chr(65 + i)}",
         "archived": i == N_PROJECTS - 1,
         "created_at": _iso(1, 9), "modified_at": _iso(15, 12),
         "team": {"gid": "6660001", "name": "Eng"},
         "workspace": {"gid": "4440001", "name": "Acme"}}
        for i in range(N_PROJECTS)
    ]

    batch1 = [_task(rng, i, users, projects, modified_day=rng.randint(10, 15))
              for i in range(N_TASKS)]
    # batch2: re-deliver N_UPDATED existing gids with later modified_at, plus new gids.
    updated_idx = rng.sample(range(N_TASKS), N_UPDATED)
    batch2 = []
    for i in updated_idx:
        t = _task(rng, i, users, projects, modified_day=rng.randint(20, 28))
        t["created_at"] = batch1[i]["created_at"]  # creation is immutable
        batch2.append(t)
    batch2 += [_task(rng, N_TASKS + j, users, projects, modified_day=rng.randint(20, 28))
               for j in range(N_NEW)]

    all_task_gids = [t["gid"] for t in batch1] + [t["gid"] for t in batch2[N_UPDATED:]]
    stories = [
        {"gid": str(3330000 + i), "task_gid": rng.choice(all_task_gids),
         "created_at": _iso(rng.randint(10, 28), rng.randint(0, 23)),
         "created_by": {"gid": rng.choice(users)["gid"]},
         "type": rng.choice(["comment", "system"]),
         "text": " ".join(rng.choices(_WORDS, k=rng.randint(1, 8)))}
        for i in range(N_STORIES)
    ]

    paths = {}
    for name, rows in (
        ("tasks_batch1", batch1), ("tasks_batch2", batch2),
        ("projects", projects), ("users", users), ("stories", stories),
    ):
        p = out / f"{name}.ndjson"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r, separators=(",", ":")) + "\n")
        paths[name] = p

    # A deliberately dirty webhook feed for the malformed-record path
    # (q_ingest_badlines): ~15% of lines are STRUCTURALLY invalid JSON
    # (truncated / plain garbage). Valid lines are always type-correct, so
    # engines agree on exactly which lines are corrupt.
    dirty = out / "events_feed_dirty.ndjson"
    with open(dirty, "w") as f:
        for i in range(250):
            row = {
                "event_id": 9000000 + i,
                "type": rng.choice(["task_added", "task_changed", "story_added"]),
                "value": round(rng.uniform(0, 100), 3),
            }
            line = json.dumps(row, separators=(",", ":"))
            roll = rng.random()
            if roll < 0.08:
                line = line[: len(line) // 2]  # truncated JSON
            elif roll < 0.15:
                line = f"garbage line {i} not json"
            f.write(line + "\n")
    paths["events_feed_dirty"] = dirty
    return paths


def ensure_fixtures(out_dir: Path | str = FIXTURES_DIR) -> Path:
    """Generate the fixtures if any file is missing; return the directory."""
    out = Path(out_dir)
    expected = [
        "tasks_batch1", "tasks_batch2", "projects", "users", "stories",
        "events_feed_dirty",
    ]
    if not all((out / f"{n}.ndjson").exists() for n in expected):
        generate(out)
    return out


if __name__ == "__main__":
    for name, p in generate().items():
        print(name, p)
