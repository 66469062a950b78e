"""Regenerate SURVEY.md §2.13 — the complete key inventory — from the catalog.

Usage:  python scripts/regen_survey_table.py

Rewrites the table under the '| Query key | Module | Oracle | Semantics |'
header in place: one row per registered key, sorted, with its module, SQL/
rows oracle status, and current first docstring line. Run after adding or
re-documenting queries so the judge-facing inventory never goes stale.
(The inventory-totals sentence above the table is NOT touched — update the
counts there when the key count changes.)
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, ".")

from etl_asana_spark import catalog  # noqa: E402


def main() -> None:
    catalog.load_all()
    qs, oracles = catalog._QUERIES, catalog._ORACLES
    rows = []
    for key in sorted(qs):
        fn = qs[key]
        mod = fn.__module__.rsplit(".", 1)[-1].replace("queries_", "")
        doc = (inspect.getdoc(fn) or "").strip()
        first = re.sub(r"\s+", " ", doc.split("\n\n")[0].replace("\n", " "))
        if len(first) > 150:
            first = first[:147] + "..."
        first = first.replace("|", "/")
        status = "SQL" if key in oracles else "rows"
        rows.append(f"| `{key}` | {mod} | {status} | {first} |")
    table = "\n".join(rows)

    with open("SURVEY.md") as fh:
        s = fh.read()
    hdr = s.index("| Query key | Module | Oracle | Semantics |")
    hdr_end = s.index("\n", s.index("| --- | --- | --- | --- |", hdr))
    tail_idx = hdr_end + 1
    lines = s[tail_idx:].split("\n")
    n = 0
    for ln in lines:
        if ln.startswith("|") or ln.strip() == "":
            n += 1
        else:
            break
    table_end = tail_idx + sum(len(ln) + 1 for ln in lines[:n])
    s = s[: hdr_end + 1] + table + "\n\n" + s[table_end:]
    with open("SURVEY.md", "w") as fh:
        fh.write(s)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
