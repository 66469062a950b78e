"""Sources: external-data ingestion (SURVEY.md §2.1 #3–#9, §7 M8).

The reference's extract stage is a paginated REST loop against the Asana API
(SURVEY §0.3 R1 — reconstruction; the reference snapshot is empty, so no
file:line citations exist). This package re-expresses it Spark-first:

- ``fixtures`` — deterministic Asana-shaped ndjson generator (FIXTURES.md §B);
  the offline stand-in for the network (this machine has no DNS).
- ``asana`` — typed schemas, JSON ingest, nested→relational flattening,
  custom-field pivot, last-modified-wins upsert, incremental sync, and a
  distributed paginated fetcher (page-plan DataFrame → ``mapInPandas``).
"""
