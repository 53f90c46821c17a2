"""Operator library.

Each module re-expresses a slice of the reference's operator inventory
(SURVEY.md §2) — or a scale-oriented extension of it — as composable
DataFrame transforms. All transforms are ``DataFrame -> DataFrame`` (usable
with ``df.transform``) and stay JVM-side (built-in Column expressions) unless
the semantics genuinely require Python, in which case Arrow-batched pandas
UDFs are used.
"""
