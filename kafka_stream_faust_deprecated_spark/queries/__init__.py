"""Query library — importing this package registers every query.

Modules map to SURVEY.md §7 milestones:

* ``flagship``   — M0: batch twin of the reference's sliding SMA
* ``relational`` — M1: scans/filters/joins/aggs/sorts/set ops (E1-E4, E7, E12, E13)
* ``scalars``    — M2: string/date/math/array/JSON functions (E14-E18)
* ``analytic``   — M3: SQL window functions, rollup/cube, range + as-of
                   joins, approx distinct, batch dedup (E5-E6, E8-E11, E21)
* ``llm``        — M5: dedup / similarity / text analysis / multimodal
                   (E23-E26)
"""

from kafka_stream_faust_deprecated_spark.queries import flagship  # noqa: F401

# Imports are NOT guarded: a broken module must fail the registry load
# loudly, not silently shrink the verified query surface.
for _mod in ("relational", "scalars", "analytic", "temporal", "llm", "scale", "tpch"):
    __import__(f"kafka_stream_faust_deprecated_spark.queries.{_mod}")
