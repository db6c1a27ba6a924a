"""Reusable column-expression and UDF building blocks.

Everything here is a *function library*, not a query: queries/ composes
these into registered, oracle-checked entries. Split by domain:

* ``text``       — normalization, tokenization, shingling, hashing
                   primitives for dedup / text analysis (E23, E25)
* ``vectors``    — dot/cosine expressions over ``array<float>``
                   embeddings + deterministic LSH hyperplanes (E24)
* ``multimodal`` — binary-payload plumbing and (stubbed) decoders for
                   image/audio columns (E26)

Design rule: JVM-side ``pyspark.sql.functions`` expressions wherever
possible; Python touches data only in the explicitly-Arrow-batched
multimodal path.
"""
