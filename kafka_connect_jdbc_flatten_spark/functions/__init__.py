"""Training-data pipeline functions layer.

Beyond the reference's CDC/flatten operators, a 100 TB ingest engine
needs the standard large-scale training-data ops.  Everything here is
built from JVM-side ``pyspark.sql.functions`` column expressions
(whole-stage codegen, no per-row Python) except the multimodal decode
plumbing, which uses Arrow-batched ``mapInPandas``.

Modules:

* ``text``       — token counting, quality scoring, language id,
  document fingerprinting.
* ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash,
  chunk-level exact-substring dedup with text reconstruction.
* ``lm``         — corpus-unigram LM quality scoring (CCNet-style).
* ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed
  scale path).
* ``multimodal`` — opaque binary columns + typed metadata, Arrow-batch
  feature extraction, stubbed decoders.

Each deterministic op also exposes a ``*_sql()`` generator producing
the equivalent DuckDB SQL from the same constants — the correctness
oracle used by the driver's verify step.
"""
