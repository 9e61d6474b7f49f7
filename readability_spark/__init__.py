"""readability_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the Readability algorithm (the library
behind Firefox Reader View; reference behavior: vborovikov/readability and
the bundled Mozilla Readability.js) expressed Spark-first:

- the per-document extraction core is pure Python (``readability_spark.core``)
  executed as vectorized Arrow ``mapInPandas`` batches — no per-row Python
  fallback serialization, and the DOM never crosses the JVM boundary;
- everything around it (scan, salted repartition, checkpoint/resume anti-join,
  metrics, sinks) is plain DataFrame API so Catalyst optimizes it.

See SURVEY.md for the behavior inventory this implements.
"""

__version__ = "0.1.0"
