"""wordcount_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``tdehoff/462MapReduceWordCount``
(a C++ OpenMP/MPI MapReduce word-count; see SURVEY.md), extended with
the relational / windowing / LLM-data-pipeline operator surface a
100 TB-scale training-data pipeline needs.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then always Arrow-batched).
"""

__version__ = "0.1.0"
