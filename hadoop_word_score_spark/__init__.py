"""hadoop_word_score_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference engine
``hopper19/hadoop-word-score`` (a 2-job Hadoop MapReduce word-score pipeline,
see ``/root/reference/src/main/java/edu/scranton/cs/se584/wordscore/ComputeWordScore.java``)
as an idiomatic Spark DataFrame/SQL engine, extended with the relational,
windowing, streaming, and LLM-data-pipeline operator surface described in
SURVEY.md §2.

Layout
------
- ``session``    : SparkSession bootstrap with scale-oriented defaults (AQE, UTC).
- ``sources``    : schema registry + readers/writers for the engine's tables.
- ``functions``  : scalar/column function library (text, hashing, vectors).
- ``operators``  : composed DataFrame operators (word-score, dedup, similarity,
                   as-of join, top-k, multimodal plumbing).
- ``plans``      : the named-query registry — every operator from SURVEY.md §2
                   exposed as a (spark, sf_dir) -> DataFrame callable with a
                   DuckDB oracle SQL string where SQL-expressible.
- ``streaming``  : Structured Streaming wrappers for the window operators.
"""

__version__ = "0.1.0"
