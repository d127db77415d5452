"""hudi_spark_utilities_plus_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``sq-q/hudi-spark-utilities-plus`` (config-driven ingestion into keyed,
upsertable lake tables + an arbitrary Spark-SQL transform hook + streaming
CDC demux), re-expressed idiomatically on the PySpark DataFrame / SQL /
Structured Streaming stack, and extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout (see SURVEY.md §7):

- :mod:`.session`    — SparkSession builder with tuned defaults (ref A16)
- :mod:`.config`     — properties files + CLI overrides + prefix routing (A14/A15)
- :mod:`.lake`       — keyed upsertable lake tables (Hudi semantics, parquet fallback)
- :mod:`.operators`  — transform / flatten / dedup / similarity / text / multimodal
- :mod:`.sources`    — connector registry (excel/jdbc/mongo/es/file formats)
- :mod:`.streaming`  — CDC source emulation, multi-table demux sink, windows
- :mod:`.pipelines`  — the five importer CLI apps
- :mod:`.queries`    — named query registry backing ``__spark_entry__.queries()``
"""

__version__ = "0.1.0"
