"""tagminder_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of audiomuze/tagminder, re-expressed Spark-first.

Layout:
- ``session``    SparkSession factory tuned for local[N] and cluster scale.
- ``functions``  shared expression library (the reference's scalar-function
                 surface: blank/truthy/md5-validity predicates, multi-value
                 codec, album_root, date normalization, casing UDFs).
- ``operators``  relational + pipeline operators (diff-audit, dedupe family,
                 similarity search, window patterns, sequence analysis, graph).
- ``sources``    file catalog / table loaders / multimodal binary plumbing.
- ``streaming``  Structured Streaming variants of the ingest path.
- ``pipeline``   the reference's numbered pipeline steps as Spark jobs.

Everything is DataFrame/Catalyst-first: expressions over UDFs, broadcast
joins for dimensions, window functions for per-group patterns, and Pandas
UDFs only where built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"
