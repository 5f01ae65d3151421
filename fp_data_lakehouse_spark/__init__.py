"""fp_data_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo kevin-079/FP-Data-Lakehouse
(batch ELT -> star schema -> 29-query analytic SQL corpus), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, broadcast
star joins, window functions, Structured Streaming for the events
stream, and Pandas-UDF plumbing only where built-ins cannot express
the semantics (PDF/byte decode, multimodal stubs).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle sizing)
- ``sources``    : parquet/text table catalog over the driver fixtures
- ``functions``  : scalar/text/vector column-expression kits
- ``operators``  : the relational operator corpus (SURVEY.md §2) +
                   dedup / similarity / text-analysis extensions,
                   each registered with a DuckDB oracle twin
- ``etl``        : the transcript star-schema pipeline (extraction
                   regexes, dim/fact builds, semester fact derivation)
- ``streaming``  : Structured Streaming ops over the events table
- ``multimodal`` : binary-column (image/audio) plumbing with stub codecs
"""

__version__ = "0.1.0"
