"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference healthcare ETL pipeline
(Rahul-Dabholkar/gcp-healthcare-data-pipeline): medallion zones
(landing -> bronze -> silver -> gold), config-driven incremental loads,
conformance + quarantine, SCD Type 2 history, and gold aggregate marts --
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Everything is declared through the DataFrame / Spark SQL API so Catalyst
and Tungsten pick the physical strategy; Python UDFs only appear where
built-ins genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
