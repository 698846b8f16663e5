"""PySpark-native analytics/ETL engine with the capabilities of
riliasov/chilekids-etl-pipeline, re-expressed Spark-first.

Layers (mirroring the reference's raw → staging → marts design,
reference: configs/schema.sql):

- ``sources``   — readers for the parquet star schema + raw-layer ingestion
- ``functions`` — column-expression libraries (normalization, hashing, text)
- ``operators`` — composable DataFrame→DataFrame operators (incremental,
                  dedup, similarity, dimensions)
- ``plans``     — the end-user query catalog (marts, analytics, LLM-data ops)
- ``streaming`` — Structured Streaming version of the incremental pipeline
"""

__version__ = "0.1.0"
