"""Large-scale training-data-pipeline operators (driver-mandated
extensions beyond the reference surface, BASELINE.json north star):
dedup, similarity search, text analysis, multimodal columns.

Design rule: the hot path is built-in `pyspark.sql.functions` (codegen,
no Python); Pandas UDFs appear only where vectorized numpy genuinely
wins (dense linear algebra over embeddings); every hash is derived from
md5 so the DuckDB oracle can replay the exact computation.
"""
