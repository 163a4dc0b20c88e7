"""Multimodal pipeline query: binary payload -> mapInPandas feature extraction.

The only pandas-UDF query in the engine (everything else is pure built-ins);
it exists to prove the Arrow plumbing — binary columns, batch iteration,
typed output schema — against an oracle that recomputes the deterministic
fake features in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features
from . import query


@query(
    "multimodal_features",
    oracle="""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
                 ELSE -1 END AS BIGINT) AS first_byte
FROM documents
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing end-to-end: documents→payload adapter,
    mapInPandas (Arrow batches) feature extraction, metadata projection.
    The float feature vector is dropped from the oracle-compared output
    (doubles derived in Python; the byte stats fully pin the plumbing)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = documents_as_media(docs)
    feats = extract_features(media)
    return feats.select("media_id", "byte_len", "first_byte")
