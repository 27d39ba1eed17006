"""Document JSON source/sink (S10).

The reference streams Documents as polymorphic JSON
(texoo-core/.../common/ObjectSerializer.java:60-118, Jackson `class` field,
base64 INDArray vectors). Spark mapping: one JSON object per turn/document
with explicit arrays — vectors become plain float arrays, annotations a
typed list — written/read via spark.read/write.json with a fixed schema
(no schema inference at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, FloatType, IntegerType,
                               StringType, StructField, StructType)

DOCUMENT_JSON_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("language", StringType()),
    StructField("type", StringType()),
    StructField("title", StringType()),
    StructField("source", StringType()),
    StructField("text", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("sentences", ArrayType(StructType([
        StructField("begin", IntegerType()),
        StructField("end", IntegerType()),
    ]))),
    StructField("annotations", ArrayType(StructType([
        StructField("class", StringType()),
        StructField("source", StringType()),
        StructField("begin", IntegerType()),
        StructField("end", IntegerType()),
        StructField("text", StringType()),
        StructField("label", StringType()),
        StructField("refId", StringType()),
        StructField("confidence", DoubleType()),
    ]))),
    StructField("vectors", ArrayType(StructType([
        StructField("name", StringType()),
        StructField("values", ArrayType(FloatType())),
    ]))),
])


def extracted_to_documents(extracted: DataFrame) -> DataFrame:
    """Extraction output -> Document-JSON rows (one per turn)."""
    sentences = F.transform(
        F.arrays_zip("sent_begin", "sent_end"),
        lambda s: F.struct(s["sent_begin"].alias("begin"),
                           s["sent_end"].alias("end")))
    return extracted.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
        .alias("id"),
        F.lit(None).cast("string").alias("language"),
        F.col("role").alias("type"),
        F.lit(None).cast("string").alias("title"),
        F.col("conv_id").alias("source"),
        F.col("extracted_text").alias("text"),
        F.lit(0).alias("begin"),
        F.length("extracted_text").cast("int").alias("end"),
        sentences.alias("sentences"),
        F.array().cast(DOCUMENT_JSON_SCHEMA["annotations"].dataType)
        .alias("annotations"),
        F.array().cast(DOCUMENT_JSON_SCHEMA["vectors"].dataType)
        .alias("vectors"),
    )


def write_documents_json(df: DataFrame, path: str,
                         mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_documents_json(spark, path: str) -> DataFrame:
    """Fixed-schema JSON read (no inference pass over 100 TB)."""
    return spark.read.schema(DOCUMENT_JSON_SCHEMA).json(path)
