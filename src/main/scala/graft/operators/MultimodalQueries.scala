package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  * The testdata has no real image/audio bytes, so the payload is the
  * utf-8 encoding of the document text and the "decode" is the
  * deterministic fake from [[Multimodal.FakeCodec]]; what's real
  * and tested here is the Spark-side shape — binary column, per-row
  * metadata extraction, stable content addressing.
  */
object MultimodalQueries extends QueryPack {

  import Multimodal.FakeCodec.{DimBase, DimMod, HeightMul}

  val queries: Map[String, Q] = Map(
    // Binary payload + metadata extraction ("image header parse" stand-in):
    // byte length, fake dims derived from the bytes, content address.
    "q56_binary_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), encode(col("text"), "UTF-8").as("payload"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          (length(col("payload")) % DimMod + DimBase).as("fake_width"),
          ((length(col("payload")) * HeightMul) % DimMod + DimBase).as("fake_height"),
          substring(md5(col("text")), 1, 8).as("content_addr"))
        .withColumn("aspect",
          col("fake_width").cast(DoubleType) / col("fake_height").cast(DoubleType))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q56_binary_meta" ->
      s"""SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         CAST(octet_length(encode(text)) % $DimMod + $DimBase AS INT) AS fake_width,
         CAST(octet_length(encode(text)) * $HeightMul % $DimMod + $DimBase AS INT) AS fake_height,
         substr(md5(text), 1, 8) AS content_addr,
         CAST(octet_length(encode(text)) % $DimMod + $DimBase AS DOUBLE) /
           CAST(octet_length(encode(text)) * $HeightMul % $DimMod + $DimBase AS DOUBLE) AS aspect
         FROM documents"""
  )
}
