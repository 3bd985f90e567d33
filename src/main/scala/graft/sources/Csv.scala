package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion with encoding fallback — the reference tries
  * utf-8 → latin1 → ISO-8859-1 → cp1252 until one parses
  * (reference: python/import_data.py:8-21). Spark's CSV reader does not
  * sniff encodings, so the fallback loop lives here: try each encoding
  * with FAILFAST on a schema-bearing read; the first that yields a
  * decodable, schema-valid frame wins.
  *
  * Scale note: the probe reads only `probeRows` rows (limit is pushed to
  * the scan); the winning encoding then streams the full file with the
  * normal parallel reader — no double full-scan.
  */
object Csv {

  val Encodings: Seq[String] = Seq("UTF-8", "ISO-8859-1", "windows-1252")

  def readWithEncodingFallback(spark: SparkSession, path: String,
                               schema: Option[StructType] = None,
                               probeRows: Int = 100): DataFrame = {
    val winner = Encodings.find { enc =>
      try {
        val probe = reader(spark, enc, schema).csv(path).limit(probeRows)
        probe.collect()
        // decodable AND no replacement chars (utf-8 decode of latin1
        // bytes yields U+FFFD under PERMISSIVE, not an exception)
        !probe.columns.exists(_ == null) &&
          probe.collect().forall(r => (0 until r.length).forall { i =>
            r.get(i) == null || !r.get(i).toString.contains('�')
          })
      } catch { case _: Throwable => false }
    }.getOrElse(throw new IllegalArgumentException(
      s"$path: no encoding in ${Encodings.mkString(",")} decodes cleanly"))
    reader(spark, winner, schema).csv(path)
  }

  private def reader(spark: SparkSession, enc: String, schema: Option[StructType]) = {
    val r = spark.read
      .option("header", "true")
      .option("encoding", enc)
      .option("mode", "FAILFAST")
    schema.map(r.schema).getOrElse(r.option("inferSchema", "false"))
  }
}
