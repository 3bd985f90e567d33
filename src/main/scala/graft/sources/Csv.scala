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
    // A decode is rejected on U+FFFD (utf-8 failure under PERMISSIVE) or
    // C1 control chars U+0080–U+009F — ISO-8859-1 decodes EVERY byte
    // sequence, so cp1252 punctuation (0x93 smart quotes etc.) surfaces
    // as C1 controls there; without this check the fallback could never
    // reach windows-1252.
    def clean(s: String): Boolean =
      !s.exists(c => c == '\ufffd' || (c >= '\u0080' && c <= '\u009f'))
    val winner = Encodings.find { enc =>
      // NonFatal only: a catch-all would turn a transient read error
      // (executor loss, missing file) during the UTF-8 probe into
      // "UTF-8 is bad" and silently read the whole file as latin1
      // mojibake — and would swallow OOM-class errors outright. A
      // genuine charset failure surfaces as a (NonFatal) Spark decode
      // exception; anything fatal propagates.
      try {
        val rows = reader(spark, enc, schema).csv(path).limit(probeRows).collect()
        rows.forall(r => (0 until r.length).forall { i =>
          r.get(i) == null || clean(r.get(i).toString)
        })
      } catch { case scala.util.control.NonFatal(_) => false }
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
