package graft.sources

import graft.SparkSpec
import java.nio.charset.Charset
import java.nio.file.Files

class CsvSpec extends SparkSpec {

  private def write(name: String, content: String, cs: String): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve(name)
    Files.write(f, content.getBytes(Charset.forName(cs)))
    f.toString
  }

  test("utf-8 file reads under the first encoding") {
    val p = write("a.csv", "id,name\n1,café\n2,plain\n", "UTF-8")
    val df = Csv.readWithEncodingFallback(spark, p)
    assert(df.count() == 2)
    assert(df.collect().map(_.getString(1)).contains("café"))
  }

  test("latin-1 file falls through to ISO-8859-1 without mojibake") {
    val p = write("b.csv", "id,name\n1,café\n", "ISO-8859-1")
    val df = Csv.readWithEncodingFallback(spark, p)
    val v = df.collect().head.getString(1)
    assert(v == "café", s"got $v")
  }

  test("cp1252 smart quotes fall through past ISO-8859-1") {
    // 0x93/0x94 are C1 controls in latin-1 but “ ” in windows-1252
    val p = write("c.csv", "id,name\n1,“quoted”\n", "windows-1252")
    val df = Csv.readWithEncodingFallback(spark, p)
    assert(df.collect().head.getString(1) == "“quoted”")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    import graft.operators.Relational
    // one hot key covering most of the fact
    val fact = ((1 to 1000).map(_ => (1, "hot")) ++ Seq((2, "cold"))).toDF("k", "v")
    val dim = Seq((1, "dim1"), (2, "dim2"), (3, "unused")).toDF("k", "d")
    val salted = Relational.saltedJoin(fact, dim, "k", 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() == 1001)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt must reach the physical join: build side fans out via
    // explode and the join keys carry __salt, splitting the hot key
    // across `salts` shuffle partitions
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
    assert(plan.toLowerCase.contains("generate explode") || plan.contains("Generate"))
  }
}
