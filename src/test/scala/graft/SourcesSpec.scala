package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ColFns

/** Source surface (SURVEY.md §2.1). The reference's ONLY source is
  * `read-csv` with header + inferred schema
  * (`/root/reference/src/main.rs:570-578`, `CsvReadOptions::new()` defaults
  * at `src/main.rs:574`); the full end-to-end program in the reference is
  * test.scm over example.csv — replayed here through the real CSV reader.
  * Parquet/JSON/writers are the capability-superset scale path.
  */
class SourcesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("readCsv: header names + inferred int schema, then the test.scm pipeline") {
    val dir = tmpDir("graft-csv")
    // /root/reference/example.csv:1-3 verbatim
    Files.write(java.nio.file.Paths.get(s"$dir/example.csv"),
      "a,b,c\n1,2,3\n20,10,50\n".getBytes("UTF-8"))
    val df = Engine.readCsv(spark, s"$dir/example.csv")
    assert(df.schema.fields.map(_.name).toSeq == Seq("a", "b", "c"))
    assert(df.schema.fields.forall(_.dataType == IntegerType))
    // test.scm:11-14: select a,b; filter a >= b; collect
    val out = df
      .select(ColFns.column("a"), ColFns.column("b"))
      .filter(ColFns.geq(col("a"), col("b")))
      .collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((20, 10)))
  }

  test("parquet and csv writers round-trip") {
    val dir = tmpDir("graft-rt")
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    Engine.writeParquet(df, s"$dir/p")
    assert(Engine.readParquet(spark, s"$dir/p").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    Engine.writeCsv(df, s"$dir/c")
    assert(Engine.readCsv(spark, s"$dir/c").orderBy("id").collect().length == 2)
  }
}
