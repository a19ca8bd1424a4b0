package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Schema evolution on the lake side, mirroring the reference's permissive
  * JSON contract (unknown fields ignored, missing fields → null,
  * SURVEY §1.3): a parquet dataset written in two generations — the
  * second adding a column — must read back under mergeSchema as the
  * union schema with nulls for the old generation, and column pruning
  * must still reach the scan.
  */
class SchemaEvolutionSpec extends SparkSuite {

  test("mergeSchema reads two parquet generations as the union schema") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-evo-").toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$tmp/gen=1")
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "score")
      .write.parquet(s"$tmp/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(merged.schema.fieldNames.toSet === Set("id", "v", "score", "gen"))

    val rows = merged.select(col("id"), col("score"))
      .orderBy("id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(rows.toSeq === Seq(
      1L -> None, 2L -> None, 3L -> Some(30), 4L -> Some(40)))

    // old-schema rows are real rows, not dropped
    assert(merged.count() === 4)
  }
}
