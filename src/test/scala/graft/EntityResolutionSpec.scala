package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.pipeline.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def catalog(rows: (Long, String, String, Double)*) =
    rows.toDF("p_partkey", "p_name", "p_brand", "p_retailprice")

  test("transitive chain resolves to one entity; blocking separates brands") {
    // 1≈2 (1 edit) and 2≈3 (1 edit) but 1 vs 3 is 2 edits — still one
    // entity via the transitive closure; 4 matches 1 textually but sits
    // in another brand block; 5 is unrelated
    val parts = catalog(
      (1L, "steel blue anchor bolt", "B1", 10.0),
      (2L, "steel blue anchor bolts", "B1", 12.0),
      (3L, "steel blue anchor boltsx", "B1", 11.0),
      (4L, "steel blue anchor bolt", "B2", 20.0),
      (5L, "copper pipe fitting kit", "B1", 30.0))
    val got = EntityResolution.resolveParts(parts)
      .orderBy("entity_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 3L, "steel blue anchor bolt", 10.0, 12.0),
      (4L, 1L, "steel blue anchor bolt", 20.0, 20.0),
      (5L, 1L, "copper pipe fitting kit", 30.0, 30.0)))
  }

  test("no matches: every row is its own entity, catalog is preserved") {
    val parts = catalog(
      (7L, "alpha", "B1", 1.0),
      (8L, "bravo charlie delta", "B1", 2.0),
      (9L, "zz top quality widget", "B2", 3.0))
    val got = EntityResolution.resolveParts(parts)
    assert(got.count() === 3)
    assert(got.agg(sum("n_members")).head.getLong(0) === 3L)
    assert(got.select("entity_id").as[Long].collect().toSet === Set(7L, 8L, 9L))
  }

  test("fixture catalog: entities partition the table, canonical key is min member") {
    val part = Tables.part(spark, sfDir)
    val resolved = EntityResolution.resolveParts(part).cache()
    // entities partition the catalog: member counts sum to |part|
    assert(resolved.agg(sum("n_members")).head.getLong(0) === part.count())
    // entity_id is a real member key and the canonical name is its name
    val byKey = part.select(col("p_partkey").cast("long").as("entity_id"),
      col("p_name"))
    val joined = resolved.join(byKey, "entity_id")
    assert(joined.count() === resolved.count())
    assert(joined.filter(col("canonical_name") =!= col("p_name")).count() === 0)
    resolved.unpersist()
  }
}
