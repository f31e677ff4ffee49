package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT — the columnar semi-structured path. `from_json`
  * (registered as `events_json`) needs ONE declared schema for every row;
  * variant parses each payload into a binary self-describing encoding, so
  * heterogeneous payloads (the real shape of an event-log props column
  * accreted over years of producers) extract typed paths row-by-row with
  * no shared schema. On this driver corpus props is uniform `{"k": n}` —
  * a registered variant query would duplicate `events_json`'s oracle row
  * for row, so the capability is pinned here on a mixed-shape fixture
  * instead (nested objects, arrays, scalars, heterogeneous value types).
  */
class VariantSpec extends SparkSpec {

  import spark.implicits._

  private val payloads = Seq(
    """{"k": 42, "tags": ["a", "b"], "ctx": {"ua": "firefox", "v": 1}}""",
    """{"k": "not-a-number", "ctx": {"ua": "chrome"}}""",
    """{"other": true}""",
    """[1, 2, 3]""",
    """"bare string"""",
    """not json at all""")

  private def df = payloads.zipWithIndex
    .map { case (p, i) => (i.toLong, p) }.toDF("id", "props")

  test("try_parse_json accepts any well-formed payload shape, nulls the rest") {
    val v = df.select($"id",
      expr("try_parse_json(props)").as("v"))
    assert(v.schema("v").dataType.typeName === "variant")
    val nulls = v.filter($"v".isNull).select($"id").as[Long].collect().toSet
    assert(nulls === Set(5L), "only the malformed payload parses to null")
  }

  test("typed path extraction works per-row without a shared schema") {
    val got = df.select($"id",
      expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").as("k"),
      expr("try_variant_get(try_parse_json(props), '$.ctx.ua', 'string')").as("ua"),
      expr("try_variant_get(try_parse_json(props), '$.tags[1]', 'string')").as("tag1"),
      expr("try_variant_get(try_parse_json(props), '$[2]', 'bigint')").as("arr2"))
      .as[(Long, Option[Long], Option[String], Option[String], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, Some(42L), Some("firefox"), Some("b"), None),
      (1L, None, Some("chrome"), None, None), // "not-a-number" → null bigint
      (2L, None, None, None, None),
      (3L, None, None, None, Some(3L)), // top-level array indexing
      (4L, None, None, None, None),
      (5L, None, None, None, None)))
  }

  test("variant extraction agrees with from_json on the uniform driver corpus") {
    val dir = sf("sf0.001")
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val viaVariant = ev.select(
      expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").as("k"))
      .agg(sum($"k"), count($"k")).as[(Long, Long)].collect()(0)
    val viaFromJson = ev.select(
      from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k").as("k"))
      .agg(sum($"k"), count($"k")).as[(Long, Long)].collect()(0)
    assert(viaVariant === viaFromJson)
    assert(viaVariant._2 > 0L)
  }
}
