package graft

import org.apache.spark.sql.types._

/** Fixture-encoding tripwire (r10 verdict task 8): the driver can
  * regenerate /root/testdata between rounds with a different parquet
  * encoding (r9: events.ts flipped TIMESTAMP(NANOS) -> timestamp[us]
  * and 71 queries failed before any spec noticed). This spec loads
  * every table THROUGH the Tables loaders and pins the canonical
  * post-load dtype of every column, so the next encoding drift fails
  * one cheap spec with a readable diff instead of a wall of oracle
  * hash mismatches.
  */
class FixtureDtypeSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sf)
      case n        => Tables.load(spark, sf, n)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  // Timestamps: the current fixture writes isAdjustedToUTC=false
  // timestamp[us], which Spark 4 loads as TIMESTAMP_NTZ. Consumers of
  // orders/lineitem handle NTZ directly; events alone goes through the
  // Tables.events dispatch and is pinned POST-dispatch as session-tz
  // TimestampType. If a regeneration flips an encoding, this spec
  // fails with a pointer to the loader — fix the dispatch there, do
  // not chase consumers.
  private val tsNtz: DataType = TimestampNTZType
  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> tsNtz, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> tsNtz),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table: canonical column dtypes are stable") {
      val actual = fields(table)
      val missing = cols.keySet -- actual.keySet
      assert(missing.isEmpty, s"$table lost columns $missing " +
        s"(fixture regenerated with a different schema?)")
      for ((c, want) <- cols) {
        // ArrayType: compare element type, tolerate containsNull drift
        (want, actual(c)) match {
          case (ArrayType(we, _), ArrayType(ae, _)) =>
            assert(ae == we, s"$table.$c element type: got $ae, want $we " +
              "— fixture regenerated with a different encoding; update " +
              "the loader dispatch (Tables.scala), not the consumers")
          case (w, a) =>
            assert(a == w, s"$table.$c: got $a, want $w — fixture " +
              "regenerated with a different encoding; update the loader " +
              "dispatch (Tables.scala), not the consumers")
        }
      }
    }
  }
}
