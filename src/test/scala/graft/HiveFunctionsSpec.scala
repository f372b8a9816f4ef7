package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HiveFunctions._
import graft.functions.UrlDecode

class HiveFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitPart matches SPLIT_PART semantics incl. out-of-range") {
    val df = Seq("a_b_c").toDF("s").select(
      splitPart($"s", "_", 1).as("p1"),
      splitPart($"s", "_", 3).as("p3"),
      splitPart($"s", "_", 9).as("oob"))
    val r = df.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("a", "c", ""))
    // part < 1 (Snowflake's negative last-element indexing) is refused
    // loudly — silently returning '' would corrupt fingerprints.
    intercept[IllegalArgumentException](splitPart($"s", "_", 0))
    intercept[IllegalArgumentException](splitPart($"s", "_", -1))
  }

  test("findInSet is 1-based with 0 for absent") {
    val df = Seq(("b", "a,b,c"), ("z", "a,b,c")).toDF("item", "csv")
      .select(findInSet($"item", $"csv").as("pos"))
    assert(df.as[Int].collect().toSeq == Seq(2, 0))
  }

  test("collectMaxOne picks value at max rank; null values rank 0; ties break high") {
    val df = Seq(
      ("k", Some("old"), 1L), ("k", Some("new"), 5L), ("k", None, 9L),
      ("t", Some("x"), 3L), ("t", Some("y"), 3L)
    ).toDF("k", "v", "ts")
    val out = df.groupBy($"k").agg(collectMaxOne($"v", $"ts").as("v"))
      .orderBy($"k").as[(String, String)].collect().toSeq
    // "k": null at ts=9 ranks 0, so "new"@5 wins; "t": tie at 3 → max value "y".
    assert(out == Seq(("k", "new"), ("t", "y")))
  }

  test("collectMaxOne: non-null values beat null values at ANY rank") {
    val df = Seq(
      // a negative real rank must still beat the null-value row (the old
      // rank-0 sentinel lost here and nulled the aggregate)
      ("a", Some("v"), Some(-3L)), ("a", None, Some(7L)),
      // a NULL rank on a real value still beats every null-value row
      ("b", Some("x"), None), ("b", None, Some(7L)),
      // an all-null group stays null
      ("c", None, Some(1L)), ("c", None, Some(2L))
    ).toDF("k", "v", "ts")
    val out = df.groupBy($"k").agg(collectMaxOne($"v", $"ts").as("v"))
      .orderBy($"k").as[(String, String)].collect().toSeq
    assert(out == Seq(("a", "v"), ("b", "x"), ("c", null)))
    // typed twin: same negative-rank case
    val ds = Seq(("k", ("v", -3L)), ("k", (null.asInstanceOf[String], 7L))).toDS()
    val typed = ds.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.CollectMaxOne.forString).collect().toSeq
    assert(typed == Seq(("k", "v")))
  }

  test("splitPart propagates NULL input (warehouse SPLIT_PART contract)") {
    val df = Seq(Some("a_b"), None).toDF("s")
      .select(splitPart($"s", "_", 1).as("p"), splitPart($"s", "_", 9).as("oob"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "a" && rows(0).getString(1) == "")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("rowHash is null-aware and positional") {
    val df = Seq((Some("a"), Some("b")), (None, Some("ab"))).toDF("x", "y")
      .select(rowHash(Seq($"x", $"y")).as("h"))
    val hs = df.as[String].collect()
    assert(hs(0) != hs(1)) // "a|b" vs "NULL|ab"
  }

  test("rowFingerprint: equal rows agree; null position and value-shift disagree") {
    // (x, NULL) vs (NULL, x) is the bare-xxhash64 null-skip alias the
    // per-column position pre-hash exists to kill.
    val df = Seq(
      (1L, Some("a"), Some("b")),
      (2L, Some("a"), Some("b")),  // identical payload to row 1
      (3L, Some("a"), None),
      (4L, None, Some("a")),       // null-skip alias of row 3 under bare xxhash64
      (5L, Some("ab"), Some("")),  // concat alias of ("a","b") under plain concat
      (6L, None, None)
    ).toDF("id", "x", "y")
      .select($"id", rowFingerprint(Seq($"x", $"y")).as("fp"))
    val fp = df.orderBy($"id").collect().map(_.getStruct(1)).map(r => (r.getLong(0), r.getLong(1)))
    assert(fp(0) == fp(1))
    assert(Set(fp(0), fp(2), fp(3), fp(4), fp(5)).size == 5, "all distinct")
    // zero compare columns: the constant fingerprint (all-excluded tables
    // diff as present-and-matching, like md5('') before it)
    val c = Seq(1, 2).toDF("id").select(rowFingerprint(Nil).as("fp")).collect()
    assert(c(0).getStruct(0) == c(1).getStruct(0))
  }

  test("decodeurl decodes percent-escapes and '+', keeps malformed input") {
    UrlDecode.register(spark)
    val df = Seq("a%20b+c", "100%interest", "%E2%82%AC").toDF("s")
      .selectExpr("decodeurl(s) AS d")
    assert(df.as[String].collect().toSeq == Seq("a b c", "100%interest", "€"))
    // register()'s arity contract matches the GraftExtensions path: a
    // named error, not NoSuchElementException / a silently dropped arg
    val err = intercept[Exception](spark.sql("SELECT decodeurl('a','b')").collect())
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("decodeurl expects 1"))
  }

  test("argmaxByConcat (reference's Snowflake rewrite) ≡ collectMaxOne on strings") {
    val e = graft.sources.Tables.load(spark, TestSpark.Sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val a = e.groupBy($"user_id")
      .agg(argmaxByConcat($"event_type", $"ts").as("v"))
      .orderBy($"user_id").as[(Long, String)].collect().toSeq
    val b = e.groupBy($"user_id")
      .agg(collectMaxOne($"event_type", unix_millis($"ts")).as("v"))
      .orderBy($"user_id").as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("msToDate truncates epoch millis to UTC date") {
    val df = Seq(86400000L + 3600123L).toDF("ms").select(msToDate($"ms").as("d"))
    assert(df.as[java.sql.Date].collect().head.toString == "1970-01-02")
  }
}
