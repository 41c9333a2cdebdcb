package graft.exprs

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-value parity tests ported from `reference/test/test_utils.py` —
  * same inputs MUST produce the same outputs. */
class RefFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("get_url_hash goldens (test_utils.py:8-12)") {
    assert(eval1[Long](RefFunctions.getUrlHash(lit("https://google.com/"))) == 63524L)
    assert(eval1[Long](RefFunctions.getUrlHash(lit(""))) == 54301L)
  }

  test("get_ext goldens (test_utils.py:14-24)") {
    val cases = Seq(
      "http://test.com/foo.bar?baz" -> "bar",
      "http://test.com/foo.bar.baz" -> "baz",
      "http://test.com/foo.barbaz" -> "",
      "http://test.com/foo" -> ""
    )
    cases.foreach { case (in, want) =>
      assert(eval1[String](RefFunctions.getExt(lit(in))) == want, s"get_ext($in)")
    }
  }

  test("pretty_type mime goldens (test_utils.py:26-56)") {
    val byMime = Seq(
      "font" -> "font", "css" -> "css", "image" -> "image",
      "script" -> "script", "video" -> "video", "audio" -> "audio",
      "xml" -> "xml", "json" -> "script", "flash" -> "video",
      "webm" -> "video", "mp4" -> "video", "flv" -> "video",
      "html" -> "html", "text" -> "text")
    byMime.foreach { case (mime, want) =>
      assert(eval1[String](RefFunctions.prettyType(lit(mime), lit(""))) == want, s"mime=$mime")
    }
  }

  test("pretty_type ext goldens (test_utils.py:58-90)") {
    val byExt = Seq(
      "js" -> "script", "json" -> "script",
      "eot" -> "font", "ttf" -> "font", "woff" -> "font", "woff2" -> "font", "otf" -> "font",
      "png" -> "image", "gif" -> "image", "jpg" -> "image", "jpeg" -> "image",
      "webp" -> "image", "ico" -> "image", "svg" -> "image", "avif" -> "image",
      "jxl" -> "image", "heic" -> "image", "heif" -> "image",
      "css" -> "css", "xml" -> "xml",
      "mp4" -> "video", "webm" -> "video", "ts" -> "video", "m4v" -> "video",
      "m4s" -> "video", "mov" -> "video", "ogv" -> "video", "swf" -> "video",
      "f4v" -> "video", "flv" -> "video",
      "html" -> "html", "htm" -> "html", "wasm" -> "wasm")
    byExt.foreach { case (ext, want) =>
      assert(eval1[String](RefFunctions.prettyType(lit(""), lit(ext))) == want, s"ext=$ext")
    }
    assert(eval1[String](RefFunctions.prettyType(lit("foo"), lit("bar"))) == "other")
  }

  test("get_format goldens (test_utils.py:92-124)") {
    val cases = Seq(
      ("image", "jpg", "jpg"), ("image", "png", "png"), ("image", "gif", "gif"),
      ("image", "webp", "webp"), ("image", "svg", "svg"), ("image", "ico", "ico"),
      ("image", "avif", "avif"), ("image", "jxl", "jxl"), ("image", "heic", "heic"),
      ("image", "heif", "heif"), ("image", "jpeg", "jpg"),
      ("video", "flash", "flash"), ("video", "swf", "swf"), ("video", "mp4", "mp4"),
      ("video", "flv", "flv"), ("video", "f4v", "f4v"))
    cases.foreach { case (pt, t, want) =>
      assert(eval1[String](RefFunctions.getFormat(lit(pt), lit(t), lit(t))) == want, s"($pt,$t)")
    }
    assert(eval1[String](RefFunctions.getFormat(lit("foo"), lit("bar"), lit("baz"))) == "")
  }

  test("clamp_integer goldens (test_utils.py:137-149)") {
    assert(eval1[Long](RefFunctions.clampInteger(lit(1000L))) == 1000L)
    assert(eval1[Any](RefFunctions.clampInteger(lit(-1000L))) == null)
    // 2^64 as double caps at Long.MaxValue
    assert(eval1[Long](RefFunctions.clampInteger(lit(math.pow(2, 64))
      .cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").cast("long"))
      == Long.MaxValue)
  }

  test("client_name goldens (test_utils.py:255-268)") {
    val cases = Seq(
      "/chrome-Jan_1_2022/foo.har.gz" -> "desktop",
      "/android-Jan_1_2022/foo.har.gz" -> "mobile",
      "/foo/bar_Dx123.har.gz" -> "desktop",
      "/foo/bar_Mx123.har.gz" -> "mobile",
      "/foo/bar.har.gz" -> "foo")
    cases.foreach { case (in, want) =>
      assert(eval1[String](RefFunctions.clientName(lit(in))) == want, s"client_name($in)")
    }
  }

  test("crawl_date golden (test_utils.py:130-134)") {
    assert(eval1[java.sql.Date](RefFunctions.crawlDate(
      lit("gs://httparchive/crawls/android-Apr_1_2022"))).toString == "2022-04-01")
  }

  test("label_format goldens (utils.py:236-237 — snake_case to PascalCase)") {
    // outputs pinned against the reference's replace/title/replace chain
    val cases = Seq(
      "combine_events" -> "CombineEvents",
      "sum_pages" -> "SumPages",
      "write_non_summary_tables" -> "WriteNonSummaryTables",
      "a" -> "A",
      "already" -> "Already",
      "x__y" -> "XY")
    cases.foreach { case (in, want) =>
      assert(eval1[String](RefFunctions.labelFormat(lit(in))) == want, in)
      assert(RefFunctions.labelFormat(in) == want, s"scala twin: $in")
    }
  }

  test("hostname keeps the port (transformation.py:592 regex, not parse_url)") {
    assert(eval1[String](RefFunctions.hostname(lit("https://example.com:8443/x/y"))) == "example.com:8443")
    assert(eval1[String](RefFunctions.hostname(lit("wss://ws.example.com/ws"))) == "ws.example.com")
  }

  test("requestid composite (transformation.py:238)") {
    assert(eval1[Long](RefFunctions.requestId(lit(12345), lit(7))) == (12345L << 32) + 7L)
  }

  test("datetime_to_epoch leniency (utils.py:182-189)") {
    assert(eval1[Long](RefFunctions.datetimeToEpoch(lit("2022-01-01 00:00:00"))) == 1640995200L)
    assert(eval1[Any](RefFunctions.datetimeToEpoch(lit("not-a-date"))) == null)
  }

  test("expAge semantics (transformation.py:351-396)") {
    def age(cc: Any, exp: Any, date: Any, started: Long): Any =
      eval1[Any](RefFunctions.expAge(
        lit(cc).cast("string"), lit(exp).cast("string"), lit(date).cast("string"), lit(started)))
    assert(age("no-cache", null, null, 0L) == 0L)
    assert(age("must-revalidate, max-age=300", null, null, 0L) == 0L)
    assert(age("max-age=300", null, null, 0L) == 300L)
    assert(age(null, "2022-01-02 00:00:00", "2022-01-01 00:00:00", 0L) == 86400L)
    assert(age(null, "2022-01-01 00:00:00", null, 1640995200L - 3600L) == 3600L)
    // expired in the past clamps to 0
    assert(age(null, "2022-01-01 00:00:00", "2022-06-01 00:00:00", 0L) == 0L)
    assert(age(null, null, null, 0L) == 0L)
  }

  test("is_home_page (test_utils.py:302-312)") {
    assert(eval1[Boolean](RefFunctions.isHomePage(lit("""{"crawl_depth": 0}"""))) == true)
    assert(eval1[Boolean](RefFunctions.isHomePage(lit("""{"crawl_depth": 1}"""))) == false)
    assert(eval1[Boolean](RefFunctions.isHomePage(lit(null).cast("string"))) == true) // legacy
    assert(eval1[Boolean](RefFunctions.isHomePage(lit("""{"rank": 1000}"""))) == true)
  }

  test("parse_header cases (test_utils.py:255-319)") {
    val headers = Seq(
      (Seq(("foo", "bar")), Map("foo" -> "req_foo"), "zzz")
    )
    val df = Seq(Seq(("foo", "bar"))).toDF("hs")
      .select(transform(col("hs"), t =>
        struct(t.getField("_1").as("name"), t.getField("_2").as("value"))).as("headers"))

    // standard header captured into the multimap
    val std = df.select(HeaderOps.standardMultimap(col("headers"), Map("foo" -> "req_foo")).as("m"))
      .selectExpr("m['req_foo'] as v").collect()(0).getSeq[String](0)
    assert(std == Seq("bar"))

    // cookie key counted, not stored
    val ck = df.select(HeaderOps.cookieSize(col("headers"), "foo").as("c")).collect()(0).getLong(0)
    assert(ck == 3L)

    // other header lumped
    val other = df.select(HeaderOps.otherHeaders(col("headers"), Map.empty, "cookie").as("o"))
      .collect()(0).getString(0)
    assert(other == "foo = bar")

    // repeats appended in order
    val df2 = Seq(Seq(("foo", "bar"), ("FOO", "baz"))).toDF("hs")
      .select(transform(col("hs"), t =>
        struct(t.getField("_1").as("name"), t.getField("_2").as("value"))).as("headers"))
    val rep = df2.select(HeaderOps.standardMultimap(col("headers"), Map("foo" -> "req_foo")).as("m"))
      .selectExpr("m['req_foo'] as v").collect()(0).getSeq[String](0)
    assert(rep == Seq("bar", "baz"))

    // 255-char truncation in multimap; other headers keep the original value
    val longVal = "x" * 300
    val df3 = Seq(Seq(("foo", longVal))).toDF("hs")
      .select(transform(col("hs"), t =>
        struct(t.getField("_1").as("name"), t.getField("_2").as("value"))).as("headers"))
    val tr = df3.select(HeaderOps.standardMultimap(col("headers"), Map("foo" -> "req_foo")).as("m"))
      .selectExpr("m['req_foo'][0] as v").collect()(0).getString(0)
    assert(tr.length == 255)
  }

  test("expAge histogram buckets (transformation.py:604-618)") {
    assert(eval1[String](RefFunctions.expAgeBucket(lit(null).cast("long"))) == "null")
    assert(eval1[String](RefFunctions.expAgeBucket(lit(0L))) == "0")
    assert(eval1[String](RefFunctions.expAgeBucket(lit(3600L))) == "1d")
    assert(eval1[String](RefFunctions.expAgeBucket(lit(86401L))) == "30d")
    assert(eval1[String](RefFunctions.expAgeBucket(lit(2592001L))) == "365d")
    assert(eval1[String](RefFunctions.expAgeBucket(lit(31536001L))) == "more")
  }

  test("canonical_json: compact, key-order-preserving, UTF-8, null on invalid") {
    val c = (s: String) => eval1[String](CanonicalJson.canonicalJson(lit(s)))
    assert(c("""{ "b" : 1, "a" : [1, 2,  3] }""") == """{"b":1,"a":[1,2,3]}""")
    assert(c("""{"s": "héllo ☃"}""") == """{"s":"héllo ☃"}""")
    assert(c("not json") == null)
    assert(c("") == null)
    assert(eval1[String](CanonicalJson.canonicalJson(lit(null).cast("string"))) == null)
    // SQL registration path
    CanonicalJson.register(spark)
    assert(spark.sql("""SELECT canonical_json('{"x":  1}') v""").collect()(0).getString(0) == """{"x":1}""")
  }
}
