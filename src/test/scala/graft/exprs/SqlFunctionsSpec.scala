package graft.exprs

import graft.SparkSpec

/** The SQL bindings must produce the same golden values as the Column API
  * (reference goldens from `reference/test/test_utils.py`) — and stay
  * native Catalyst (verified by the absence of any UDF node in the plan). */
class SqlFunctionsSpec extends SparkSpec {

  SqlFunctions.registerAll(spark)

  private def sql1(q: String): Any =
    spark.sql(q).collect()(0).get(0)

  test("scalar goldens through pure SQL") {
    assert(sql1("SELECT get_url_hash('https://google.com/')") == 63524L)
    assert(sql1("SELECT get_url_hash('')") == 54301L)
    assert(sql1("SELECT get_ext('http://test.com/foo.bar?baz')") == "bar")
    assert(sql1("SELECT pretty_type('text/css', 'css')") == "css")
    assert(sql1("SELECT get_format('image', 'image/jpeg', 'jpg')") == "jpg")
    assert(sql1("SELECT clamp_integer(-5)") == null)
    assert(sql1("SELECT clamp_integer(41)") == 41L)
    assert(sql1("SELECT url_short(repeat('x', 300))") ==
      "x" * 255)
    assert(sql1("SELECT request_id(3, 7)") == (3L << 32) + 7L)
    assert(sql1("SELECT hostname('https://h.example.com:8080/p')") ==
      "h.example.com:8080")
    assert(sql1("SELECT canonical_json(' { \"b\" : 1 , \"a\" : { } } ')") ==
      """{"b":1,"a":{}}""")
    assert(sql1("SELECT is_home_page(NULL)") == true)
    assert(sql1("SELECT exp_age_bucket(90000)") == "30d")
  }

  test("SQL bindings are native Catalyst — no UDF node in the plan") {
    val plan = spark.sql(
      "SELECT get_ext(c), canonical_json(c), get_url_hash(c) FROM VALUES ('x') t(c)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"unexpected UDF in plan:\n$plan")
  }

  test("pivot_sum UDAF is registered alongside") {
    val out = spark.sql(
      """SELECT pivot_sum(client, n) FROM VALUES
        |('desktop', 2L), ('mobile', 3L), ('desktop', 5L) t(client, n)""".stripMargin)
      .collect()(0).getMap[String, Long](0)
    assert(out == Map("desktop" -> 7L, "mobile" -> 3L))
  }
}
