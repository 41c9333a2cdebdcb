package graft.exprs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` integration path: a session built with
  * GraftExtensions resolves the whole scalar library as plain SQL with no
  * registration code. Runs in the shared SparkContext (suites execute
  * sequentially in the forked test JVM); the shared session is restored
  * afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session created with graft.GraftExtensions resolves the SQL surface") {
    val shared = graft.SparkSpec.session // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // instantiated REFLECTIVELY by class name — exactly what Spark's
      // spark.sql.extensions config does at session build; withExtensions
      // is used because a reused SparkContext ignores the static conf
      val ext = Class.forName("graft.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(ext)
        .getOrCreate()
      val row = s2.sql(
        """SELECT label_format('combine_events') AS l,
          |       get_ext('http://x.example/lib/app.min.js?v=3') AS e,
          |       clamp_integer(-4) IS NULL AS c,
          |       canonical_json(' {"b": 1, "a": {"z": [2, 1]}} ') AS j
          |""".stripMargin).collect()(0)
      assert(row.getString(0) == "CombineEvents")
      assert(row.getString(1) == "js")
      assert(row.getBoolean(2))
      assert(row.getString(3) == """{"b":1,"a":{"z":[2,1]}}""") // key order preserved (reference parity)
      // arity errors surface as analysis failures, not runtime surprises
      val err = intercept[Exception](s2.sql("SELECT get_ext('a', 'b')").collect())
      assert(err.getMessage.contains("1 argument"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
