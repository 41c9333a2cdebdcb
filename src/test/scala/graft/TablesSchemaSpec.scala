package graft

import graft.queries.Tables

/** The declared catalog schemas in [[Tables]] must stay byte-equal to what
  * parquet footer inference yields on the real test files — an explicit-
  * schema read plans the identical scan only under that equality. Any data
  * regeneration that drifts a column type or order fails here loudly
  * instead of silently mis-casting in every query. */
class TablesSchemaSpec extends SparkSpec {

  // every scale factor the driver benches or verifies against — a drifted
  // regeneration of ANY of them must fail here, not null-fill silently
  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  Tables.schemas.keys.toSeq.sorted.foreach { name =>
    test(s"declared schema for $name matches parquet inference at every SF") {
      dirs.foreach { dir =>
        val inferred = spark.read.parquet(s"$dir/$name.parquet").schema
        assert(Tables.schemas(name) === inferred,
          s"declared schema for $name drifted from $dir")
      }
    }
  }

  test("schemaFor resolves known tables by path basename only") {
    assert(Tables.schemaFor("/any/where/documents.parquet").contains(
      Tables.schemas("documents")))
    assert(Tables.schemaFor("/any/where/unknown.parquet").isEmpty)
    assert(Tables.schemaFor("/any/where/notparquet").isEmpty)
  }
}
