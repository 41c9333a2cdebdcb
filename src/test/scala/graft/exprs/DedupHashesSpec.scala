package graft.exprs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused dedup kernels ([[MinHashSigs]], [[SimHash16]]) must be
  * value-equal to the HOF formulations they replaced — asserted here on
  * adversarial inputs (nulls, empties, single tokens, unicode, whitespace
  * runs, null array elements) plus seeded pseudo-random texts. The DuckDB
  * oracles pin the same semantics end-to-end at the query level. */
class DedupHashesSpec extends SparkSpec {

  import spark.implicits._

  private def tokens(c: org.apache.spark.sql.Column) = split(lower(c), " ")

  private def shingles(toks: org.apache.spark.sql.Column) =
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array(concat_ws(" ", toks))))

  private val texts: Seq[String] = Seq(
    null, "", " ", "  ", "one", "two words", "a b c", "a b c d",
    "héllo wörld ünïcödé tokens over here", "x " * 200,
    "the the the the", "tab\tinside token", "ends with space ",
    " leading", "punct, and. stuff!; ok", "ñ é ü ß 漢字 かな 한글"
  ) ++ (0 until 100).map { i =>
    val rnd = new scala.util.Random(i * 7919 + 13)
    (0 until rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
  }

  private def docs: DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("_toks", tokens(col("text")))
      .withColumn("sh", shingles(col("_toks")))
      .drop("_toks")

  /** The replaced HOF signature pipeline, verbatim. */
  private def hofSigs(df: DataFrame): DataFrame = {
    val withH = df.select(col("doc_id"),
      transform(col("sh"), x => md5(x)).as("h1"),
      transform(col("sh"), x => md5(concat(x, lit("~")))).as("h2"))
    val mh = (seed: Int) => {
      val (src, off) = if (seed < 4) (col("h1"), seed * 8) else (col("h2"), (seed - 4) * 8)
      array_min(transform(src, h => substring(h, off + 1, 8)))
    }
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"), concat(mh(2 * b), mh(2 * b + 1)).as("sig"))
    }
    withH.select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private def fusedSigs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), DedupHashes.minhashSigs(col("sh")).as("_sigs"))
      .select(col("doc_id"), posexplode_outer(col("_sigs")).as(Seq("band", "sig")))

  test("Shingles3 equals the HOF shingle chain on adversarial texts") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("_toks", tokens(col("text")))
    val want = df.select(col("doc_id"), shingles(col("_toks")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    val got = df.select(col("doc_id"),
        DedupHashes.shingles3(col("_toks")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("Shingles3 null/short/null-element arrays mirror concat_ws semantics") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq.empty[String]),
      (3L, Seq[String]("a")),
      (4L, Seq[String]("a", "b")),
      (5L, Seq[String](null, "b", "c", null, "e")),
      (6L, Seq[String]("a", "a", "a", "a"))
    ).toDF("doc_id", "toks")
    val want = df.select(col("doc_id"), shingles(col("toks")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val got = df.select(col("doc_id"),
        DedupHashes.shingles3(col("toks")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(got === want)
    assert(got(1L) === Seq(""))
    assert(got(6L) === Seq("a a a"))
  }

  test("MinHashSigs equals the HOF band-signature chain on adversarial texts") {
    val want = hofSigs(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), Option(r.getString(2)))).sortBy(x => (x._1, x._2))
    val got = fusedSigs(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), Option(r.getString(2)))).sortBy(x => (x._1, x._2))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("MinHashSigs null/empty/all-null arrays yield 4 null-sig rows") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq.empty[String]),
      (3L, Seq[String](null, null))
    ).toDF("doc_id", "sh")
    val rows = fusedSigs(df).collect()
    assert(rows.length === 12)
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3))
  }

  /** The replaced explode_outer + 16-vote aggregation, verbatim. */
  private def aggSimhash(df: DataFrame): DataFrame = {
    val toks = array_distinct(tokens(col("text")))
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 4), 16, 10).cast("long"))
    val voteAgg = (b: Int) =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_v$b")
    val bits = (0 until 16).map { b =>
      when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    df.select(col("doc_id"), explode_outer(hashes).as("_h"))
      .groupBy(col("doc_id"))
      .agg(voteAgg(0), (1 until 16).map(voteAgg): _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  test("SimHash16 equals the vote-aggregation form on adversarial texts") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val want = aggSimhash(df).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val got = df.select(col("doc_id"),
        DedupHashes.simhash16(array_distinct(tokens(col("text")))).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("SimHash16 handles null array and null elements like the vote form") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq.empty[String]),
      (3L, Seq[String](null, "x")),
      (4L, Seq[String](null, null)),
      (5L, Seq[String](null, "x", "y", "z"))
    ).toDF("doc_id", "toks")
    // the replaced aggregation form, applied to the raw token arrays
    val hashes = transform(col("toks"),
      t => conv(substring(md5(t), 1, 4), 16, 10).cast("long"))
    val voteAgg = (b: Int) =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_v$b")
    val bits = (0 until 16).map { b =>
      when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val want = df.select(col("doc_id"), explode_outer(hashes).as("_h"))
      .groupBy(col("doc_id"))
      .agg(voteAgg(0), (1 until 16).map(voteAgg): _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = df.select(col("doc_id"), DedupHashes.simhash16(col("toks")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    assert(got(1L) === 0L && got(2L) === 0L && got(4L) === 0L)
  }
}
