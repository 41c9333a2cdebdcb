package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.cdc.{CdcStream, LakeMerge}
import graft.lake.LakeTable

/** Point-lookup evidence bench: how much do the manifest key blooms cut
  * per-lookup file IO and latency inside a bucket, on a table shaped like a
  * CDC timeline (many delta files per bucket, each batch covering a
  * DISJOINT repo range — the onboarding-crawl shape where a given repo's
  * rows live in few files)?
  *
  * Measures the SAME table twice: once as written (blooms in manifests),
  * once after stripping `keyBloom` from every manifest copy (the pre-bloom
  * engine). Reports files opened per lookup and mean lookup wall over N
  * cold repos. One JSON line to stdout.
  *
  * Run: `sbt "runMain graft.LookupBench [batches] [reposPerBatch]"`.
  */
object LookupBench {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 40
    val reposPerBatch = if (args.length > 1) args(1).toInt else 200
    val pathsPerRepo = 12
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-lookup-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-lookupbench").toString
    val t = LakeTable.create(spark, s"$root/table", CdcStream.binlogSchema,
      numBuckets = 8)
    // disjoint repo ranges per batch: repo r of batch b exists ONLY in
    // batch b's delta files — the shape where blooms prune hardest
    (0 until batches).foreach { b =>
      val rows = (0 until reposPerBatch).flatMap { r =>
        val repo = f"repo_${b * reposPerBatch + r}%06d"
        (0 until pathsPerRepo).map(p =>
          (repo, s"src/f$p.scala", f"c$b%04d",
            (b.toLong * reposPerBatch * pathsPerRepo) + r * pathsPerRepo + p,
            "I", "scala", s"content-$b-$r-$p"))
      }.toDF("repo", "path", "commit", "lsn", "op", "lang", "content")
      LakeMerge.mergeBatch(t, rows, Some(("lb", b.toLong)))
    }
    val total = t.files.size

    // the same table without blooms: copy ONLY the metadata tree (the
    // stripped replica keeps reading the original data files), strip
    // keyBloom from the manifest copies
    val stripped = s"$root/stripped"
    graft.util.Fs.walk(Paths.get(s"$root/table/metadata")).foreach { p =>
      val rel = Paths.get(s"$root/table").relativize(p)
      val dst = Paths.get(stripped).resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(p, dst)
    }
    graft.util.Fs.list(Paths.get(s"$stripped/metadata")).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("manifest-"))
        Files.writeString(p, Files.readString(p)
          .replaceAll(""","keyBloom":"[^"]*"""", ""))
      // snapshot JSONs reference manifests by ABSOLUTE path — repoint them
      // at the stripped copies (data-file paths stay on the original data)
      else if (name.endsWith(".metadata.json"))
        Files.writeString(p, Files.readString(p)
          .replace(s"$root/table/metadata/", s"$stripped/metadata/"))
    }
    val tStripped = LakeTable.load(spark, stripped)

    // repo 0 is the dedicated WARMUP key — excluded from the sample so all
    // 20 measured lookups are cold w.r.t. this table handle. Measurement
    // order (blooms first, stripped second over the same underlying data)
    // leaves the stripped pass with a warmer page cache: the reported
    // speedup is therefore a conservative FLOOR.
    val rnd = new scala.util.Random(7)
    val lookups = (0 until 20).map(_ =>
      f"repo_${rnd.nextInt(batches * reposPerBatch - 1) + 1}%06d")

    def measure(table: LakeTable): (Double, Double) = {
      // warmup (reader init) on the excluded key
      LakeMerge.readRepo(table, "repo_000000").count()
      val stats = lookups.map { r =>
        val files = table.filesForKey(table.snapshot, r).size
        val t0 = System.nanoTime()
        val n = LakeMerge.readRepo(table, r).count()
        require(n == pathsPerRepo, s"$r: $n rows")
        (files.toDouble, (System.nanoTime() - t0) / 1e6)
      }
      (stats.map(_._1).sum / stats.size, stats.map(_._2).sum / stats.size)
    }

    val (filesBloom, wallBloom) = measure(t)
    val (filesNo, wallNo) = measure(tStripped)
    println(
      f"""{"bench":"point-lookup","batches":$batches,"repos":${batches * reposPerBatch},"table_files":$total,"files_per_lookup_bloom":$filesBloom%.1f,"files_per_lookup_nobloom":$filesNo%.1f,"wall_ms_bloom":$wallBloom%.1f,"wall_ms_nobloom":$wallNo%.1f,"files_cut":${f"${filesNo / math.max(filesBloom, 0.001)}%.1f"},"speedup":${f"${wallNo / math.max(wallBloom, 0.001)}%.2f"}}""")
    graft.util.Fs.rmTree(Paths.get(root))
    spark.stop()
  }
}
