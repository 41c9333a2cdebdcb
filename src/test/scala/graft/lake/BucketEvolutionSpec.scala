package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.cdc.{CdcStream, LakeMerge, MergeEngine}

/** Bucket-layout evolution ([[LakeTable.rebucket]]): growing numBuckets
  * without rewriting data. Old files keep their era's layout; point lookups
  * probe every era; compaction migrates and the tombstone purge waits for a
  * unified layout. */
class BucketEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: Seq[(String, String, String, Long, String, String, String)]) =
    rows.toDF("repo", "path", "commit", "lsn", "op", "lang", "content")

  private def rows(repos: Seq[String], lsn0: Long, op: String = "I", v: String = "x") =
    repos.zipWithIndex.flatMap { case (r, i) =>
      (0 until 20).map(j => (r, s"p$j", f"c$lsn0%05d", lsn0 + i * 20 + j, op, "sc", s"$v$j"))
    }

  test("rebucket grows the layout; reads and point lookups stay correct across eras") {
    val root = tmpDir("evolve")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 4)
    val before = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    LakeMerge.mergeBatch(t, batch(rows(before, 0L)), Some(("ev", 0L)))

    t.rebucket(16)
    assert(t.snapshot.numBuckets == 16)
    assert(t.snapshot.layoutsList == Seq(4, 16))
    // old files stamped with their era, none rewritten
    val oldFiles = t.files
    assert(oldFiles.forall(f => f.layoutBuckets == 4),
      s"pre-evolution files must carry the old era: ${oldFiles.map(_.layoutBuckets)}")

    val after = Seq("zeta", "eta", "alpha") // alpha gets NEWER rows post-evolution
    LakeMerge.mergeBatch(t, batch(rows(after, 1000L, v = "y")), Some(("ev", 1L)))
    val newFiles = t.files.filterNot(f => oldFiles.map(_.path).contains(f.path))
    assert(newFiles.nonEmpty && newFiles.forall(_.layoutBuckets == 16))

    // full read resolves across eras (alpha's post-evolution rows win)
    val state = LakeMerge.readState(t)
    assert(state.count() == (before ++ after).distinct.size * 20)
    assert(state.where($"repo" === "alpha").select("content").as[String]
      .collect().forall(_.startsWith("y")), "LWW winner must come from the new era")

    // point lookups hit keys written before, after, and in both eras
    for (r <- (before ++ after).distinct) {
      val got = LakeMerge.readRepo(t, r).count()
      assert(got == 20, s"$r: expected 20 rows, got $got")
    }
    assert(LakeMerge.readRepo(t, "never_written").isEmpty)

    // the lookup reads only per-era-matching files: for a repo written only
    // before evolution, no new-era file whose bucket mismatches is touched
    val fGamma = t.filesForKey(t.snapshot, "gamma")
    assert(fGamma.forall(f =>
      f.bucket == LakeTable.bucketOf("gamma", LakeTable.layoutOf(f, t.snapshot))))
    assert(fGamma.size < t.files.size)
  }

  test("readBuckets with L0 present filters only L0 rows — old-era bucketed rows survive") {
    val root = tmpDir("evolve-rb-l0")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 4)
    val repos = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    // bucketed deltas under layout 4
    LakeMerge.mergeBatch(t, batch(rows(repos, 0L)), Some(("rb", 0L)))
    t.rebucket(16)
    // an L0 batch AFTER evolution (bucket-spanning files, current layout 16)
    LakeMerge.mergeBatch(t, batch(rows(Seq("theta"), 1000L)), Some(("rb", 1L)),
      l0Mode = true)
    // pick a key whose bucket id CHANGED across eras — the current-layout
    // row filter would wrongly drop its old-era rows
    val moved = repos.find(r =>
      LakeTable.bucketOf(r, 4) != LakeTable.bucketOf(r, 16)).get
    val oldBucket = LakeTable.bucketOf(moved, 4)
    val got = t.readBuckets(Set(oldBucket, LakeTable.L0Bucket))
      .where($"repo" === moved)
    assert(got.count() == 20,
      s"$moved (bucket $oldBucket under era 4) lost rows to the " +
        "current-layout row filter")
    // and the L0 row filter still applies: theta's rows only appear when
    // its current-layout bucket is requested
    val thetaBucket = LakeTable.bucketOf("theta", 16)
    val without = t.readBuckets(
      Set((thetaBucket + 1) % 16, LakeTable.L0Bucket))
      .where($"repo" === "theta")
    assert(without.isEmpty, "L0 rows outside the requested buckets must be filtered")
  }

  test("rebucket rejects shrinking and no-op sizes") {
    val root = tmpDir("evolve-shrink")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 8)
    intercept[IllegalArgumentException] { t.rebucket(4) }
    intercept[IllegalArgumentException] { t.rebucket(8) }
  }

  test("full compaction migrates every file to the current layout") {
    val root = tmpDir("evolve-compact")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch(rows(Seq("r1", "r2", "r3"), 0L)), Some(("ev", 0L)))
    t.rebucket(8)
    LakeMerge.mergeBatch(t, batch(rows(Seq("r4"), 1000L)), Some(("ev", 1L)))
    val preState = MergeEngine.dedupBatch(t.read()).collect().map(_.toString).sorted
    assert(LakeMerge.compact(t))
    val t2 = LakeTable.load(spark, root)
    assert(t2.files.forall(_.layoutBuckets == 8),
      s"post-compact layouts: ${t2.files.map(f => (f.bucket, f.layoutBuckets)).mkString(", ")}")
    assert(t2.files.forall(f => f.bucket >= 0 && f.bucket < 8))
    val postState = MergeEngine.dedupBatch(t2.read()).collect().map(_.toString).sorted
    assert(preState.toSeq == postState.toSeq, "compaction must not change the resolved state")
    // point lookups prune under the unified layout again
    assert(LakeMerge.readRepo(t2, "r1").count() == 20)
  }

  test("tombstone purge waits while old-era files sit outside the resolution set") {
    val root = tmpDir("evolve-purge")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 2)
    // live row for k, then evolve, then tombstone k (new era, maybe another bucket)
    LakeMerge.mergeBatch(t, batch(Seq(("k", "p", "c1", 1L, "I", "sc", "v1"))), Some(("ev", 0L)))
    LakeMerge.mergeBatch(t, batch(rows(Seq("filler1", "filler2"), 100L)), Some(("ev", 1L)))
    t.rebucket(32)
    LakeMerge.mergeBatch(t, batch(Seq(("k", "p", "c2", 5000L, "D", null, null))), Some(("ev", 2L)))
    LakeMerge.setWatermark(t, "c2", 5000L)
    // major-compact ONLY the tombstone's current-era bucket: k's old live
    // row sits in an old-era file outside the set — the purge must NOT
    // drop the tombstone, or the old row would resurrect
    val kb = LakeTable.bucketOf("k", 32)
    LakeMerge.compactOnly(t, Set(kb))
    val resolved = MergeEngine.dedupBatch(LakeTable.load(spark, root).read())
      .where($"repo" === "k")
    assert(resolved.count() == 1 && resolved.head().getAs[String]("op") == "D",
      "tombstone must survive a major while old-era files exist outside the set")
    assert(LakeMerge.readRepo(t, "k").isEmpty, "k stays deleted")
    // a major over EVERY bucket (sees everything, unifies the layout) may
    // finally purge: nothing differently-laid-out remains outside its set
    LakeMerge.compactOnly(t, (0 until 32).toSet)
    val t3 = LakeTable.load(spark, root)
    assert(MergeEngine.dedupBatch(t3.read()).where($"repo" === "k").isEmpty,
      "full compact at/below the watermark purges the tombstone")
    assert(LakeMerge.readRepo(t3, "k").isEmpty)
  }

  test("purge hazard is two-directional: old-era tombstone survives a major containing it " +
      "while the key's out-of-order older row sits in a current-era bucket outside") {
    // round-5 review regression: under mixed layouts a key's rows live
    // under SEVERAL bucket ids; purging a below-watermark tombstone read
    // from an OLD-era file would resurrect an out-of-order OLDER row parked
    // in the key's CURRENT-era bucket (legal arrival: it was above the
    // watermark when delivered)
    val k = (1 to 10000).map(i => s"key_$i")
      .find(s => LakeTable.bucketOf(s, 4) != LakeTable.bucketOf(s, 16)).get
    val root = tmpDir("evolve-purge2")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 4)
    LakeMerge.mergeBatch(t, batch(Seq((k, "p", "c9", 9L, "D", null, null))), Some(("pg", 0L)))
    t.rebucket(16)
    LakeMerge.mergeBatch(t, batch(Seq((k, "p", "c5", 5L, "I", "sc", "old"))), Some(("pg", 1L)))
    LakeMerge.setWatermark(t, "c9", 9L)
    // major over the tombstone's OLD-era id: the read set CONTAINS the
    // old-era file; the current-era file (different id) is outside
    LakeMerge.compactOnly(t, Set(LakeTable.bucketOf(k, 4)))
    val t2 = LakeTable.load(spark, root)
    assert(LakeMerge.readRepo(t2, k).isEmpty,
      s"$k must stay deleted — purging its tombstone resurrects the c5 row")
    val raw = MergeEngine.dedupBatch(t2.read()).where($"repo" === k).collect()
    assert(raw.length == 1 && raw(0).getAs[String]("op") == "D",
      "the tombstone must be retained while layouts are mixed")
    // once every bucketed file is in one pass's read set, the purge fires
    LakeMerge.compactOnly(t2, (0 until 16).toSet)
    val t3 = LakeTable.load(spark, root)
    assert(MergeEngine.dedupBatch(t3.read()).where($"repo" === k).isEmpty,
      "the all-buckets major purges the tombstone AND the shadowed older row")
  }

  test("rebucket DURING a live stream with kill/restart: state converges, eras coexist") {
    val dir = tmpDir("evolve-live")
    val binlog = s"$dir/binlog"
    val n = 8000L
    graft.cdc.EventGen.writeBinlog(spark, binlog, n, segments = 8,
      nRepos = 80, pathsPerRepo = 10)
    val t = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")

    // a couple of epochs under the old layout, then EVOLVE mid-stream from
    // a SEPARATE table handle (optimistic-commit race with the ingest)
    val q1 = CdcStream.start(spark, t, metrics, binlog, s"$dir/ckpt",
      queryId = "evolve-live", maxFilesPerTrigger = 1, availableNow = false)
    var waited = 0
    while (t.fence("evolve-live") < 1L && waited < 300) { Thread.sleep(100); waited += 1 }
    assert(t.fence("evolve-live") >= 1L)
    LakeTable.load(spark, s"$dir/table").rebucket(32)
    q1.stop() // kill mid-stream, after the evolution
    val q2 = CdcStream.start(spark, t, metrics, binlog, s"$dir/ckpt",
      queryId = "evolve-live", maxFilesPerTrigger = 3)
    q2.awaitTermination()

    // byte-exact convergence to the fold oracle across the evolution
    val events = graft.cdc.EventGen.events(spark, n, nRepos = 80, pathsPerRepo = 10)
      .orderBy("lsn").as[graft.cdc.ChangeEvent].collect().toSeq
    val oracle = graft.cdc.MergeEngine.foldOracle(events).map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content)
    }
    val got = LakeMerge.readState(t).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect().map(x => (x._1, x._2) -> x._3).toMap
    assert(got == oracle, "live-evolved replay must converge to the fold oracle")

    val t2 = LakeTable.load(spark, s"$dir/table")
    // the stream's own compaction may already have migrated old-era files
    // to the current layout by drain time (that is the designed migration
    // path); whatever survives must carry a coherent era stamp
    val eras = t2.files.map(f => LakeTable.layoutOf(f, t2.snapshot)).toSet
    assert(eras.nonEmpty && eras.subsetOf(Set(4, 32)), s"incoherent eras: $eras")
    assert(t2.snapshot.layoutsList == Seq(4, 32))
    // point lookup across the era boundary
    val someRepo = oracle.keys.head._1
    assert(LakeMerge.readRepo(t2, someRepo).count() ==
      oracle.keys.count(_._1 == someRepo))
  }

  test("rebucket races concurrent mergeBatch writers without losing either") {
    val root = tmpDir("evolve-race")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch(rows(Seq("seed"), 0L)), Some(("race", 0L)))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try (1 to 4).foreach { i =>
        LakeMerge.mergeBatch(LakeTable.load(spark, root),
          batch(rows(Seq(s"w$i"), i * 1000L)), Some(("race", i.toLong)))
      } catch { case e: Throwable => errs.add(e) }
    })
    writer.start()
    t.rebucket(8) // races the writer's stage/commit cycle
    writer.join(120000)
    assert(errs.isEmpty, s"concurrent writer failed: ${errs.peek()}")
    val t2 = LakeTable.load(spark, root)
    assert(t2.snapshot.numBuckets == 8)
    val state = LakeMerge.readState(t2)
    assert(state.count() == 5 * 20, "no batch lost across the rebucket race")
    for (r <- Seq("seed", "w1", "w2", "w3", "w4"))
      assert(LakeMerge.readRepo(t2, r).count() == 20, s"point lookup lost $r")
    // every file readable under a coherent era stamp
    assert(t2.files.forall(f => Set(2, 8).contains(LakeTable.layoutOf(f, t2.snapshot))))
  }

  test("property: filesForKey admits every file that can hold the key (200 random keys, 3 eras)") {
    // metadata-only simulation (no data files, no Spark jobs): fabricate
    // file entries whose (bucket, layout) place random keys under each of
    // three eras, commit them as manifests, and check COMPLETENESS — a
    // point lookup that misses a file would be a silent wrong answer
    val root = tmpDir("evolve-prop")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 4)
    t.rebucket(16)
    t.rebucket(64)
    val rnd = new scala.util.Random(42)
    val eras = Seq(4, 16, 64)
    val keys = (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString)
    // each key gets one file in 1-3 random eras; plus a few L0 files
    val assignment: Seq[(String, DataFileMeta)] = keys.flatMap { k =>
      rnd.shuffle(eras).take(rnd.nextInt(3) + 1).map { era =>
        k -> DataFileMeta(s"$root/fake/${k}_$era.parquet",
          bucket = LakeTable.bucketOf(k, era), bytes = 1L, schemaId = 0,
          kind = "delta", layoutBuckets = era)
      }
    }
    val l0s = (0 until 5).map(i => DataFileMeta(s"$root/fake/l0_$i.parquet",
      bucket = LakeTable.L0Bucket, bytes = 1L, schemaId = 0, kind = "l0"))
    t.appendCommit(assignment.map(_._2) ++ l0s)
    val snap = t.snapshot
    keys.foreach { k =>
      val admitted = t.filesForKey(snap, k).map(_.path).toSet
      val required = assignment.collect { case (`k`, f) => f.path }.toSet ++
        l0s.map(_.path)
      val missed = required -- admitted
      assert(missed.isEmpty,
        s"filesForKey missed files for key '$k': $missed " +
          s"(buckets ${eras.map(e => e -> LakeTable.bucketOf(k, e))})")
    }
  }

  test("maybeRebucket: grows past the target, caps, and no-ops below threshold") {
    val root = tmpDir("evolve-auto")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 2)
    assert(!LakeMerge.maybeRebucket(t, 0L), "disabled target must no-op")
    assert(!LakeMerge.maybeRebucket(t, 1L), "empty table must no-op")
    LakeMerge.mergeBatch(t, batch(rows(Seq("r1", "r2", "r3", "r4"), 0L)), Some(("ar", 0L)))
    val bytes = t.files.map(_.bytes).sum
    assert(!LakeMerge.maybeRebucket(t, bytes), "mean below target must no-op")
    // target = 1/16 of the mean → doubles until mean fits: 2 → 32
    assert(LakeMerge.maybeRebucket(t, math.max(1L, bytes / 2 / 16)))
    assert(t.snapshot.numBuckets == 32, s"got ${t.snapshot.numBuckets}")
    assert(t.snapshot.layoutsList == Seq(2, 32))
    // cap respected
    assert(LakeMerge.maybeRebucket(t, 1L, maxBuckets = 64))
    assert(t.snapshot.numBuckets == 64)
    assert(!LakeMerge.maybeRebucket(t, 1L, maxBuckets = 64), "at cap must no-op")
    assert(LakeMerge.readRepo(t, "r1").count() == 20)
  }

  test("autoRebucketBytes: the ingest stream grows its own layout mid-replay") {
    val dir = tmpDir("evolve-autostream")
    val n = 6000L
    graft.cdc.EventGen.writeBinlog(spark, s"$dir/binlog", n, segments = 6,
      nRepos = 60, pathsPerRepo = 10)
    val t = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 2)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")
    // a tiny per-bucket target forces growth while the stream runs; high
    // compaction threshold keeps old-era files observable at the end
    val q = CdcStream.start(spark, t, metrics, s"$dir/binlog", s"$dir/ckpt",
      queryId = "auto-rb", maxFilesPerTrigger = 1, compactAtDeltas = 1000,
      autoRebucketBytes = 4096L)
    q.awaitTermination()
    val t2 = LakeTable.load(spark, s"$dir/table")
    assert(t2.snapshot.numBuckets > 2, "layout must have grown mid-replay")
    assert(t2.snapshot.layoutsList.head == 2)
    // byte-exact convergence across however many evolutions fired
    val events = graft.cdc.EventGen.events(spark, n, nRepos = 60, pathsPerRepo = 10)
      .orderBy("lsn").as[graft.cdc.ChangeEvent].collect().toSeq
    val oracle = graft.cdc.MergeEngine.foldOracle(events).map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content)
    }
    val got = LakeMerge.readState(t2).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect().map(x => (x._1, x._2) -> x._3).toMap
    assert(got == oracle)
    val someRepo = oracle.keys.head._1
    assert(LakeMerge.readRepo(t2, someRepo).count() == oracle.keys.count(_._1 == someRepo))
  }

  test("changelog-as-stream crosses a rebucket cleanly (metadata commit adds no changes)") {
    val root = tmpDir("evolve-cl")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch(rows(Seq("c1", "c2"), 0L)), Some(("cl", 0L)))
    t.rebucket(8)
    LakeMerge.mergeBatch(t, batch(rows(Seq("c3", "c1"), 1000L, v = "y")), Some(("cl", 1L)))
    val got = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft").option("startingVersion", 0)
      .load(root)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        got ++= df.collect(); ()
      })
      .option("checkpointLocation", tmpDir("evolve-cl-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every change row streamed exactly once; the rebucket version adds none
    assert(got.size == 2 * 2 * 20, s"expected 80 change rows, got ${got.size}")
    // streamed changes LWW-resolve to the table's exact evolved state
    val streamed = spark.createDataFrame(
      spark.sparkContext.parallelize(got.toSeq), got.head.schema)
    val resolved = MergeEngine.liveView(MergeEngine.dedupBatch(
      streamed.select(CdcStream.binlogSchema.fieldNames.map(col): _*)))
      .collect().map(_.toString).sorted.toSeq
    val direct = LakeMerge.readState(t).collect().map(_.toString).sorted.toSeq
    assert(resolved == direct)
  }

  test("SQL surface: CALL graft.rebucket + point lookup through the catalog") {
    val warehouse = tmpDir("evolve-wh")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$warehouse/ns"))
    val path = s"$warehouse/ns/ev"
    val t = LakeTable.create(spark, path, CdcStream.binlogSchema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch(rows(Seq("a1", "a2"), 0L)), Some(("ev", 0L)))
    val sql = graft.sql.GraftSql.attach(spark, root = Some(warehouse))
    val res = sql.sql("CALL graft.rebucket('ns.ev', 8)").collect()
    assert(res.length == 1 && res(0).getInt(1) == 8 && res(0).getString(2) == "2,8")
    LakeMerge.mergeBatch(LakeTable.load(spark, path),
      batch(rows(Seq("a3"), 1000L)), Some(("ev", 1L)))
    val got = sql.sql("SELECT * FROM graft.ns.ev WHERE repo = 'a2'").collect()
    assert(got.length == 20)
    assert(sql.sql("SELECT * FROM graft.ns.ev").count() == 60)
    val props = sql.sql("SHOW TBLPROPERTIES graft.ns.ev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("num-buckets") == "8" && props("bucket-layouts") == "2,8")
    val layouts = sql.sql("SELECT DISTINCT layout_buckets FROM graft.ns.ev.files")
      .collect().map(_.getInt(0)).toSet
    assert(layouts == Set(2, 8))
    // cost-based growth via CALL: below target no-op, tiny target grows
    val noop = sql.sql("CALL graft.auto_rebucket('ns.ev', 1000000000)").collect()
    assert(!noop(0).getBoolean(0) && noop(0).getInt(1) == 8)
    val grew = sql.sql("CALL graft.auto_rebucket('ns.ev', 1, 64)").collect()
    assert(grew(0).getBoolean(0) && grew(0).getInt(1) == 64)
    assert(sql.sql("SELECT * FROM graft.ns.ev WHERE repo = 'a2'").count() == 20)
  }
}
