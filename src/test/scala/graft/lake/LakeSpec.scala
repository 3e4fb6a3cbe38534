package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): VersionedTable = {
    val root = Files.createTempDirectory("graft-lake-spec").toString
    VersionedTable(root, "k")
  }

  private def rows(n: Range, tag: String) =
    n.map(i => (i.toLong, tag, i * 10.0)).toDF("k", "tag", "v")

  test("append creates versions; each snapshot is immutable and replayable") {
    val t = freshTable()
    t.append(rows(1 to 100, "a").repartition(2))
    t.append(rows(101 to 150, "b").repartition(2))
    assert(t.currentVersion() == 2)
    assert(t.read(spark, asOf = Some(1)).count() == 100)
    assert(t.read(spark).count() == 150)
    // version 1 unchanged by the later commit
    assert(t.read(spark, asOf = Some(1)).agg(max("k")).as[Long].head() == 100L)
  }

  test("merge upserts: matched keys replaced, unmatched inserted; old version intact") {
    val t = freshTable()
    t.append(rows(1 to 100, "base"))
    val updates = (90 to 110).map(i => (i.toLong, "upd", -1.0)).toDF("k", "tag", "v")
    t.merge(updates)

    val cur = t.read(spark)
    assert(cur.count() == 110) // 100 base − 11 replaced + 21 upserts ⇒ 89 + 21
    assert(cur.filter($"tag" === "upd").count() == 21)
    assert(cur.filter($"k" === 95 && $"tag" === "base").count() == 0)
    // time travel still sees pre-merge state
    assert(t.read(spark, asOf = Some(1)).filter($"tag" === "upd").count() == 0)
  }

  test("merge rewrites only files whose zone overlaps an update key") {
    val t = freshTable()
    // two disjoint key zones in separate files via repartitionByRange
    t.append(rows(1 to 100, "lo").repartitionByRange(2, $"k"))
    val before = t.liveFiles().toSet
    assert(before.size >= 2)

    val loMax = t.snapshot(1).files.map(_.maxKey).min // end of the low zone
    val updates = Seq((1L, "upd", 0.0)).toDF("k", "tag", "v")
    t.merge(updates)

    val after = t.liveFiles().toSet
    val carried = before.intersect(after)
    // the file(s) whose zone excludes key 1 are carried by reference
    assert(carried.nonEmpty, s"no file carried: zones up to $loMax should be untouched")
    assert(t.read(spark).count() == 100)
  }

  test("readRange prunes non-overlapping files before Spark lists them") {
    val t = freshTable()
    t.append(rows(1 to 1000, "a").repartitionByRange(4, $"k"))
    val all = t.liveFiles()
    assert(all.size == 4)

    val pruned = t.readRange(spark, 990, 995)
    // the scan's input files are a strict subset of the snapshot
    val scanned = pruned.inputFiles.toSet
    assert(scanned.size < all.size, s"expected pruning, scanned ${scanned.size}/${all.size}")
    assert(pruned.count() == 6)

    // fully-disjoint range: empty result, schema preserved
    val none = t.readRange(spark, 5000, 6000)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "tag", "v"))
  }

  test("compact rewrites layout, not data; vacuum drops only unreferenced files") {
    val t = freshTable()
    t.append(rows(1 to 50, "a").repartition(4))
    t.append(rows(51 to 60, "b").repartition(3))
    val beforeData = t.read(spark).orderBy("k").collect().toSeq
    t.compact(spark, targetFiles = 1)
    assert(t.liveFiles().size == 1)
    assert(t.read(spark).orderBy("k").collect().toSeq == beforeData)

    val deleted = t.vacuum(retainVersions = 1)
    assert(deleted >= 7) // v1's 4 + v2's 3 data files are unreferenced
    // latest still fully readable; dropped version is gone
    assert(t.read(spark).count() == 60)
    intercept[IllegalArgumentException](t.snapshot(1))
  }

  test("additive schema evolution: old files read back with nulls, no rewrite") {
    val t = freshTable()
    t.append(rows(1 to 10, "a")) // (k, tag, v)
    val v1Files = t.liveFiles().toSet

    val widened = (11 to 15).map(i => (i.toLong, "b", i * 10.0, s"extra$i"))
      .toDF("k", "tag", "v", "note")
    t.append(widened)
    // evolution did not rewrite version-1 data files
    assert(v1Files.subsetOf(t.liveFiles().toSet))

    val cur = t.read(spark)
    assert(cur.columns.toSeq == Seq("k", "tag", "v", "note"))
    assert(cur.filter($"k" <= 10 && $"note".isNull).count() == 10)
    assert(cur.filter($"k" > 10 && $"note".isNotNull).count() == 5)
    // time travel predates the evolution: no `note` column at v1
    assert(t.read(spark, asOf = Some(1)).columns.toSeq == Seq("k", "tag", "v"))

    // merge with evolved updates keeps working (old files gain nulls)
    t.merge(Seq((1L, "upd", 0.0, "n1")).toDF("k", "tag", "v", "note"))
    val merged = t.read(spark)
    assert(merged.filter($"k" === 1 && $"note" === "n1").count() == 1)
    assert(merged.count() == 15)

    // a type change is rejected loudly
    intercept[IllegalArgumentException] {
      t.append(Seq((99, "x", 1.0)).toDF("k", "tag", "v")) // k int, table k bigint
    }
  }

  test("tableCount answers count(*) from manifest stats alone") {
    val t = freshTable()
    t.append(rows(1 to 123, "a").repartition(3))
    t.merge(rows(120 to 130, "b"))
    assert(t.tableCount() == t.read(spark).count())
    assert(t.tableCount(asOf = Some(1)) == 123)
    assert(VersionedTable(
      Files.createTempDirectory("graft-lake-empty").toString, "k").tableCount() == 0L)
  }

  test("compactByRange restores pruning power after interleaved appends") {
    val t = freshTable()
    // interleaved key ranges: every file's zone spans ~the whole keyspace
    t.append((1 to 1000 by 4).map(i => (i.toLong, "a", 0.0)).toDF("k", "tag", "v"))
    t.append((2 to 1000 by 4).map(i => (i.toLong, "b", 0.0)).toDF("k", "tag", "v"))
    t.append((3 to 1000 by 4).map(i => (i.toLong, "c", 0.0)).toDF("k", "tag", "v"))
    t.append((4 to 1000 by 4).map(i => (i.toLong, "d", 0.0)).toDF("k", "tag", "v"))
    val smearedScan = t.readRange(spark, 10, 40).inputFiles.length
    assert(smearedScan >= 4, "interleaved zones should defeat pruning")

    val data = t.read(spark).orderBy("k").collect().toSeq
    t.compactByRange(spark, targetFiles = 4)
    assert(t.read(spark).orderBy("k").collect().toSeq == data) // layout only

    val clusteredScan = t.readRange(spark, 10, 40).inputFiles.length
    assert(clusteredScan == 1,
      s"disjoint zones should prune to one file, scanned $clusteredScan")
    assert(t.readRange(spark, 10, 40).count() == 31)
  }

  test("compactZOrder + declared stats: zone pruning works on BOTH dimensions") {
    val root = Files.createTempDirectory("graft-lake-z").toString
    val t = VersionedTable(root, "k", statsCols = Seq("v"))
    // k and v deliberately anti-correlated so one-dimensional range
    // clustering cannot serve both
    val data = (1 to 4096).map(i => (i.toLong, "x", (4097 - i) * 1.0))
      .toDF("k", "tag", "v")
    t.append(data.repartition(8)) // random layout: zones span everything
    val before = t.readRangeOn(spark, "v", 1.0, 256.0).inputFiles.length
    assert(before == 8, "random layout must defeat value pruning")

    t.compactZOrder(spark, Seq("k", "v"), targetFiles = 16)
    assert(t.read(spark).count() == 4096)
    val filesK = t.readRange(spark, 1, 256).inputFiles.length
    val filesV = t.readRangeOn(spark, "v", 1.0, 256.0).inputFiles.length
    assert(filesK < 16 && filesV < 16,
      s"z-order must narrow both dimensions: k=$filesK v=$filesV of 16")
    assert(t.readRangeOn(spark, "v", 1.0, 256.0).count() == 256)

    // range clustering on k: perfect on k, smeared on v
    t.compactByRange(spark, targetFiles = 16)
    assert(t.readRange(spark, 1, 256).inputFiles.length == 1)
    assert(t.readRangeOn(spark, "v", 1.0, 256.0).count() == 256)
  }

  test("stats columns absent from a batch (pre-evolution) scan conservatively") {
    val root = Files.createTempDirectory("graft-lake-st").toString
    val t = VersionedTable(root, "k", statsCols = Seq("w"))
    t.append(rows(1 to 50, "a")) // (k, tag, v): no `w` column yet
    t.append((51 to 60).map(i => (i.toLong, "b", 0.0, i * 1.0))
      .toDF("k", "tag", "v", "w"))
    // old files carry no `w` zone → conservatively scanned, not dropped
    val out = t.readRangeOn(spark, "w", 55.0, 58.0)
    assert(out.count() == 4)
    assert(out.inputFiles.nonEmpty)
  }

  test("bloom index: point reads skip files the value never landed in") {
    val root = Files.createTempDirectory("graft-lake-bloom").toString
    val t = VersionedTable(root, "k", bloomCols = Seq("tag"))
    // 4096 rows over 1024 distinct tags in a random 8-file layout:
    // each tag lands in at most 4 files, but every file's key/value
    // zones span everything — only a bloom can prune equality here
    t.append((1 to 4096).map(i => (i.toLong, s"u${i % 1024}", i * 1.0))
      .toDF("k", "tag", "v").repartition(8))

    val out = t.readEquals(spark, "tag", "u17")
    assert(out.count() == 4)
    assert(out.inputFiles.length <= 4,
      s"bloom must prune the random layout: ${out.inputFiles.length} of 8 files")
    // definitely-absent value: no file survives the probe
    assert(t.readEquals(spark, "tag", "no-such-tag").count() == 0)
    assert(t.readEquals(spark, "tag", "no-such-tag").inputFiles.isEmpty)

    // files committed before the bloom declaration scan conservatively
    val root2 = Files.createTempDirectory("graft-lake-bloom2").toString
    VersionedTable(root2, "k").append(rows(1 to 50, "old"))
    val t2 = VersionedTable(root2, "k", bloomCols = Seq("tag"))
    t2.append(rows(51 to 60, "new"))
    assert(t2.readEquals(spark, "tag", "old").count() == 50)
    // bloomless v1 files must all stay in the scan set; the bloom'd v2
    // file is pruned for an absent value
    val preFiles = t2.liveFiles(asOf = Some(1)).length
    assert(t2.readEquals(spark, "tag", "none").inputFiles.length == preFiles,
      "exactly the bloomless pre-declaration files must be scanned")
  }

  test("refreshMix: budgets attained, idempotent, re-attained across upserts") {
    val root = Files.createTempDirectory("graft-lake-mix").toString
    val t = VersionedTable(root, "k")
    // two strata with token counts 10..~400; budgets well under supply
    def feed(r: Range) = r.map { i =>
      (i.toLong, if (i % 3 == 0) "fr" else "en", (i % 40 + 1) * 10L)
    }.toDF("k", "lang", "toks")
    t.append(feed(1 to 300))
    val targets = Map("en" -> 4000L, "fr" -> 2500L)
    t.refreshMix(spark, "lang", "toks", targets)

    def attained(tbl: VersionedTable) = tbl.read(spark)
      .groupBy("lang").agg(sum("toks").as("got"))
      .as[(String, Long)].collect().toMap
    val got1 = attained(t)
    val maxDoc = 400L
    targets.foreach { case (lang, tgt) =>
      assert(got1(lang) >= tgt && got1(lang) < tgt + maxDoc,
        s"$lang: got ${got1(lang)} for target $tgt (overshoot must be < one doc)")
    }
    // idempotent: a second refresh keeps exactly the same rows
    val keys1 = t.read(spark).select("k").as[Long].collect().sorted.toSeq
    t.refreshMix(spark, "lang", "toks", targets)
    assert(t.read(spark).select("k").as[Long].collect().sorted.toSeq == keys1)

    // upsert a fresh batch, refresh again: budgets re-attained, and the
    // survivors are exactly the weighted sample of the live rows
    t.merge(feed(301 to 450))
    val live = t.read(spark)
    val expect = graft.operators.ScaleOps
      .weightedTokenSample(live, "k", "lang", "toks", targets)
      .select("k").as[Long].collect().sorted.toSeq
    t.refreshMix(spark, "lang", "toks", targets)
    val got2 = attained(t)
    targets.foreach { case (lang, tgt) =>
      assert(got2(lang) >= tgt && got2(lang) < tgt + maxDoc)
    }
    assert(t.read(spark).select("k").as[Long].collect().sorted.toSeq == expect)
    // the full pre-mix corpus is still one time-travel away
    assert(t.tableCount(asOf = Some(1)) == 300)
  }

  test("changes: merge feeds inserts+updates, compaction feeds nothing, mix feeds deletes") {
    val t = freshTable()
    t.append(rows(1 to 100, "base"))
    // update 90..100 with DIFFERENT values, insert 101..110; rows the
    // rewrite carries verbatim must not appear in the feed
    t.merge((90 to 110).map(i => (i.toLong, "upd", -1.0)).toDF("k", "tag", "v"))

    val feed = t.changes(spark, 1, 2).cache()
    assert(feed.filter($"_change_type" === "insert").select("k").as[Long]
      .collect().sorted.toSeq == (101L to 110L))
    assert(feed.filter($"_change_type" === "update").select("k").as[Long]
      .collect().sorted.toSeq == (90L to 100L))
    assert(feed.filter($"_change_type" === "delete").count() == 0)
    // updates carry the NEW values
    assert(feed.filter($"_change_type" === "update").select("v").as[Double]
      .collect().forall(_ == -1.0))

    // layout-only commit: empty feed even though every file changed
    t.compactByRange(spark, targetFiles = 4)
    assert(t.changes(spark, 2, 3).isEmpty)

    // an update that nulls a field surfaces the null, not the old value
    t.merge(Seq((5L, null.asInstanceOf[String], 5.0)).toDF("k", "tag", "v"))
    val nulled = t.changes(spark, 3, 4).filter($"k" === 5)
    assert(nulled.count() == 1)
    assert(nulled.head().isNullAt(nulled.columns.indexOf("tag")))

    // refreshMix drops rows → the feed reports them as deletes, with
    // the OLD values readable
    t.refreshMix(spark, "tag", "v", Map("base" -> 100L))
    val mixFeed = t.changes(spark, 4, 5)
    assert(mixFeed.filter($"_change_type" === "delete").count() > 0)
    assert(mixFeed.filter($"_change_type" === "insert").count() == 0)
  }

  test("incremental aggregate: maintained state equals the recompute exactly") {
    val t = freshTable()
    t.append(rows(1 to 100, "a"))
    val g = Seq("tag"); val s = Seq("v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"cnt", $"sum_v".cast("double"))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    var state = IncrementalAgg.init(t.read(spark), g, s)

    // merge: updates (some switching group) + inserts
    t.merge((90 to 120).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i * 3.0)).toDF("k", "tag", "v"))
    state = IncrementalAgg.maintain(state, t.changes(spark, 1, 2, preImages = true), g, s)
    assert(snap(state) == snap(IncrementalAgg.init(t.read(spark), g, s)))

    // deletes (mix refresh drops rows) maintain through too
    t.refreshMix(spark, "tag", "v", Map("a" -> 2000L, "b" -> 500L))
    state = IncrementalAgg.maintain(state, t.changes(spark, 2, 3, preImages = true), g, s)
    assert(snap(state) == snap(IncrementalAgg.init(t.read(spark), g, s)))

    // a postimage-only feed cannot subtract update preimages — rejected
    // loudly at execution, never a silently wrong aggregate
    val thrown = intercept[Exception](
      IncrementalAgg.maintain(state, t.changes(spark, 1, 2), g, s).collect())
    assert(thrown.getMessage.contains("preImages"))
  }

  test("CHECK constraints: violating commits abort with no version and no orphans") {
    val root = Files.createTempDirectory("graft-lake-ck").toString
    val t = VersionedTable(root, "k", checks = Seq("v >= 0", "length(tag) > 0"))
    t.append(rows(1 to 50, "ok"))
    assert(t.currentVersion() == 1)

    // a violating append: loud failure naming the check, version
    // unchanged, data dir cleaned up
    val bad = Seq((51L, "x", -5.0), (52L, "x", 3.0)).toDF("k", "tag", "v")
    val e = intercept[IllegalArgumentException](t.append(bad))
    assert(e.getMessage.contains("v >= 0") && e.getMessage.contains("1 rows"))
    assert(t.currentVersion() == 1)
    assert(t.read(spark).count() == 50)
    assert(!Files.exists(java.nio.file.Paths.get(root, "data", "v00002")))

    // a violating MERGE aborts the same way (survivor rewrite included)
    val e2 = intercept[IllegalArgumentException](
      t.merge(Seq((10L, "", 1.0)).toDF("k", "tag", "v")))
    assert(e2.getMessage.contains("length(tag) > 0"))
    assert(t.currentVersion() == 1)

    // NULL passes (SQL CHECK semantics) — and a later valid commit
    // proves the aborted attempts left no residue in the version chain
    t.append(Seq((60L, "t", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "tag", "v"))
    assert(t.currentVersion() == 2)
    assert(t.read(spark).count() == 51)
  }

  test("materialized aggregate: incremental refresh tracks the table exactly") {
    val t = freshTable()
    val aggRoot = Files.createTempDirectory("graft-lake-magg").toString
    val m = new MaterializedAgg(t, aggRoot, Seq("tag"), Seq("v"))
    def recompute() = IncrementalAgg.init(t.read(spark), Seq("tag"), Seq("v"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"cnt", $"sum_v".cast("double"))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

    t.append(rows(1 to 100, "a"))
    m.refresh(spark) // first refresh: full aggregate
    assert(snap(m.read(spark)) == snap(recompute()))

    t.merge((50 to 130).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i * 2.0)).toDF("k", "tag", "v"))
    t.append(rows(200 to 220, "c"))
    m.refresh(spark) // catches up across BOTH commits in one feed
    assert(snap(m.read(spark)) == snap(recompute()))
    assert(m.currentVersion() == t.currentVersion())

    // replayed refresh (crash recovery): cursor already current, no-op
    val before = snap(m.read(spark))
    m.refresh(spark)
    assert(snap(m.read(spark)) == before)
  }

  test("deleteRange rewrites only overlapping files; feed and time travel agree") {
    val root = Files.createTempDirectory("graft-lake-del").toString
    val t = VersionedTable(root, "k")
    t.append(rows(1 to 100, "a").repartitionByRange(4, $"k")
      .sortWithinPartitions($"k"))
    val before = t.liveFiles().toSet

    t.deleteRange(spark, 10, 40)
    assert(t.read(spark).count() == 69) // 31 keys removed
    assert(t.read(spark).filter($"k".between(10, 40)).count() == 0)
    // files whose zones miss [10,40] carried by reference, not rewritten
    val after = t.liveFiles().toSet
    assert((before intersect after).nonEmpty, "non-overlapping files must carry over")
    // the change feed reports exactly the deleted keys
    val feed = t.changes(spark, 1, 2)
    assert(feed.filter($"_change_type" =!= "delete").count() == 0)
    assert(feed.select("k").as[Long].collect().sorted.toSeq == (10L to 40L))
    // time travel still sees the pre-delete state
    assert(t.read(spark, asOf = Some(1)).count() == 100)
    // an out-of-range delete is a no-op WITHOUT a new version
    val v = t.currentVersion()
    t.deleteRange(spark, 500, 600)
    assert(t.currentVersion() == v)
  }

  test("history lists every version's files, rows, and txn markers") {
    val t = freshTable()
    t.append(rows(1 to 100, "a").repartition(2))
    t.upsertIfNew(rows(101 to 110, "b"), "writer-x", 7L)
    t.deleteRange(spark, 1, 50)
    val h = t.history(spark).orderBy("version")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getString(3)))
    assert(h.length == 3)
    assert(h(0)._2 == 100 && h(1)._2 == 110 && h(2)._2 == 60)
    assert(h(1)._3 == "writer-x=7" && h(2)._3 == "writer-x=7",
      "txn markers must carry forward in history")
  }

  test("racing commits: exactly one winner, loser fails cleanly") {
    val t = freshTable()
    t.append(rows(1 to 10, "a"))
    // both writers resolved version 2; the first publish wins the link
    val racingManifest = java.nio.file.Paths.get(t.root, "_log", "v00002.json")
    Files.writeString(racingManifest, "")
    intercept[java.util.ConcurrentModificationException] {
      t.commit(2, Seq.empty)
    }
    // the losing commit left no manifest damage: v2 is still the racer's
    assert(Files.readString(racingManifest).isEmpty)
    // and the loser's retry against a fresh read succeeds as version 3
    // (the racer's v2 was an empty overwrite, so v3 = its files + the new 10)
    t.append(rows(11 to 20, "b"))
    assert(t.currentVersion() == 3 && t.read(spark).count() == 10)
  }

  test("empty update batch and merge-into-empty are rejected loudly") {
    val t = freshTable()
    intercept[IllegalArgumentException](t.merge(rows(1 to 5, "u")))
    t.append(rows(1 to 5, "a"))
    intercept[IllegalArgumentException](t.merge(rows(1 to 0, "u")))
  }
}
