package graft.lake

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One data file of a table snapshot, with its zone-map stats: the key
  * zone always, plus optional [lo, hi] zones for the table's declared
  * numeric stats columns (cast to double — zone maps need ordering, not
  * exactness), plus optional bloom bitsets (base64) for the declared
  * bloom columns — the equality-predicate twin of the zone maps.
  */
final case class FileEntry(
    path: String,
    rows: Long,
    minKey: Long,
    maxKey: Long,
    colStats: Map[String, (Double, Double)] = Map.empty,
    blooms: Map[String, String] = Map.empty)

/** An immutable table version: the full file list (not a delta), plus
  * the latest committed transaction id per writer application — the
  * idempotence state for exactly-once streaming upserts. Both are
  * SNAPSHOT state (carried forward whole into every commit), so any
  * version is resolved from exactly one manifest and vacuum cannot
  * amputate a writer's progress marker.
  */
final case class Snapshot(
    version: Int,
    files: Seq[FileEntry],
    txns: Map[String, Long] = Map.empty,
    schemaDdl: Option[String] = None)

/** Versioned lake table: snapshot isolation, time travel, file-level
  * zone-map skipping, copy-on-write MERGE, compaction and vacuum over
  * plain parquet — the modern extension of the reference's lake
  * construction loop (read → clean → write parquet → re-crawl catalog,
  * `scripts/...pyspark.py:104-132`), where every write clobbered the
  * single `output/result.parquet` and history was gone.
  *
  * Layout:
  * {{{
  *   <root>/_log/v00001.json      one JSON-lines manifest per version,
  *                                each line one FileEntry — a FULL
  *                                snapshot, so readers resolve any
  *                                version from exactly one file
  *   <root>/data/v00001/part-*    parquet written by the commit that
  *                                created that version (never mutated)
  * }}}
  *
  * Scale design:
  *   - The manifest is metadata: O(live files), read on the driver. At
  *     100 TB with ~1 GB files that is ~10⁵ lines of JSON — megabytes.
  *   - MERGE is copy-on-write with file pruning: only files whose
  *     [minKey, maxKey] zone contains an update key are rewritten; the
  *     untouched majority is carried by reference. Cost is
  *     O(affected files + update batch), not O(table).
  *   - `readRange` prunes files by zone map BEFORE Spark lists them —
  *     the same trick as parquet row-group skipping, one level up. The
  *     residual per-row filter is still pushed to the scan.
  *   - Commits are atomic via hard-link publish (create-if-absent): two
  *     racing writers produce ONE winner and one clean
  *     ConcurrentModificationException — optimistic concurrency,
  *     single-winner, no torn manifest. (On an object store this
  *     primitive would come from a conditional PUT or a catalog
  *     service; the protocol is unchanged.)
  *   - Stats are collected by scanning ONLY the files the commit just
  *     wrote (grouped by `input_file_name`), never the whole table.
  *
  * The key column must be numeric (cast to long for zone stats) — the
  * usual shape for an upsert key. Multi-column or string keys would
  * store min/max as canonical strings; not needed here.
  */
final class VersionedTable private (
    val root: String,
    val keyCol: String,
    val statsCols: Seq[String],
    val bloomCols: Seq[String],
    val bloomBits: Int,
    val checks: Seq[String]) {

  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(root, "_log")
  private def dataDir(v: Int): String = s"$root/data/v${"%05d".format(v)}"
  private def manifestPath(v: Int): Path = logDir.resolve(f"v$v%05d.json")

  // ------------------------------------------------------------ manifest

  /** Latest committed version, 0 if the table is empty of commits. */
  def currentVersion(): Int = {
    if (!Files.isDirectory(logDir)) return 0
    Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{5}\\.json") => s.substring(1, 6).toInt }
      .foldLeft(0)(math.max)
  }

  /** The file list and txn state of a committed version. Manifest lines
    * are discriminated by field: `path` → a FileEntry, `txns` → the
    * writer-progress map.
    */
  def snapshot(version: Int): Snapshot = {
    require(version >= 1, s"version $version: versions start at 1")
    val p = manifestPath(version)
    require(Files.exists(p), s"version $version does not exist under $root")
    var txns = Map.empty[String, Long]
    var schemaDdl = Option.empty[String]
    val files = Seq.newBuilder[FileEntry]
    Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach { line =>
      val n = mapper.readTree(line)
      if (n.has("path")) {
        var stats = Map.empty[String, (Double, Double)]
        if (n.has("stats")) {
          val st = n.get("stats")
          st.fieldNames().asScala.foreach { c =>
            val arr = st.get(c)
            stats += c -> (arr.get(0).asDouble(), arr.get(1).asDouble())
          }
        }
        var blooms = Map.empty[String, String]
        if (n.has("blooms")) {
          val bl = n.get("blooms")
          bl.fieldNames().asScala.foreach(c => blooms += c -> bl.get(c).asText())
        }
        files += FileEntry(n.get("path").asText(), n.get("rows").asLong(),
          n.get("minKey").asLong(), n.get("maxKey").asLong(), stats, blooms)
      }
      else {
        if (n.has("txns")) {
          val t = n.get("txns")
          t.fieldNames().asScala.foreach(app => txns += app -> t.get(app).asLong())
        }
        if (n.has("schemaDdl")) schemaDdl = Some(n.get("schemaDdl").asText())
      }
    }
    Snapshot(version, files.result(), txns, schemaDdl)
  }

  /** Atomic commit: render the manifest to a temp file, publish it with
    * a hard link (fails atomically if the version was taken), clean up.
    * Package-private so the spec can drive the two-writers-one-version
    * race against the primitive itself.
    */
  private[lake] def commit(
      version: Int,
      files: Seq[FileEntry],
      txns: Map[String, Long] = Map.empty,
      schemaDdl: Option[String] = None): Snapshot = {
    Files.createDirectories(logDir)
    val tmp = Files.createTempFile(logDir, s"v$version-", ".tmp")
    val metaLine =
      if (txns.isEmpty && schemaDdl.isEmpty) Seq.empty
      else {
        val o = mapper.createObjectNode()
        if (txns.nonEmpty) {
          val t = o.putObject("txns")
          txns.toSeq.sortBy(_._1).foreach { case (app, id) => t.put(app, id) }
        }
        schemaDdl.foreach(s => o.put("schemaDdl", s))
        Seq(o.toString)
      }
    val body = (metaLine ++ files.map { f =>
      val o = mapper.createObjectNode()
      o.put("path", f.path); o.put("rows", f.rows)
      o.put("minKey", f.minKey); o.put("maxKey", f.maxKey)
      if (f.colStats.nonEmpty) {
        val st = o.putObject("stats")
        f.colStats.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val arr = st.putArray(c); arr.add(lo); arr.add(hi)
        }
      }
      if (f.blooms.nonEmpty) {
        val bl = o.putObject("blooms")
        f.blooms.toSeq.sortBy(_._1).foreach { case (c, b64) => bl.put(c, b64) }
      }
      o.toString
    }).mkString("", "\n", "\n")
    Files.writeString(tmp, body, StandardOpenOption.TRUNCATE_EXISTING)
    try Files.createLink(manifestPath(version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version $version was committed by another writer")
    } finally Files.deleteIfExists(tmp)
    Snapshot(version, files, txns, schemaDdl)
  }

  /** Additive schema evolution: existing fields keep their position and
    * type (a type CHANGE is rejected loudly); fields new in `incoming`
    * append at the end. Old data files simply lack the new columns —
    * reads fill them with null via the manifest schema, no file is
    * rewritten.
    */
  private def evolveSchema(
      prev: Option[String],
      incoming: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types.StructType
    prev match {
      case None => incoming.toDDL
      case Some(ddl) =>
        val base = StructType.fromDDL(ddl)
        val byName = incoming.fields.map(f => f.name -> f).toMap
        base.fields.foreach { f =>
          byName.get(f.name).foreach { inc =>
            require(inc.dataType == f.dataType,
              s"schema evolution cannot change column '${f.name}' from " +
                s"${f.dataType.sql} to ${inc.dataType.sql}")
          }
        }
        val known = base.fieldNames.toSet
        StructType(base.fields ++ incoming.fields.filterNot(f => known(f.name))).toDDL
    }
  }

  /** Write `df` under the next version's data dir and collect per-file
    * zone stats by scanning ONLY the new files.
    */
  private def writeFiles(df: DataFrame, version: Int): Seq[FileEntry] = {
    val dir = dataDir(version)
    df.write.mode("errorifexists").parquet(dir)
    val spark = df.sparkSession
    val listed = spark.read.parquet(dir)
    // stats/bloom columns the written frame actually has (schema
    // evolution: a pre-evolution batch legitimately lacks late-added
    // columns)
    val present = statsCols.filter(listed.columns.contains)
    val presentB = bloomCols.filter(listed.columns.contains)
    val statAggs = present.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"), max(col(c).cast("double")).as(s"__hi_$c")))
    val bloomAggs = presentB.map(c =>
      graft.functions.BloomSketch.sketch(col(c).cast("string"), bloomBits).as(s"__bf_$c"))
    // CHECK constraints ride the same single stats pass: a violation
    // count per declared check (SQL semantics — NULL passes, only
    // check IS FALSE violates)
    val checkAggs = checks.zipWithIndex.map { case (c, i) =>
      sum(when(expr(c) <=> lit(false), 1L).otherwise(0L)).as(s"__ck_$i")
    }
    val aggs = Seq(
      count(lit(1)).as("rows"),
      min(col(keyCol).cast("long")).as("minKey"),
      max(col(keyCol).cast("long")).as("maxKey")) ++ statAggs ++ bloomAggs ++ checkAggs
    val bloomBase = 4 + present.size * 2
    val checkBase = bloomBase + presentB.size
    val perFile = listed
      .groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per file just written
      .filter(_.getLong(1) > 0) // an all-empty write leaves a schema-only file
    // enforce checks BEFORE the manifest exists: a violating batch
    // leaves no committed version and no orphan data
    val violated = checks.zipWithIndex
      .map { case (c, i) => c -> perFile.map(_.getLong(checkBase + i)).sum }
      .filter(_._2 > 0)
    if (violated.nonEmpty) {
      val d = Paths.get(dir)
      if (Files.exists(d))
        Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      throw new IllegalArgumentException(
        "CHECK constraint violation, commit aborted: " +
          violated.map { case (c, n) => s"'$c' ($n rows)" }.mkString(", "))
    }
    perFile
      .map { r =>
        val stats = present.zipWithIndex.flatMap { case (c, i) =>
          val lo = 4 + i * 2
          if (r.isNullAt(lo) || r.isNullAt(lo + 1)) None // all-null column in this file
          else Some(c -> (r.getDouble(lo), r.getDouble(lo + 1)))
        }.toMap
        val blooms = presentB.zipWithIndex.map { case (c, j) =>
          c -> graft.functions.BloomSketch.toBase64(
            r.getSeq[Long](bloomBase + j).toArray)
        }.toMap
        FileEntry(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), stats, blooms)
      }
      .toSeq.sortBy(_.path)
  }

  // ------------------------------------------------------------- writes

  /** Append-commit: previous snapshot's files plus the new ones. */
  def append(df: DataFrame): Snapshot = appendTxn(df, None)

  private def appendTxn(df: DataFrame, txn: Option[(String, Long)]): Snapshot = {
    val prev = currentVersion()
    val base = if (prev == 0) Snapshot(0, Seq.empty) else snapshot(prev)
    val next = prev + 1
    val schema = evolveSchema(base.schemaDdl, df.schema)
    commit(next, base.files ++ writeFiles(df, next), base.txns ++ txn, Some(schema))
  }

  /** Overwrite-commit: the new files replace everything (prior versions
    * stay readable until vacuumed). Writer txn markers survive — they
    * track writer progress, not data. The schema RESETS to the new
    * frame's (overwrite replaces the table; evolution rules apply to
    * append/merge).
    */
  def overwrite(df: DataFrame): Snapshot = {
    val prev = currentVersion()
    val txns = if (prev == 0) Map.empty[String, Long] else snapshot(prev).txns
    val next = prev + 1
    commit(next, writeFiles(df, next), txns, Some(df.schema.toDDL))
  }

  /** Copy-on-write MERGE (upsert, latest-wins by whole row): rows of
    * `updates` replace current rows with the same key; unmatched update
    * keys are inserted.
    *
    * File pruning: only data files whose [minKey, maxKey] zone contains
    * at least one update key are rewritten — the untouched files are
    * carried into the new snapshot by reference. The distinct update
    * keys are collected to the driver for the prune decision (bounded
    * by the update batch, which in the daily-upsert shape is orders of
    * magnitude smaller than the table; a batch too large to collect is
    * a full rewrite anyway — call `overwrite`).
    */
  def merge(updates: DataFrame): Snapshot = mergeTxn(materialized(updates), None)

  /** Barrier for update frames that feed SEVERAL actions of one commit
    * (the emptiness probe, [[merge]]'s update-key collect, and the data
    * write): without it the whole upstream chain — often an expensive
    * incremental-advance computation — re-executes once per action
    * (guide §7.2 duplicate work across actions; measured on
    * q238_streaming_governance: the split/novelty advance chains ran
    * 2-3× per commit). Lazy localCheckpoint: materializes inside the
    * first action, later actions read the cached rows.
    */
  private def materialized(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false)

  private def mergeTxn(updates: DataFrame, txn: Option[(String, Long)]): Snapshot = {
    val spark = updates.sparkSession
    val prev = currentVersion()
    require(prev >= 1, "merge into an empty table — use append")
    val base = snapshot(prev)
    val cur = base.files

    val updKeys = updates.select(col(keyCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    require(updKeys.nonEmpty, "empty update batch")

    def overlaps(f: FileEntry): Boolean = {
      // any update key within the file's zone? binary search the sorted
      // batch for the first key >= minKey
      var lo = 0; var hi = updKeys.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (updKeys(mid) < f.minKey) lo = mid + 1 else hi = mid
      }
      lo < updKeys.length && updKeys(lo) <= f.maxKey
    }

    val (touched, untouched) = cur.partition(overlaps)
    val next = prev + 1
    val schema = evolveSchema(base.schemaDdl, updates.schema)
    val survivors =
      if (touched.isEmpty) updates
      else {
        // touched files are read under the EVOLVED schema (columns the
        // old files lack come back null), and evolved updates likewise
        // fill columns they lack — additive evolution without rewrites
        val old = spark.read
          .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
          .parquet(touched.map(_.path): _*)
        old.join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
          .unionByName(updates, allowMissingColumns = true)
      }
    commit(next, untouched ++ writeFiles(survivors, next), base.txns ++ txn, Some(schema))
  }

  /** Copy-on-write range DELETE: remove all rows with key in [lo, hi].
    * Zone-pruned like [[merge]] — only files whose [minKey, maxKey]
    * overlaps the range are rewritten (without the deleted rows); the
    * untouched majority carries by reference, so the commit costs
    * O(overlapping files), not O(table). A file that ends up empty
    * simply contributes no entry. The deleted rows appear as `delete`
    * rows in [[changes]] and remain readable by time travel until
    * [[vacuum]] — for a hard erasure, vacuum after deleting.
    */
  def deleteRange(spark: SparkSession, lo: Long, hi: Long): Snapshot = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val prev = currentVersion()
    require(prev >= 1, "delete from an empty table")
    val base = snapshot(prev)
    val (touched, untouched) = base.files.partition(f => f.maxKey >= lo && f.minKey <= hi)
    if (touched.isEmpty) return base // nothing in range: no new version
    val next = prev + 1
    val survivors = readFiles(spark, base, touched)
      .filter(!col(keyCol).cast("long").between(lo, hi))
    commit(next, untouched ++ writeFiles(survivors, next), base.txns, base.schemaDdl)
  }

  /** Compaction-commit: rewrite the CURRENT snapshot as `targetFiles`
    * files (small-file mitigation after many appends/merges). Data is
    * unchanged — only the file layout.
    */
  def compact(spark: SparkSession, targetFiles: Int): Snapshot = {
    val prev = currentVersion()
    val base = if (prev == 0) Snapshot(0, Seq.empty) else snapshot(prev)
    val next = prev + 1
    commit(next, writeFiles(read(spark).repartition(targetFiles), next),
      base.txns, base.schemaDdl)
  }

  /** Layout-maintenance compaction: rewrite the current snapshot RANGE-
    * partitioned on the key, so file zones come out (nearly) disjoint
    * again. Appends and merges interleave key ranges over time — zones
    * widen, overlap, and `readRange`/`merge` pruning decays toward
    * scanning everything; this commit restores it (the Delta/Iceberg
    * "optimize + cluster" move). Plain [[compact]] fixes file COUNT;
    * this fixes pruning POWER.
    */
  def compactByRange(spark: SparkSession, targetFiles: Int): Snapshot = {
    val prev = currentVersion()
    val base = if (prev == 0) Snapshot(0, Seq.empty) else snapshot(prev)
    val next = prev + 1
    val clustered = read(spark)
      .repartitionByRange(targetFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    commit(next, writeFiles(clustered, next), base.txns, base.schemaDdl)
  }

  /** Metadata-only row count: the sum of per-file row stats in the
    * manifest — answers `count(*)` without scanning a byte of data
    * (the zone-map trick applied to the most common query there is).
    */
  def tableCount(asOf: Option[Int] = None): Long = {
    val v = asOf.getOrElse(currentVersion())
    if (v == 0) 0L else snapshot(v).files.map(_.rows).sum
  }

  // ------------------------------------------------- idempotent upsert

  /** Latest committed transaction id for a writer application, from the
    * CURRENT manifest only (txn state is snapshot state, carried
    * forward by every commit).
    */
  def lastTxn(appId: String): Option[Long] = {
    val v = currentVersion()
    if (v == 0) None else snapshot(v).txns.get(appId)
  }

  /** Idempotent upsert: apply `updates` as a MERGE (or the first append
    * into an empty table) EXACTLY ONCE per (appId, batchId). A replayed
    * batch — the at-least-once delivery of Structured Streaming's
    * foreachBatch after a checkpoint recovery — is detected by the txn
    * marker and skipped without a commit, making the table an
    * exactly-once streaming sink (the transactional-writer pattern:
    * progress marker and data change in the SAME atomic commit).
    *
    * Returns the resulting (or unchanged) snapshot.
    */
  def upsertIfNew(updates: DataFrame, appId: String, batchId: Long): Snapshot = {
    require(appId.nonEmpty, "appId must be non-empty")
    lastTxn(appId) match {
      case Some(last) if last >= batchId =>
        snapshot(currentVersion()) // replay — already applied, no commit
      case _ =>
        // barrier BEFORE the emptiness probe: probe + key collect +
        // write all read the one materialization (see [[materialized]])
        val u = materialized(updates)
        if (u.isEmpty) {
          // an empty batch applied zero times IS exactly once; skipping
          // the commit keeps the log free of no-op versions
          val v = currentVersion()
          if (v == 0) Snapshot(0, Seq.empty) else snapshot(v)
        } else {
          val txn = Some(appId -> batchId)
          if (currentVersion() == 0) appendTxn(u, txn)
          else mergeTxn(u, txn)
        }
    }
  }

  /** Idempotent append: add `df`'s rows EXACTLY ONCE per
    * (appId, batchId) — the append-only twin of [[upsertIfNew]] for
    * stores whose maintenance is a blind union (winnowing fingerprint
    * state, df-delta streams). No merge key is consulted; rows are
    * never rewritten. An empty batch skips the commit (zero
    * applications IS exactly once) without advancing the marker.
    */
  def appendIfNew(df: DataFrame, appId: String, batchId: Long): Snapshot = {
    require(appId.nonEmpty, "appId must be non-empty")
    lastTxn(appId) match {
      case Some(last) if last >= batchId =>
        snapshot(currentVersion()) // replay — already applied, no commit
      case _ =>
        // same barrier as [[upsertIfNew]]: probe + write, one compute
        val d = materialized(df)
        if (d.isEmpty) {
          val v = currentVersion()
          if (v == 0) Snapshot(0, Seq.empty) else snapshot(v)
        } else appendTxn(d, Some(appId -> batchId))
    }
  }

  /** Idempotent overwrite: replace the table EXACTLY ONCE per
    * (appId, batchId) — the overwrite-shaped twin of [[upsertIfNew]]
    * for state frames that are recomputed whole per micro-batch (the
    * ER survivorship state in StreamingEr). The txn marker rides the
    * same atomic manifest commit as the data files, so a replayed
    * batch after checkpoint recovery is recognized and skipped.
    */
  def overwriteIfNew(df: DataFrame, appId: String, batchId: Long): Snapshot = {
    require(appId.nonEmpty, "appId must be non-empty")
    lastTxn(appId) match {
      case Some(last) if last >= batchId =>
        snapshot(currentVersion()) // replay — already applied, no commit
      case _ =>
        val prev = currentVersion()
        val txns = (if (prev == 0) Map.empty[String, Long] else snapshot(prev).txns) +
          (appId -> batchId)
        commit(prev + 1, writeFiles(df, prev + 1), txns, Some(df.schema.toDDL))
    }
  }

  // -------------------------------------------------------------- reads

  /** Snapshot read: the latest version, or `asOf` for time travel. */
  def read(spark: SparkSession, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion())
    val snap = snapshot(v)
    if (snap.files.isEmpty) spark.emptyDataFrame
    else readFiles(spark, snap, snap.files)
  }

  /** Reads under the MANIFEST schema when present: files predating an
    * additive evolution return null for columns they lack, and no
    * footer-merging pass (`mergeSchema`) is ever needed — the manifest
    * is the single source of schema truth, resolved on the driver.
    */
  private def readFiles(spark: SparkSession, snap: Snapshot, files: Seq[FileEntry]): DataFrame =
    snap.schemaDdl match {
      case Some(ddl) => spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .parquet(files.map(_.path): _*)
      case None => spark.read.parquet(files.map(_.path): _*)
    }

  /** Zone-map-pruned range read: files whose [minKey, maxKey] zone is
    * disjoint from [lo, hi] are never handed to Spark at all; the
    * residual row filter still pushes down into the surviving scans.
    */
  def readRange(spark: SparkSession, lo: Long, hi: Long, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion())
    val snap = snapshot(v)
    val live = snap.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
    if (live.isEmpty)
      read(spark, asOf).filter(lit(false)) // schema-preserving empty
    else
      readFiles(spark, snap, live)
        .filter(col(keyCol).cast("long").between(lo, hi))
  }

  /** Zone-map-pruned range read on a DECLARED stats column: files whose
    * recorded [lo, hi] for `column` is disjoint from the range never
    * reach Spark. Files with no stats for the column (pre-declaration
    * commits, or all-null in that file) are conservatively scanned.
    * The key column routes to [[readRange]]'s dedicated zone.
    */
  def readRangeOn(
      spark: SparkSession,
      column: String,
      lo: Double,
      hi: Double,
      asOf: Option[Int] = None): DataFrame = {
    if (column == keyCol)
      return readRange(spark, math.ceil(lo).toLong, math.floor(hi).toLong, asOf)
    val snap = snapshot(asOf.getOrElse(currentVersion()))
    val live = snap.files.filter { f =>
      f.colStats.get(column) match {
        case Some((flo, fhi)) => fhi >= lo && flo <= hi
        case None => true // no zone recorded — must scan
      }
    }
    if (live.isEmpty)
      read(spark, asOf).filter(lit(false))
    else
      readFiles(spark, snap, live)
        .filter(col(column).cast("double").between(lo, hi))
  }

  /** Bloom-pruned point read on a DECLARED bloom column: files whose
    * bitset says the value is DEFINITELY absent never reach Spark —
    * the equality complement of [[readRangeOn]]'s zone maps, and the
    * one that works on a high-cardinality column in a RANDOM layout
    * (zones only prune once data is clustered; a bloom prunes any
    * file the value simply never landed in). Files without a bitset
    * for the column (pre-declaration commits) are conservatively
    * scanned. `value` is matched against the column's STRING form —
    * the form the bitset was built on.
    */
  def readEquals(
      spark: SparkSession,
      column: String,
      value: String,
      asOf: Option[Int] = None): DataFrame = {
    require(value != null, "a bloom cannot answer IS NULL — filter read() instead")
    val snap = snapshot(asOf.getOrElse(currentVersion()))
    val live = snap.files.filter { f =>
      f.blooms.get(column) match {
        case Some(b64) =>
          graft.functions.BloomSketch.mightContain(
            graft.functions.BloomSketch.fromBase64(b64), value)
        case None => true // no bitset recorded — must scan
      }
    }
    if (live.isEmpty)
      read(spark, asOf).filter(lit(false))
    else
      readFiles(spark, snap, live)
        .filter(col(column).cast("string") === value)
  }

  /** Multi-dimensional clustering compaction: rewrite the current
    * snapshot in z-order over `cols` (graft.operators.ScaleOps.zOrderBy
    * — bit-interleaved space-filling curve), so the per-file zones
    * NARROW ON EVERY LISTED DIMENSION AT ONCE. Range clustering
    * ([[compactByRange]]) makes one dimension's zones disjoint and
    * leaves the others smeared; z-order trades a little of that
    * single-dimension sharpness for usable zone maps on all of them —
    * pair with `statsCols` so the narrowed zones are actually recorded
    * and [[readRangeOn]] can prune.
    */
  def compactZOrder(
      spark: SparkSession,
      cols: Seq[String],
      targetFiles: Int,
      bits: Int = 8): Snapshot = {
    val prev = currentVersion()
    val base = if (prev == 0) Snapshot(0, Seq.empty) else snapshot(prev)
    val next = prev + 1
    val clustered = graft.operators.ScaleOps.zOrderBy(
      read(spark), cols, bits, numPartitions = targetFiles)
    commit(next, writeFiles(clustered, next), base.txns, base.schemaDdl)
  }

  /** Mix-refresh maintenance commit: overwrite the CURRENT snapshot
    * with its token-budgeted weighted sample
    * ([[graft.operators.ScaleOps.weightedTokenSample]] — A-ES keyed-hash
    * priorities, exact cumulative cutoff per stratum). The training-mix
    * shape: upserts land the raw feed via [[merge]]/[[upsertIfNew]],
    * and each refresh re-ranks ALL live rows so the table converges
    * back to budget — achieved tokens overshoot each stratum's target
    * by at most one document.
    *
    * Priorities are a pure function of the key (md5-derived), so:
    *  - refresh is IDEMPOTENT: re-running without new data keeps
    *    exactly the same rows (the survivors were the top-priority set
    *    already);
    *  - a new batch displaces only rows it genuinely outranks.
    * The mix is computed over LIVE rows only — a document dropped by an
    * earlier refresh returns only if upserted again. The full pre-mix
    * corpus stays readable by time travel until [[vacuum]].
    */
  def refreshMix(
      spark: SparkSession,
      strataCol: String,
      tokenCol: String,
      targets: Map[String, Long]): Snapshot =
    overwrite(graft.operators.ScaleOps.weightedTokenSample(
      read(spark), keyCol, strataCol, tokenCol, targets))

  /** Row-level change feed between two committed versions: what a
    * reader of `fromV` must apply to arrive at `toV`, as one row per
    * changed key with `_change_type` ∈ insert / update / delete
    * (update and insert carry the NEW values, delete the old ones).
    *
    * Cost is O(changed data), not O(table): the manifests are diffed
    * first (files are immutable, so a path present in both versions
    * cannot differ in content and is skipped wholesale), and only the
    * added/removed files are read. Rows carried verbatim into a
    * rewritten file — the copy-on-write residue of MERGE, or a whole
    * [[compact]]/[[compactByRange]]/[[compactZOrder]] — compare equal
    * (null-safe, all columns) and drop out: a layout-only commit has
    * an EMPTY feed. Both sides are read under the `toV` schema, so an
    * additive evolution alone produces no phantom updates.
    *
    * Assumes the MERGE invariant (one row per key per version);
    * duplicate keys within a version would multiply through the join.
    *
    * With `preImages = true`, each update emits TWO rows —
    * `update_preimage` (old values) then `update_postimage` (new) —
    * the shape downstream DELTA CONSUMERS need: an incremental
    * aggregate ([[IncrementalAgg.maintain]]) must subtract the old row
    * before adding the new one. Still one pass (the two images explode
    * from one joined row).
    */
  def changes(
      spark: SparkSession,
      fromV: Int,
      toV: Int,
      preImages: Boolean = false): DataFrame = {
    require(fromV >= 1 && toV >= 1, "versions start at 1")
    val from = snapshot(fromV)
    val to = snapshot(toV)
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    val removed = from.files.filterNot(f => toPaths(f.path))
    val added = to.files.filterNot(f => fromPaths(f.path))

    val dataCols = readFiles(spark, to, to.files).columns.toSeq
    def side(files: Seq[FileEntry], name: String): DataFrame = {
      val df =
        if (files.isEmpty) readFiles(spark, to, to.files).filter(lit(false))
        else readFiles(spark, to, files) // toV schema: evolution-aligned
      df.select(col(keyCol).cast("long").as("__k"),
        struct(dataCols.map(col): _*).as(name))
    }
    def tagged(tag: String, row: Column): Column =
      struct(lit(tag).as("_change_type"), row.as("__row"))
    val updateImages =
      if (preImages)
        array(tagged("update_preimage", col("__old")),
          tagged("update_postimage", col("__new")))
      else array(tagged("update", col("__new")))
    side(removed, "__old")
      .join(side(added, "__new"), Seq("__k"), "full_outer")
      .filter(!(col("__old") <=> col("__new"))) // carried rows drop out
      .select(explode(
        when(col("__new").isNull, array(tagged("delete", col("__old"))))
          .when(col("__old").isNull, array(tagged("insert", col("__new"))))
          .otherwise(updateImages)).as("__c"))
      .select(col("__c._change_type").as("_change_type") +:
        dataCols.map(c => col(s"__c.__row.$c").as(c)): _*)
  }

  /** Table history as a frame — one row per committed version with its
    * file count, row count, and byte-free manifest stats (all driver
    * metadata; no data file is touched). The audit surface a reader
    * checks before time-traveling or vacuuming.
    */
  def history(spark: SparkSession): DataFrame = {
    val rows = (1 to currentVersion()).map { v =>
      val s = snapshot(v)
      (v, s.files.size.toLong, s.files.map(_.rows).sum,
        s.txns.toSeq.sortBy(_._1).map { case (a, b) => s"$a=$b" }.mkString(","))
    }
    spark.createDataFrame(rows).toDF("version", "n_files", "n_rows", "txns")
  }

  /** Files referenced by the version (for plan/pruning assertions). */
  def liveFiles(asOf: Option[Int] = None): Seq[String] =
    snapshot(asOf.getOrElse(currentVersion())).files.map(_.path)

  // ------------------------------------------------------------- vacuum

  /** Delete data files referenced by NO version newer than
    * (current − retainVersions), and the manifests of the dropped
    * versions. Time travel to dropped versions is gone; the retained
    * window stays fully readable. Returns the deleted file count.
    */
  def vacuum(retainVersions: Int = 1): Int = {
    val cur = currentVersion()
    val keepFrom = math.max(1, cur - retainVersions + 1)
    val keep = (keepFrom to cur).flatMap(v => snapshot(v).files.map(_.path)).toSet
    var deleted = 0
    (1 until keepFrom).foreach { v =>
      snapshot(v).files.foreach { f =>
        if (!keep(f.path)) {
          val p = Paths.get(new java.net.URI(f.path).getPath)
          if (Files.deleteIfExists(p)) deleted += 1
        }
      }
      Files.deleteIfExists(manifestPath(v))
    }
    deleted
  }
}

object VersionedTable {
  /** Open (or lazily create on first commit) a table rooted at `root`.
    * `statsCols` declares additional NUMERIC columns to zone-map per
    * file (beyond the key, which is always mapped) — each costs two
    * doubles per file in the manifest and buys file-level pruning via
    * [[VersionedTable.readRangeOn]]; pair with [[VersionedTable.compactZOrder]]
    * to make the zones tight on every declared dimension at once.
    * `bloomCols` declares columns to bloom-index per file for
    * [[VersionedTable.readEquals]] point reads — each costs
    * `bloomBits/8` bytes per file in the manifest (the default 2^16
    * bits = 8 KiB holds ~6.5k distinct values per file at ~1% false
    * positives; size bits ≈ 10× the expected per-file distinct count).
    * `checks` are SQL boolean CHECK constraints enforced on every
    * commit's written rows (NULL passes, as in SQL); a violating batch
    * aborts BEFORE the manifest is published — no version, no orphan
    * files. The counting rides the stats pass: zero extra jobs.
    */
  def apply(
      root: String,
      keyCol: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty,
      bloomBits: Int = 1 << 16,
      checks: Seq[String] = Seq.empty): VersionedTable =
    new VersionedTable(root, keyCol, statsCols, bloomCols, bloomBits, checks)
}
