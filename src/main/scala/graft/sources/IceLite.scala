package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** IceLite — minimal Iceberg-style table format: immutable parquet data
  * dirs + a JSON snapshot log with per-snapshot manifests and counters.
  *
  * Real `iceberg-spark-runtime` is not on the sandbox classpath (checked:
  * /opt/spark/jars, coursier offline), so this delivers the semantics the
  * north rule needs — atomic commit, snapshot lineage, exact resume,
  * per-snapshot counters — behind a small API that real Iceberg replaces
  * verbatim outside the sandbox (`writeTo(...).append()` / time travel).
  *
  * Commit protocol (crash-safe on a POSIX fs):
  *  1. write parquet to `data/s{N}-<nonce>/` (invisible to readers);
  *  2. write `metadata/v{N}.json` via temp-file + atomic rename;
  *  3. flip `metadata/version-hint.txt` via temp-file + atomic rename.
  * A crash between any steps leaves the previous snapshot intact — the
  * kill/resume test exercises exactly this.
  */
object IceLite {

  final case class Snapshot(
      version: Int,
      parent: Int, // -1 for none
      mode: String, // "append" | "replace"
      dataDirs: Seq[String], // relative to table root, full file list of this snapshot
      counters: Map[String, Long],
      rows: Long)

  /** Per-FILE manifest entry (SURVEY §7.4): exact row count + url_hash
    * min/max, read off the parquet FOOTERS at commit time (metadata-only
    * — no data scan). One `_manifest.json` per immutable data dir; the
    * underscore keeps Spark's file listing from treating it as data. */
  final case class FileStat(
      file: String, rows: Long, hasHash: Boolean, minHash: Long, maxHash: Long)

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  final class Table(val root: String, spark: SparkSession) {
    // ALL metadata/manifest IO goes through the storage seam: local paths
    // behave exactly as before (StateIO.Nio), URI roots (file://, hdfs://,
    // s3a://) run on the Hadoop FileSystem API — the multi-executor
    // deployment the north rule names (VERDICT r3 #1).
    private val io: StateIO = StateIO.forPath(root)
    private def metaDir: String = s"$root/metadata"
    private def hint: String = s"$metaDir/version-hint.txt"

    def currentVersion: Int = {
      val b = io.readBytesIfExists(hint)
      if (b != null) new String(b).trim.toInt else -1
    }

    def snapshot(v: Int): Option[Snapshot] = {
      val b = io.readBytesIfExists(s"$metaDir/v$v.json")
      if (b == null) None
      else {
        val raw = mapper.readValue(b, classOf[Snapshot])
        // Jackson + erasure lands small counters as Integer; normalize via
        // an unspecialized view (a typed lambda would unbox and throw).
        val fixed = raw.counters.asInstanceOf[Map[String, Any]].map { kv =>
          kv._1 -> kv._2.asInstanceOf[Number].longValue()
        }
        Some(raw.copy(counters = fixed))
      }
    }

    def currentSnapshot: Option[Snapshot] = {
      val v = currentVersion
      if (v < 0) None else snapshot(v)
    }

    def isEmpty: Boolean = currentSnapshot.forall(_.dataDirs.isEmpty)

    /** Read the table at the current snapshot (empty DataFrame with the
      * given fallback schema when no snapshot exists). */
    def read(): DataFrame = {
      val snap = currentSnapshot
      val dirs = snap.map(_.dataDirs).getOrElse(Nil).map(d => s"$root/$d")
      if (dirs.isEmpty)
        throw new IllegalStateException(s"IceLite table $root has no data; use readOr(schema)")
      spark.read.parquet(dirs: _*)
    }

    def readOr(empty: => DataFrame): DataFrame =
      if (currentSnapshot.exists(_.dataDirs.nonEmpty)) read() else empty

    /** Time travel: read as of snapshot v. */
    def readAt(v: Int): DataFrame = {
      val snap = snapshot(v).getOrElse(
        throw new IllegalArgumentException(s"no snapshot v$v in $root"))
      if (snap.dataDirs.isEmpty)
        throw new IllegalStateException(s"snapshot v$v of $root is empty")
      spark.read.parquet(snap.dataDirs.map(d => s"$root/$d"): _*)
    }

    /** Version-pinned DELTA read: only the data dirs `toV` added after
      * `fromV` (fromV = -1 → all of toV's dirs). None when the delta
      * carries no data. Falls back to all of toV's dirs when fromV's
      * snapshot has been expired — callers dedup against downstream state,
      * so over-reading is safe; under-reading never happens because dirs
      * are immutable once committed. This keeps inbox drains O(new
      * batches) instead of O(total-ever) (an append snapshot's dataDirs
      * list is cumulative). */
    def readBetween(fromV: Int, toV: Int): Option[DataFrame] = {
      val to = snapshot(toV).getOrElse(
        throw new IllegalArgumentException(s"no snapshot v$toV in $root"))
      val base: Set[String] =
        if (fromV < 0) Set.empty
        else snapshot(fromV).map(_.dataDirs.toSet).getOrElse(Set.empty)
      val delta = to.dataDirs.filterNot(base)
      if (delta.isEmpty) None
      else Some(spark.read.parquet(delta.map(d => s"$root/$d"): _*))
    }

    /** The version that committed data dir `rel` (parsed from the
      * `data/s{v}-{nonce}` layout writeData uses). */
    def dirVersion(rel: String): Int = {
      val name = rel.stripPrefix("data/s")
      name.takeWhile(_ != '-').toInt
    }

    /** Metadata-only commit that drops dirs matching `p` from the CURRENT
      * snapshot's dataDirs, carrying the previous counters forward. Files
      * stay on disk until `expire` finds no retained snapshot referencing
      * them — so in-flight version-pinned readers are unaffected. Intended
      * for the table's single writer (e.g. the seed inbox's intake sink
      * truncating already-drained batches); no-op when nothing matches. */
    def dropDirsWhere(p: String => Boolean): Option[Snapshot] = {
      val cur = currentSnapshot.getOrElse(return None)
      val kept = cur.dataDirs.filterNot(p)
      if (kept.size == cur.dataDirs.size) None
      else {
        val snap = Snapshot(cur.version + 1, cur.version, "append", kept,
          cur.counters, cur.rows)
        commit(snap); Some(snap)
      }
    }

    private def writeData(df: DataFrame, v: Int): (String, Long) = {
      val nonce = java.util.UUID.nameUUIDFromBytes(
        s"$root-$v".getBytes).toString.take(8)
      val rel = s"data/s$v-$nonce"
      df.write.mode("overwrite").parquet(s"$root/$rel")
      writeManifest(rel)
      // rows=-1: not tracked at snapshot level (the per-file manifest
      // carries exact counts; the snapshot counters carry the semantics)
      (rel, -1L)
    }

    /** Footer-only stats pass over a freshly written (still uncommitted,
      * hence crash-safe) data dir: row counts + url_hash min/max per
      * file. Cost is one footer read per file — no data pages touched. */
    private def writeManifest(dirRel: String): Unit = {
      val dirAbs = s"$root/$dirRel"
      val conf = spark.sparkContext.hadoopConfiguration
      val stats = io.listNames(dirAbs)
        .filter(_.endsWith(".parquet"))
        .sorted
        .map { name =>
          val rd = ParquetFileReader.open(
            HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(s"$dirAbs/$name"), conf))
          try {
            val blocks = rd.getFooter.getBlocks.asScala.toSeq
            val rows = blocks.map(_.getRowCount).sum
            var has = false
            var mn = Long.MaxValue
            var mx = Long.MinValue
            blocks.foreach { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == "url_hash")
                .foreach { c =>
                  c.getStatistics match {
                    case ls: org.apache.parquet.column.statistics.LongStatistics
                        if ls.hasNonNullValue =>
                      has = true
                      mn = math.min(mn, ls.genericGetMin)
                      mx = math.max(mx, ls.genericGetMax)
                    case _ => ()
                  }
                }
            }
            FileStat(name, rows, has,
              if (has) mn else 0L, if (has) mx else 0L)
          } finally rd.close()
        }
      io.writeAtomic(s"$dirAbs/_manifest.json",
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(stats.toArray))
    }

    /** The per-file manifest of one data dir (empty if written by an
      * older layout without manifests). */
    def manifest(dirRel: String): Seq[FileStat] = {
      val b = io.readBytesIfExists(s"$root/$dirRel/_manifest.json")
      if (b == null) Seq.empty
      else mapper.readValue(b, classOf[Array[FileStat]]).toSeq
    }

    /** All (dataDir, fileStat) pairs of the current snapshot. */
    def currentStats: Seq[(String, FileStat)] =
      currentSnapshot.map(_.dataDirs).getOrElse(Nil)
        .flatMap(d => manifest(d).map(d -> _))

    /** Manifest-pruned point read: only the files whose url_hash
      * [min,max] range can contain `h` are scanned (files without stats
      * are conservatively included). The file-level analog of Iceberg's
      * stats pruning — at 10^10 rows a seen-set point lookup touches a
      * handful of sorted-run files instead of the whole table. */
    def prunedByHash(h: Long): DataFrame = {
      val snap = currentSnapshot
      val dirs = snap.map(_.dataDirs).getOrElse(Nil)
      val files = dirs.flatMap { d =>
        val m = manifest(d)
        if (m.isEmpty) Seq(s"$root/$d") // no stats: scan the dir
        else m.filter(s => !s.hasHash || (h >= s.minHash && h <= s.maxHash))
          .map(s => s"$root/$d/${s.file}")
      }
      if (dirs.isEmpty)
        throw new IllegalStateException(s"IceLite table $root has no data; use readOr(schema)")
      if (files.isEmpty)
        // every file's [min,max] range excludes h: a definitive miss.
        // Schema-only read (parquet footers, zero row groups scanned) so
        // callers get an empty frame with the table's real schema instead
        // of a throw.
        spark.read.parquet(s"$root/${dirs.head}").limit(0)
      else spark.read.parquet(files: _*)
    }

    /** Bound the snapshot log: drop snapshot metadata older than the last
      * `keepLast` versions and delete data dirs no RETAINED snapshot
      * references. The commit-marker chain resume depends on lives in the
      * newest versions, so exact kill/resume is preserved for any
      * keepLast >= 2; time travel beyond the horizon is traded for
      * bounded storage (a long crawl otherwise accumulates every wave's
      * frontier forever). */
    def expire(keepLast: Int): Unit = {
      if (keepLast <= 0) return // retention disabled
      val cur = currentVersion
      if (cur < 0) return
      val keepMin = cur - math.max(2, keepLast) + 1
      val versions = listVersions()
      val drop = versions.filter(_ < keepMin)
      if (drop.isEmpty) return
      val referenced = versions.filter(_ >= keepMin).flatMap(snapshot)
        .flatMap(_.dataDirs).toSet
      val dropDirs = drop.flatMap(snapshot).flatMap(_.dataDirs).toSet -- referenced
      dropDirs.foreach(d => io.deleteRecursive(s"$root/$d"))
      drop.foreach(v => io.deleteIfExists(s"$metaDir/v$v.json"))
    }

    private def listVersions(): Seq[Int] =
      io.listNames(metaDir)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
        .sorted

    private def commit(snap: Snapshot): Unit = {
      io.mkdirs(metaDir)
      val body = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(snap)
      io.writeAtomic(s"$metaDir/v${snap.version}.json", body)
      io.writeAtomic(hint, snap.version.toString.getBytes)
    }

    /** Append df as a new snapshot (previous data retained). */
    def append(df: DataFrame, counters: Map[String, Long] = Map.empty): Snapshot = {
      val v = currentVersion + 1
      val (rel, rows) = writeData(df, v)
      val prev = currentSnapshot.map(_.dataDirs).getOrElse(Nil)
      val snap = Snapshot(v, v - 1, "append", prev :+ rel, counters, rows)
      commit(snap); snap
    }

    /** Replace table contents with df (previous snapshots stay readable —
      * that's the checkpoint lineage). */
    def replace(df: DataFrame, counters: Map[String, Long] = Map.empty): Snapshot = {
      val v = currentVersion + 1
      val (rel, rows) = writeData(df, v)
      val snap = Snapshot(v, v - 1, "replace", Seq(rel), counters, rows)
      commit(snap); snap
    }

    /** Metadata-only commit: same data dirs, counters merged over the
      * current snapshot's (e.g. advancing an intake high-water mark when
      * nothing was admitted — an empty-data append would leave a dir
      * spark.read can't infer a schema from). */
    def amendCounters(counters: Map[String, Long]): Snapshot = {
      val v = currentVersion + 1
      val prev = currentSnapshot
      val snap = Snapshot(v, v - 1, "append",
        prev.map(_.dataDirs).getOrElse(Nil),
        prev.map(_.counters).getOrElse(Map.empty) ++ counters, -1L)
      commit(snap); snap
    }

    /** Commit an empty replace (e.g. final empty frontier). */
    def replaceEmpty(counters: Map[String, Long] = Map.empty): Snapshot = {
      val v = currentVersion + 1
      val snap = Snapshot(v, v - 1, "replace", Nil, counters, 0L)
      commit(snap); snap
    }

    /** Reset the current version pointer (time-travel rollback); -1 means
      * "no snapshot". Data files of newer snapshots stay on disk — a later
      * commit with the same version simply overwrites them. */
    def resetTo(v: Int): Unit = {
      if (v < 0) { io.deleteIfExists(hint); return }
      require(snapshot(v).isDefined, s"no snapshot v$v in $root")
      io.writeAtomic(hint, v.toString.getBytes)
    }

    /** Roll back past any snapshot whose counters violate `keep` — used on
      * resume to drop appends from a wave whose frontier commit (the wave's
      * commit marker) never landed. */
    def trimWhile(drop: Snapshot => Boolean): Unit = {
      var v = currentVersion
      while (v >= 0 && snapshot(v).exists(drop)) v -= 1
      if (v != currentVersion) resetTo(v)
    }

    def snapshots: Seq[Snapshot] = listVersions().flatMap(snapshot)
  }

  def table(root: String, spark: SparkSession): Table = new Table(root, spark)
}
