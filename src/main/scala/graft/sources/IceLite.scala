package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  final class Table(val root: String, spark: SparkSession) {
    private def metaDir: Path = Paths.get(root, "metadata")
    private def hint: Path = metaDir.resolve("version-hint.txt")

    def currentVersion: Int =
      if (Files.exists(hint)) new String(Files.readAllBytes(hint)).trim.toInt else -1

    def snapshot(v: Int): Option[Snapshot] = {
      val f = metaDir.resolve(s"v$v.json")
      if (!Files.exists(f)) None
      else {
        val raw = mapper.readValue(Files.readAllBytes(f), classOf[Snapshot])
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

    private def writeData(df: DataFrame, v: Int): (String, Long) = {
      val nonce = java.util.UUID.nameUUIDFromBytes(
        s"$root-$v".getBytes).toString.take(8)
      val rel = s"data/s$v-$nonce"
      df.write.mode("overwrite").parquet(s"$root/$rel")
      // rows=-1: not tracked (an exact count would cost a full re-scan job
      // per commit; the snapshot counters carry the semantic numbers)
      (rel, -1L)
    }

    private def commit(snap: Snapshot): Unit = {
      Files.createDirectories(metaDir)
      val body = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(snap)
      val tmp = metaDir.resolve(s".v${snap.version}.json.tmp")
      Files.write(tmp, body)
      Files.move(tmp, metaDir.resolve(s"v${snap.version}.json"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      val htmp = metaDir.resolve(".version-hint.tmp")
      Files.write(htmp, snap.version.toString.getBytes)
      Files.move(htmp, hint,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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
      if (v < 0) { Files.deleteIfExists(hint); return }
      require(snapshot(v).isDefined, s"no snapshot v$v in $root")
      val htmp = metaDir.resolve(".version-hint.tmp")
      Files.write(htmp, v.toString.getBytes)
      Files.move(htmp, hint,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }

    /** Roll back past any snapshot whose counters violate `keep` — used on
      * resume to drop appends from a wave whose frontier commit (the wave's
      * commit marker) never landed. */
    def trimWhile(drop: Snapshot => Boolean): Unit = {
      var v = currentVersion
      while (v >= 0 && snapshot(v).exists(drop)) v -= 1
      if (v != currentVersion) resetTo(v)
    }

    def snapshots: Seq[Snapshot] = {
      if (!Files.exists(metaDir)) return Nil
      Files.list(metaDir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
        .toSeq.sorted.flatMap(snapshot)
    }
  }

  def table(root: String, spark: SparkSession): Table = new Table(root, spark)
}
