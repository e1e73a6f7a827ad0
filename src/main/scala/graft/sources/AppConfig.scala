package graft.sources

import java.nio.file.{Files, Paths}

/** Config source (SURVEY §2.1 S7) — mirrors the reference's Viper YAML
  * key structure (conf/conf.go:37-70, example conf/test.yml:1-13):
  * elasticsearch / appsearch / server blocks selected by ENV_ID. Parsed
  * from simple `key: value` YAML-subset files (no external YAML lib on
  * the offline classpath; the reference's config surface is flat). */
object AppConfig {

  final case class Elasticsearch(url: String, username: String, password: String)
  final case class Appsearch(url: String, token: String)
  final case class Server(port: Int, readTimeout: Int, writeTimeout: Int)
  final case class Config(envId: String, elasticsearch: Elasticsearch,
      appsearch: Appsearch, server: Server)

  /** Parse a flat two-level `block:\n  key: value` YAML subset. */
  def parse(text: String, envId: String): Config = {
    var block = ""
    val kv = scala.collection.mutable.Map.empty[String, String]
    text.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        if (!raw.startsWith(" ") && line.trim.endsWith(":")) {
          block = line.trim.stripSuffix(":")
        } else {
          val idx = line.indexOf(':')
          if (idx > 0) {
            val k = line.substring(0, idx).trim
            val v = line.substring(idx + 1).trim.stripPrefix("\"").stripSuffix("\"")
            kv(s"$block.$k") = v
          }
        }
      }
    }
    def get(k: String, dflt: String = ""): String = kv.getOrElse(k, dflt)
    Config(
      envId,
      Elasticsearch(get("elasticsearch.url"), get("elasticsearch.username"),
        get("elasticsearch.password")),
      Appsearch(get("appsearch.url"), get("appsearch.token")),
      Server(get("server.port", "8080").toInt,
        get("server.readTimeout", "15").toInt,
        get("server.writeTimeout", "15").toInt))
  }

  /** Load `<dir>/<ENV_ID>.yml` — same lookup scheme as conf.go:42-48. */
  def load(dir: String, envId: String): Config = {
    val p = Paths.get(dir, s"$envId.yml")
    require(Files.exists(p), s"config not found: $p")
    parse(new String(Files.readAllBytes(p)), envId)
  }
}
