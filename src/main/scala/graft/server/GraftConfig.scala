package graft.server

import java.io.FileInputStream
import scala.jdk.CollectionConverters._

/** Server configuration — the reference's surface, same names, same
  * defaults, same precedence (reference config/configuration.go:11-56):
  * struct defaults < YAML file (when given) < environment variables
  * (viper AutomaticEnv with `.`→`_`: `gigapi.root` ⇒ `GIGAPI_ROOT`,
  * top-level `port`/`host` ⇒ `PORT`/`HOST`).
  *
  * YAML section: the reference unmarshals the `gigapi:` key, but its own
  * shipped config_test.yaml still nests under the project's legacy
  * `quack_pipe:` name — which viper therefore silently ignores, leaving
  * every value at default. We accept BOTH section names (gigapi wins)
  * so that file means what it says.
  */
final case class GraftConfig(
    enabled: Boolean = true,
    root: String = "", // "" = current directory, like the reference
    mergeTimeoutS: Int = 10,
    // parsed for config-surface parity ONLY: the reference declares
    // `secret` (configuration.go:15) but never wires it to any request
    // auth either — no endpoint checks it in either engine. Do not set
    // it expecting authentication.
    secret: String = "",
    allowSaveToHd: Boolean = true,
    saveTimeoutS: Double = 1.0,
    noMerges: Boolean = false,
    port: Int = 7971,
    host: String = "0.0.0.0",
    // EXTENSION beyond the reference config: partition-TTL retention in
    // seconds (`retention_s` / GIGAPI_RETENTION_S); 0 = disabled.
    // Expired partitions ride the compaction drop-queue + grace GC
    // (compact.RetentionEnforcer).
    retentionS: Long = 0L)

object GraftConfig {

  /** defaults < yaml(file) < env. `envOverride` exists for specs; real
    * callers use the process environment. */
  def load(file: Option[String] = None,
           env: Map[String, String] = sys.env): GraftConfig = {
    val y = file.map(parseYamlFile).getOrElse(Map.empty[String, Any])
    val section = Seq("gigapi", "quack_pipe")
      .flatMap(k => y.get(k).collect { case m: Map[String @unchecked, Any @unchecked] => m })
      .headOption.getOrElse(Map.empty[String, Any])

    def e(key: String): Option[String] = env.get(key).filter(_.nonEmpty)
    def fromY[T](m: Map[String, Any], key: String, f: Any => Option[T]): Option[T] =
      m.get(key).flatMap(f)

    val d = GraftConfig()
    val cfg = GraftConfig(
      enabled = e("GIGAPI_ENABLED").flatMap(parseBool)
        .orElse(fromY(section, "enabled", anyBool)).getOrElse(d.enabled),
      root = e("GIGAPI_ROOT")
        .orElse(fromY(section, "root", anyStr)).getOrElse(d.root),
      mergeTimeoutS = e("GIGAPI_MERGE_TIMEOUT_S").flatMap(_.toIntOption)
        .orElse(fromY(section, "merge_timeout_s", anyInt)).getOrElse(d.mergeTimeoutS),
      secret = e("GIGAPI_SECRET")
        .orElse(fromY(section, "secret", anyStr)).getOrElse(d.secret),
      allowSaveToHd = e("GIGAPI_ALLOW_SAVE_TO_HD").flatMap(parseBool)
        .orElse(fromY(section, "allow_save_to_hd", anyBool)).getOrElse(d.allowSaveToHd),
      saveTimeoutS = e("GIGAPI_SAVE_TIMEOUT_S").flatMap(_.toDoubleOption)
        .orElse(fromY(section, "save_timeout_s", anyDouble)).getOrElse(d.saveTimeoutS),
      noMerges = e("GIGAPI_NO_MERGES").flatMap(parseBool)
        .orElse(fromY(section, "no_merges", anyBool)).getOrElse(d.noMerges),
      port = e("PORT").flatMap(_.toIntOption)
        .orElse(fromY(y, "port", anyInt)).getOrElse(d.port),
      host = e("HOST")
        .orElse(fromY(y, "host", anyStr)).getOrElse(d.host),
      retentionS = e("GIGAPI_RETENTION_S").flatMap(_.toLongOption)
        .orElse(fromY(section, "retention_s", anyLong)).getOrElse(d.retentionS))
    // reference guard: SaveTimeoutS == 0 → 1 (configuration.go:51-53)
    if (cfg.saveTimeoutS == 0) cfg.copy(saveTimeoutS = 1.0) else cfg
  }

  /** Go strconv.ParseBool surface: 1/t/T/TRUE/true/True and the 0/f
    * counterparts; anything else is a non-value. */
  private[server] def parseBool(s: String): Option[Boolean] = s match {
    case "1" | "t" | "T" | "true" | "TRUE" | "True" => Some(true)
    case "0" | "f" | "F" | "false" | "FALSE" | "False" => Some(false)
    case _ => None
  }

  // a present-but-empty YAML scalar ("root:") parses to null — that must
  // fall back to the default, not become the literal string "null"
  private def anyStr(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case other => Some(other.toString)
  }
  private def anyInt(v: Any): Option[Int] = v match {
    case n: java.lang.Number => Some(n.intValue())
    case s: String => s.toIntOption
    case _ => None
  }
  private def anyLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case s: String => s.toLongOption
    case _ => None
  }
  private def anyDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case s: String => s.toDoubleOption
    case _ => None
  }
  private def anyBool(v: Any): Option[Boolean] = v match {
    case b: java.lang.Boolean => Some(b.booleanValue())
    case s: String => parseBool(s)
    case _ => None
  }

  /** Minimal YAML read via snakeyaml (already on Spark's classpath);
    * java collections → immutable Scala maps. */
  private def parseYamlFile(path: String): Map[String, Any] = {
    val in = new FileInputStream(path)
    try toScala(new org.yaml.snakeyaml.Yaml().load[Any](in)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => Map.empty
    } finally in.close()
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }
}
