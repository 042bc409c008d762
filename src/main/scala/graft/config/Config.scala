package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.yaml.snakeyaml.Yaml

import graft.operators.{General, Generic}

/** YAML-backed pipeline configuration — the Scala port of the
  * reference's attribute-bag `Config`
  * (`/root/reference/ons_utils/config/config.py:44-222`) with its
  * in-place transforms, plus validation returning typed errors instead
  * of the reference's cerberus/warnings mix
  * (`ons_utils/config/validation.py:145-320`).
  *
  * Uses SnakeYAML from Spark's own classpath (no new dependency).
  */
final case class ConfigError(section: String, message: String)

class Config private (initial: Map[String, Any]) {

  private var attrs: Map[String, Any] = initial

  def get(key: String): Option[Any] = attrs.get(key)
  def apply(key: String): Any = attrs(key)
  def keys: Seq[String] = attrs.keys.toSeq
  def update(kv: (String, Any)*): Unit = attrs = attrs ++ kv

  /** Unpack the mappings under `toUnpack` keys as top-level attributes
    * (config.py:110-136); the original nested attr is kept too. A
    * collision with an existing top-level key still overwrites (the
    * reference behaves the same) but is logged, so a config that
    * silently shadows a sibling section is at least diagnosable. */
  def unpack(toUnpack: Seq[String]): Unit = toUnpack.foreach { k =>
    attrs(k) match {
      case m: Map[_, _] =>
        val nested = m.asInstanceOf[Map[String, Any]]
        val clashes = nested.keySet.intersect(attrs.keySet - k)
        if (clashes.nonEmpty)
          org.slf4j.LoggerFactory.getLogger(classOf[Config]).warn(
            s"unpack('$k') overwrites existing top-level keys: " +
              clashes.toSeq.sorted.mkString(", "))
        attrs = attrs ++ nested
      case other => throw new IllegalArgumentException(
        s"given attr $k to unpack must be a mapping, got $other")
    }
  }

  /** config.py:138-141 */
  def flattenNestedDicts(keys: Seq[String]): Unit = keys.foreach { k =>
    attrs = attrs.updated(k,
      Generic.flattenNested(attrs(k).asInstanceOf[Map[Any, Any]]))
  }

  /** config.py:143-145 */
  def getKeyValuePairs(keys: Seq[String]): Unit = keys.foreach { k =>
    attrs = attrs.updated(k,
      Generic.keyValuePairs(attrs(k).asInstanceOf[Map[Any, Any]]))
  }

  /** config.py:147-158 (repeat defaults true here, as there) */
  def fillTuples(keys: Seq[String], repeat: Boolean = true,
      length: Option[Int] = None): Unit = keys.foreach { k =>
    attrs = attrs.updated(k,
      Generic.fillTuples(attrs(k).asInstanceOf[Seq[Any]], length, repeat))
  }

  /** config.py:160-171 */
  def fillTupleKeys(keys: Seq[String], repeat: Boolean = true,
      length: Option[Int] = None): Unit = keys.foreach { k =>
    attrs = attrs.updated(k,
      Generic.fillTupleKeys(
        ListMap.from(attrs(k).asInstanceOf[Map[Any, Any]]), length, repeat))
  }

  /** config.py:173-189 */
  def extendAttr(key: String, values: Seq[Any]): Unit = attrs(key) match {
    case s: Seq[_] => attrs = attrs.updated(key, s ++ values)
    case other => throw new IllegalArgumentException(
      s"attribute $key is not an extendable type: $other")
  }

  /** config.py:191-204 */
  def removeFromAttr(key: String, remove: Set[Any]): Unit = attrs(key) match {
    case s: Seq[_] => attrs = attrs.updated(key, s.filterNot(remove.contains))
    case other => throw new IllegalArgumentException(
      s"attribute $key is not a collection; nothing to remove: $other")
  }

  /** config.py:206-222: prepend a directory to a path attr or every
    * value of a path-mapping attr. */
  def prependDir(keys: Seq[String], dir: String): Unit = keys.foreach { k =>
    attrs(k) match {
      case m: Map[_, _] => attrs = attrs.updated(k,
        m.asInstanceOf[Map[Any, Any]].map { case (kk, v) =>
          kk -> Paths.get(dir, v.toString).toString })
      case v => attrs = attrs.updated(k, Paths.get(dir, v.toString).toString)
    }
  }

  /** Validation: required keys present, plus catalog/filesystem
    * existence for declared table/path attrs; sections with
    * `active: false` are skipped (validation.py:145-268). */
  def validate(
      spark: SparkSession,
      requiredKeys: Seq[String] = Nil,
      tableAttrs: Seq[String] = Nil,
      pathAttrs: Seq[String] = Nil): Either[Seq[ConfigError], Config] = {
    def sectionActive(k: String): Boolean = attrs.get(k) match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].get("active") != Some(false)
      case _ => true
    }
    val missing = requiredKeys.filterNot(attrs.contains)
      .map(k => ConfigError(k, "required key missing"))
    val badTables = tableAttrs.filter(sectionActive).flatMap { k =>
      attrs.get(k).collect {
        case t: String if t.contains('.') &&
            !General.tableExists(spark,
              t.split('.').head, t.split('.').last) =>
          ConfigError(k, s"Hive table $t does not exist")
      }
    }
    val badPaths = pathAttrs.filter(sectionActive).flatMap { k =>
      attrs.get(k).collect {
        case p: String if !General.fileExists(spark, p) =>
          ConfigError(k, s"path $p does not exist")
      }
    }
    val all = missing ++ badTables ++ badPaths
    if (all.isEmpty) Right(this) else Left(all)
  }
}

object Config {

  /** Deep-convert SnakeYAML's java structures to Scala. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      ListMap.from(m.asScala.toSeq.map { case (k, vv) => k.toString -> toScala(vv) })
    case l: java.util.List[_] => l.asScala.toSeq.map(toScala)
    case other => other
  }

  def fromMap(m: Map[String, Any]): Config = new Config(m)

  def parse(yamlText: String): Config = {
    val raw = new Yaml().load[Any](yamlText)
    toScala(raw) match {
      case m: Map[_, _] => new Config(m.asInstanceOf[Map[String, Any]])
      case other => throw new IllegalArgumentException(
        s"config root must be a mapping, got $other")
    }
  }

  /** Load `<name>.yaml` from the first matching location: $GRAFT_CONFIG,
    * cwd/config, home/config (the search-path contract of
    * config.py:61-98 without the cprices-specific dirs). */
  def load(name: String, subdir: Option[String] = None): Config = {
    val fname = s"$name.yaml"
    val candidates: Seq[Path] =
      sys.env.get("GRAFT_CONFIG").map(Paths.get(_)).toSeq ++ Seq(
        Paths.get(sys.props("user.dir"), "config"),
        Paths.get(sys.props("user.home"), "config"))
    val dir = candidates.find(Files.exists(_)).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no config directory among $candidates"))
    val path = subdir.fold(dir.resolve(fname))(s => dir.resolve(s).resolve(fname))
    parse(Files.readString(path))
  }
}
