package graft.io

import org.apache.spark.sql.SparkSession

/** Version-migration registry (SURVEY.md S11, storage/version.go:93-126):
  * "from->to"-keyed migration jobs that rewrite a persisted index in
  * place. A migration here is an ordinary Spark batch job over the index
  * tables; `migrate` chains registered steps until the target version is
  * reached.
  */
object Migrations {

  type Migration = (SparkSession, String) => Unit

  private val registry = scala.collection.mutable.LinkedHashMap[String, Migration]()

  def register(from: String, to: String)(fn: Migration): Unit =
    registry.synchronized { registry(s"$from->$to") = fn }

  def registered: Seq[String] = registry.synchronized(registry.keys.toSeq)

  /** Apply chained migrations from the index's current version to
    * `target`; errors if no registered path exists (version.go:108-123). */
  def migrate(spark: SparkSession, path: String, target: String): Unit = {
    var current = IndexIO.readMeta(path)("version")
    var steps = 0
    while (current != target) {
      val next = registry.synchronized {
        registry.keys.find(_.startsWith(s"$current->"))
      }.getOrElse(throw new IllegalStateException(
        s"no migration path from $current toward $target " +
          s"(registered: ${registered.mkString(", ")})"))
      val fn = registry.synchronized(registry(next))
      fn(spark, path)
      val to = next.split("->")(1)
      val meta = IndexIO.readMeta(path)
      IndexIO.writeMeta(path, meta - "version" + ("version" -> to))
      current = to
      steps += 1
      require(steps <= 64, "migration chain too long — cycle?")
    }
  }
}
