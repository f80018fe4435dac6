ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gofaissspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver tail-captures the last ~2000 chars of combined output and
// parses the bench's one-line JSON. Two sbt behaviors have broken that
// parse every round so far: (1) forked-process stdout is re-logged with
// an "[info] " prefix (a parser that expects the line to START with '{'
// never matches), and (2) sbt appends "[success] Total time: ..." after
// the run, so a last-line parser sees that instead of the JSON. Inherit
// stdout directly and drop the success epilogue so the bare JSON line is
// the final line of output.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// 8g proved too small for the full bench: its resident caches (packed
// serving blocks, 32 HNSW shard graphs, the LSH/IVF index tables) plus the
// BRP join's candidate explosion exceeded the ~2-3 GB storage pool late in
// the run, so Spark silently evicted the serving caches and every
// single-query job recomputed its whole lineage — serve_lsh read 2,869 ms
// p50 in BENCH_r04 vs 31.8 ms for the identical kernel shape measured
// early-run. The box has 128 GiB; give the one local[32] JVM real room.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "56g")}",
)
