ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cryptoclickhousepocspark"
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
// Heap: local mode = one JVM doing all executor work, so the driver heap
// IS the cluster memory (spark_guide.md). The old 8g default starved 32
// concurrent tasks (~250 MB/core of unified pool) on a 128 GiB machine:
// measured on the full sf0.1 bench, 8g → 48g cut the total 157.8 → 118.9 s
// and removed the late-run pathologies (accumulated loop-checkpoint blocks
// squeezing execution memory — docs_dedup_then_simhash 15.8 → 2.2 s).
// 64g + ParallelGC was measured WORSE (140 s, full-GC storms: 20 s
// docs_simhash_hamming), so the default stays G1 at 48g. Override with
// SPARK_DRIVER_MEM as before; production sizes executor memory to the
// node, this default just stops the local harness from lying about the
// engine's memory behavior.
//
// spark.local.dir (shuffle files, spills, broadcast scratch): default it
// to a RAM-backed tmpfs when one exists — /dev/vda is a shared virtual
// disk with multi-second fsync/journal stalls that showed up as random
// 3-8 s outliers on store-building queries; tmpfs is the local stand-in
// for a production node's fast local NVMe. SPARK_GRAFT_LOCAL_DIR
// overrides (set it to /tmp to get the pre-r17 on-disk behavior).
val sparkLocalDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
  val shm = file("/dev/shm")
  if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-spark-local"
  else System.getProperty("java.io.tmpdir")
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Dspark.local.dir=$sparkLocalDir",
  // static SQL conf (must precede SparkSession creation, hence a -D):
  // the generated-class cache defaults to 100 entries, and a session
  // running the whole 132-query registry churns it — every re-run of a
  // query re-compiles codegen units Janino compiled minutes earlier.
  // 10k entries keeps every unit of the registry warm (class refs, a
  // few MB); any long-lived production session gets the same benefit.
  "-Dspark.sql.codegen.cache.maxEntries=10000",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
