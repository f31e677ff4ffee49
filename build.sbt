ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "engineering_school_bigdata_project_f1_weatherspark"
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
// Let the forked JVM inherit sbt's stdout directly. The default
// outputStrategy pipes the child's stdout through sbt's logger, which
// prefixes EVERY line with "[info] " and appends a final "[success]"
// line — so the bench's machine-parseable last-line JSON trailer was
// never bare JSON in 11 rounds of driver captures ("parsed": null).
// With StdoutOutput the child writes unframed lines and the last stdout
// line of `sbt "runMain graft.Bench"` is the bench's own summary.
run / outputStrategy := Some(StdoutOutput)
// ...and keep sbt itself from appending its "[success] Total time" line
// AFTER the child exits, which would re-steal the last-stdout-line slot.
Global / showSuccess := false
Global / excludeLintKeys += run / outputStrategy
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Heap sizing measured on THIS host (round 17, bench_r17_heap*_probe):
  // bigger is NOT better on this VM — the same ×100 5-query probe read
  // 2-3× SLOWER at -Xmx28g than at 8g (e.g. dedup_spans 40 vs 16 s,
  // basket_pairs 28 vs 9 s, steal ~0 both) — consistent with guest
  // free-page reporting (kvfree_rcu kworkers): a large lazily-grown G1
  // heap keeps faulting freshly-zapped pages back from the host, while a
  // compact heap stays resident. Xms is pinned to Xmx so the heap is
  // committed once instead of thrash-grown. SPARK_DRIVER_MEM overrides
  // both knobs for other hosts.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// ad-hoc JVM flags for forked runs (GC experiments, diagnostics) without
// editing the build — e.g. GRAFT_JVM_EXTRA="-XX:+UseParallelGC -Xlog:gc"
javaOptions ++= sys.env.get("GRAFT_JVM_EXTRA")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
