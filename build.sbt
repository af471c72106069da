ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parcialbigdataspark"
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
// The forked run's stdout normally flows through sbt's logger, which
// prefixes every line with "[info] " — that prefix is why the driver's
// line-level JSON parse of the Bench summary failed for 10 straight
// rounds (`BENCH_r*.json` "parsed": null despite the compact summary
// line landing in the tail). StdoutOutput hands the child's stdout to
// the real stdout unwrapped, so the summary line arrives parseable.
// (One scope suffices: runMain delegates to `Compile / run`'s fork
// options — verified by a probe run whose tail landed prefix-free.)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // java.sql.Timestamp literals (interval bounds, shipdate windows)
  // convert to epoch micros through the JVM DEFAULT timezone —
  // spark.sql.session.timeZone does NOT cover that conversion, so a
  // non-UTC host would silently shift every timestamp bound relative
  // to the DuckDB oracle's naive literals. Pin the JVM itself to UTC.
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // This box is a microVM whose host services first-touch page faults at
  // a rate that swings ~40x (measured 12 MB/s under host pressure vs
  // 500 MB/s calm; see BENCHNOTES.md "The r4 band"). Lazy heap growth
  // mid-run then bills minutes of kernel time to whatever query happened
  // to trigger expansion. Commit and fault the whole working heap ONCE at
  // JVM startup instead, and never shrink below it: all post-startup
  // allocation reuses resident frames, immune to host pressure windows.
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", "6g")}",
  "-XX:+AlwaysPreTouch",
  // ~50 whole-stage-codegen'd queries in one JVM generate enough classes
  // to fill the default 240m code cache, after which the JIT shuts off
  // and everything runs interpreted — size it for the full query suite.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
// A Column expression discarded as a statement is almost always the
// leading-operator newline-split bug (three confirmed kills: ljungBox
// r13, dunnPairs + dickeyFuller r14 — a continuation line starting
// with `- x` parses as a separate unary statement and silently drops
// the term). -Wnonunit-statement makes the compiler flag every such
// discard; main sources are kept warning-CLEAN (legitimate
// side-effect discards are spelled `val _ =`) so a new occurrence is
// loud. Scoped to Compile: test code discards results routinely.
Compile / compile / scalacOptions += "-Wnonunit-statement"
