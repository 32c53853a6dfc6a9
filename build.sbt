ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "meds_transformsspark"
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
lazy val defaultHeap: String = {
  def firstLineLong(path: String): Option[Long] =
    try {
      val src = scala.io.Source.fromFile(path)
      // (build.sbt compiles with Scala 2.12 — no nextOption/toLongOption)
      try src.getLines().take(1).toList.headOption
        .flatMap(l => scala.util.Try(l.trim.toLong).toOption)
      finally src.close()
    } catch { case _: Throwable => None }
  // in a cgroup-limited container /proc/meminfo reports HOST RAM — a
  // 4g-limited container on a 128g host would get -Xmx48g and an OOM kill.
  // Prefer the cgroup limit (v2 then v1; "max"/huge sentinel = unlimited),
  // fall back to MemTotal. SPARK_DRIVER_MEM overrides manually.
  // Work in BYTES end-to-end: integer-dividing a sub-GiB limit to whole
  // GiB yields 0 (which would skip the fallback yet look "unset"), and a
  // fixed floor in GiB can exceed a small container's limit — either way
  // recreating the OOM kill this sizing exists to prevent.
  val cgroupBytes: Option[Long] =
    Seq("/sys/fs/cgroup/memory.max", "/sys/fs/cgroup/memory/memory.limit_in_bytes")
      .flatMap(firstLineLong).headOption
      .filter(_ < (1L << 50)) // v1 reports ~2^63 when unlimited
  val memTotalBytes: Option[Long] = cgroupBytes.orElse {
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.trim.split("\\s+")(1).toLong * 1024 } // meminfo is in kB
        .filter(_ > 0)
      finally src.close()
    } catch { case _: Throwable => None }
  }
  memTotalBytes match {
    case None => "24g" // no limit readable anywhere: the old bench-box default
    case Some(b) =>
      // ~40% of the limit with a 512m working floor, capped at 48g AND at
      // (limit − 256m headroom). The headroom cap is applied LAST so no
      // floor can push -Xmx past the cgroup; in a container too small for
      // even the 64m remnant the JVM will fail loudly rather than be
      // OOM-killed mid-run
      val want = math.min(48L * 1024, math.max(512L, b * 2 / 5 >> 20))
      val mb = math.max(64L, math.min(math.max(256L, want), (b >> 20) - 256L))
      s"${mb}m"
  }
}

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
  // 32 executor threads + accumulated per-query caches need headroom
  // (measured: the 43-query suite runs ~1s faster at 48g than 24g on the
  // 125g bench box), but the default must not exceed what a smaller host
  // can back with physical memory — size to ~40% of RAM, capped at 48g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // headroom for the bench suite's ~100 queries of generated (Janino)
  // classes: a single query compiles ~45 MB of nmethods against the 240 MB
  // default — reserved, not committed, so the only cost is address space
  "-XX:ReservedCodeCacheSize=512m",
)
