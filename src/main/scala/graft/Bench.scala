package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Per round the driver runs this at sf0.1 and records the
  * single JSON line below as `BENCH_r{N}.json`.
  *
  * Measurement policy (round-1 verdict fixes):
  *   - action is a `noop`-format write so every output column is fully
  *     materialized (a `count()` lets Catalyst prune projections and drop
  *     final sorts, measuring a different plan than the query);
  *   - one warmup pass (JVM/codegen/scan caches), then median of 3;
  *   - deterministic query order (`Queries.all`, not a Map);
  *   - failures are recorded per query in an `"errors"` field and flip the
  *     exit code — a broken query must never read as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // oracle queries + the bench-only uncapped scale-path queries;
    // SPARK_GRAFT_ONLY=q01_...,q02_... restricts to a comma-separated
    // subset (local iteration / per-query scaling probes — the driver
    // never sets it, so round benches always run everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchQueries = (Queries.all ++ Queries.benchOnly)
      .filter(q => only.forall(_.contains(q.name)))
    require(benchQueries.nonEmpty, "SPARK_GRAFT_ONLY matched no queries")
    val qmap = benchQueries.map(q => q.name -> q.run).toMap

    def runOnce(name: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        qmap(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }

    val names = benchQueries.map(_.name)
    names.foreach(runOnce) // warmup: full pass, result discarded

    val timed = names.map { name =>
      val runs = (1 to 3).map(_ => runOnce(name))
      val errs = runs.collect { case Left(e) => e }
      if (errs.nonEmpty) name -> Left(errs.head)
      else name -> Right(runs.collect { case Right(t) => t }.sorted.apply(1))
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    val qs = timed.collect { case (n, Right(t)) => s"${jstr(n)}:$t" }
      .mkString("{", ",", "}")
    val errors = timed.collect { case (n, Left(e)) => s"${jstr(n)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = timed.collect { case (_, Right(t)) => t }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"n":3,"warmup":1,"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (timed.exists(_._2.isLeft)) sys.exit(1)
  }
}
