package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run each query, dumping its result to `outDir/<name>`. A query that
    * throws must NOT vanish from the driver's JSON (round 8 proved the
    * silent path hides real breakage): it gets a 1-row parquet whose schema
    * can never match an oracle — a guaranteed-red rows/schema/hash row —
    * and the messages land in `outDir/errors.json`. Returns the failures.
    *
    * errors.json is MERGED per run, keyed by what actually ran: a query
    * that ran here drops its stale record (and re-adds itself if it failed
    * again); records for queries NOT in this run are preserved — so a
    * subset re-check of a fixed query goes green without a full run, while
    * never vouching for queries it didn't touch. */
  private[graft] def dump(spark: SparkSession,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      sfDir: String, outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // registry paths pin reused frames with a LAZY cache() (the
        // eager=false discipline: plan construction must run no jobs —
        // clusteringOf, shingleCorpusOf, collocationsOf). The write above
        // is the only consumer, so drop those blocks here instead of
        // letting 300 queries accumulate them in the CacheManager
        // (r17 advisor: clusteringOf left three entries pinned per run).
        // Own try: the parquet above is already GOOD — a clearCache
        // hiccup (executor lost mid-unpersist) must not fall into the
        // catch and overwrite it with a red marker.
        try spark.catalog.clearCache()
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name clearCache after success: $e")
        }
      } catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failed(name) = msg
        // the marker write can itself fail (disk full, dead context after
        // an OOM) — that must not abort the remaining queries
        try {
          import spark.implicits._
          Seq(msg).toDF("_graft_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name marker write failed too: $e2")
        }
        // a failing query may have pinned caches before it threw
        try spark.catalog.clearCache()
        catch { case _: Throwable => () }
      }
    }
    // merge with any prior record: queries that ran here own their entry
    // (cleared on success, rewritten on failure); untouched queries keep
    // theirs. The file exists only when something is red (a stray
    // non-directory in outDir would confuse rows-only enumeration).
    val ep = Paths.get(s"$outDir/errors.json")
    val ran = queries.map(_._1).toSet
    val stale: Map[String, String] =
      if (!Files.exists(ep)) Map.empty
      else try {
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(Files.readString(ep)) match {
          case JObject(fs) => fs.collect { case (k, JString(v)) => (k, v) }.toMap
          case _ => Map.empty
        }
      } catch { case _: Throwable => Map.empty } // unreadable: rebuild fresh
    val merged = (stale -- ran) ++ failed
    if (merged.nonEmpty) {
      val errJson = merged.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(ep, errJson)
    } else {
      Files.deleteIfExists(ep); ()
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: ${failed.keys.mkString(", ")}")
    failed.toMap
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query names — local iteration only]
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Option.empty[Set[String]])
      case Array(s, o, n) => (s, o, Some(n.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark,
      SparkEntry.queries.toSeq.filter { case (name, _) => only.forall(_.contains(name)) },
      sfDir, outDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // deliberately rc=0 even on per-query failure: the red-row parquet +
    // errors.json are the signal; a nonzero rc could make a harness discard
    // the 100+ healthy results along with the broken one.
  }
}
