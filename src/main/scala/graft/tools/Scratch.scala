package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for optimization-round plan experiments: times
  * candidate re-formulations of the headline queries side by side through
  * the noop sink. Not part of the registry; deleted when the round's
  * experiments conclude.
  *
  * Usage: graft.tools.Scratch [sfDir] [reps]
  */
object Scratch {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = Engine.session("graft-scratch")

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${times.map(x => f"$x%.3f").mkString(" ")}  min=${times.min}%.3f med=${times.sorted.apply(times.length / 2)}%.3f")
    }

    // ---- q3 variants ----
    def q3(hint: String): DataFrame = {
      val s = spark
      val c = t(s, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, sfDir, "orders")
      val li = t(s, sfDir, "lineitem")
      val co0 = c.join(o, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      val co = if (hint.isEmpty) co0 else co0.hint(hint)
      li.join(co, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg((sum(expr("cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)"))
          .cast("double") / 100).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }
    // time("q3_shuffle_hash")(q3("shuffle_hash"))
    // time("q3_current")(q3(""))

    // ---- q43 variants ----
    def q43(hint: String): DataFrame = {
      val s = spark
      val asiaNations = broadcast(
        t(s, sfDir, "nation")
          .join(broadcast(t(s, sfDir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      val orders96 = t(s, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val chain0 = t(s, sfDir, "customer")
        .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
        .join(orders96, col("c_custkey") === col("o_custkey"))
      val chain = if (hint.isEmpty) chain0 else chain0.hint(hint)
      chain
        .join(t(s, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, sfDir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(expr("cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)"))
            .as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }
    // time("q43_shuffle_hash")(q43("shuffle_hash"))
    // time("q43_current")(q43(""))

    // ---- q44 variants ----
    def q44(mode: String): DataFrame = {
      val s = spark
      val asiaNationKeys = broadcast(
        t(s, sfDir, "nation")
          .join(broadcast(t(s, sfDir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey")))
      val asiaCust0 = t(s, sfDir, "customer")
        .join(asiaNationKeys, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val asiaCust = if (mode == "shj" || mode == "shj_early") asiaCust0.hint("shuffle_hash") else asiaCust0
      val ord = t(s, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val stdParts = broadcast(
        t(s, sfDir, "part").filter(col("p_type") === "STANDARD")
          .select(col("p_partkey")))
      val supNation = broadcast(
        t(s, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey")))
      val base = t(s, sfDir, "lineitem")
        .join(stdParts, col("l_partkey") === col("p_partkey"))
      val early = mode == "shj_early" || mode == "early"
      val withVol = if (early)
        base.withColumn("vol_cents",
          expr("cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)"))
          .select(col("l_orderkey"), col("l_suppkey"), col("vol_cents"))
      else base
      val joined = withVol
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(supNation, col("l_suppkey") === col("s_suppkey"))
      val volExpr = if (early) col("vol_cents")
        else expr("cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)")
      joined.withColumn("vc", volExpr)
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("s_nationkey") === 5, col("vc")).otherwise(0L))
            .as("nation_cents"),
          sum(col("vc")).as("total_cents"))
        .withColumn("mkt_share",
          expr("floor(nation_cents / total_cents * 1e6 + 0.5) / 1e6"))
        .orderBy(col("o_year"))
    }
    // time("q44_shj_early")(q44("shj_early"))
    // time("q44_shj")(q44("shj"))
    // time("q44_early")(q44("early"))
    // time("q44_current")(q44(""))



    // ---- lm_bigram_score variants ----
    import org.apache.spark.sql.expressions.Window
    def lm(mode: String): DataFrame = {
      val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val bigrams =
        if (mode.contains("noPush")) {
          // single split eval: guard the transform with CASE, no filter to push
          docs.select(col("doc_id"), split(col("text"), " ").as("w"))
            .select(col("doc_id"), explode(expr(
              """CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2),
                 i -> concat_ws(' ', w[i], w[i+1])) ELSE array() END""")).as("bg"))
        } else {
          docs.select(col("doc_id"), split(col("text"), " ").as("w"))
            .filter(size(col("w")) >= 2)
            .select(col("doc_id"), explode(expr(
              """transform(sequence(0, size(w)-2),
                 i -> concat_ws(' ', w[i], w[i+1]))""")).as("bg"))
        }
      val model = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val scoredModel0 = model
        .withColumn("c_w1", sum(col("c_bg"))
          .over(Window.partitionBy(col("w1"))))
        .select(col("bg"), expr(
          "cast(floor(cast(c_bg as double) / c_w1 * 1e8 + 0.5) as bigint)").as("p_scaled"))
      val scoredModel = if (mode.contains("shj")) scoredModel0.hint("shuffle_hash") else scoredModel0
      bigrams
        .join(scoredModel, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_scaled")).as("sum_scaled"))
        .withColumn("avg_p", expr(
          "floor(cast(sum_scaled as double) / n_bigrams / 100.0 + 0.5) / 1e6"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_scaled"), col("avg_p"))
        .orderBy(col("doc_id"))
    }

    // time("lm_noPush_shj")(lm("noPush_shj"))
    // time("lm_shj")(lm("shj"))
    // time("lm_noPush")(lm("noPush"))
    // time("lm_current")(lm(""))


    // ---- beam checkpoint-frequency variants (over the NEW keyed layout) ----
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val (knn0, lnkAll0, ent0, q0, e00, nV) = graft.operators.Similarity.beamBuildFrames(spark, sfDir)
    val knn = knn0.localCheckpoint(true)
    val lnkAll = lnkAll0.localCheckpoint(true)
    def halfEdges = knn.union(lnkAll.filter(col("j") <= 4).select(col("vec_a"), col("vec_b")))
    val adjParts = graft.operators.Similarity.servingParts(nV * 14, 24)
    val vecParts = graft.operators.Similarity.servingParts(nV, 264)
    val adjC = halfEdges.union(halfEdges.select(col("vec_b").as("vec_a"), col("vec_a").as("vec_b")))
      .distinct().repartition(adjParts, col("vec_a")).sortWithinPartitions(col("vec_a"))
      .localCheckpoint(true)
    val eC = e00.repartition(vecParts, col("vec_id")).sortWithinPartitions(col("vec_id"))
      .localCheckpoint(true)
    val q = q0.localCheckpoint(true)
    val ent = ent0.localCheckpoint(true)
    def cos(a: String, b: String) = expr(s"graft_cosine($a, $b)")
    val wB = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))

    // beamB2: keyed layout + broadcast beam-keys into the expansion join
    def beamB2(bcast: Boolean): DataFrame = {
      def score(cands: DataFrame): DataFrame =
        cands.join(eC, "vec_id").join(broadcast(q), "q_id")
          .select(col("q_id"), col("vec_id"), round(cos("embedding", "q_emb"), 4).as("cos_sim"))
      def prune(scored: DataFrame): DataFrame = {
        val lc = scored
          .repartition(col("q_id"))
          .dropDuplicates("q_id", "vec_id")
          .withColumn("rn", row_number().over(wB)).filter(col("rn") <= 16)
          .select(col("q_id"), col("vec_id"), col("cos_sim")).localCheckpoint(true)
        spark.createDataFrame(lc.rdd, lc.schema)
      }
      var beam = prune(score(q.select(col("q_id")).crossJoin(ent)))
      (1 to 5).foreach { _ =>
        val beamKeys = beam.select(col("q_id"), col("vec_id").as("vec_a"))
        val expanded =
          if (bcast) adjC.join(broadcast(beamKeys), "vec_a")
          else beamKeys.join(adjC, "vec_a")
        val nbrs = expanded
          .select(col("q_id"), col("vec_b").as("vec_id"))
          .repartition(vecParts, col("vec_id")).dropDuplicates("q_id", "vec_id")
        beam = prune(score(nbrs).union(beam))
      }
      beam.filter(col("vec_id") =!= col("q_id"))
        .withColumn("rank", row_number().over(wB)).filter(col("rank") <= 10)
        .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
        .orderBy(col("q_id"), col("rank"))
    }
    val c1 = beamB2(false).collect().map(_.toString).toSeq
    val c2 = beamB2(true).collect().map(_.toString).toSeq
    println(s"B2 equal: ${c1 == c2}")
    time("beam_bcastExp_1")(beamB2(true))
    time("beam_exch_1")(beamB2(false))
    time("beam_bcastExp_2")(beamB2(true))
    time("beam_exch_2")(beamB2(false))

    spark.stop()
  }
}
