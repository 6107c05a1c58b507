package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

/** Hand-computed semantic pin for ev_changepoint: a planted level shift
  * 0,0,0,0 -> 10,10,10,10 must locate the change at k=4 (the last
  * pre-shift point, where |S_k| peaks). With v6 = value*1e6 the scaled
  * statistic n*prefix_k - k*tot is 8*0 - 4*4e7 = -1.6e8 at k=4, larger in
  * magnitude than any other k. A 7-point key stays below the n >= 8
  * reporting floor. */
class ChangepointSpec extends SparkTestBase {

  test("CUSUM locates a planted level shift; short series don't report") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("changepoint").toString
    val base = 1700000000000L
    def ev(id: Long, user: Long, sec: Int, v: Double) =
      (id, new Timestamp(base + sec * 1000L), user, v)
    val shifted = (0 until 4).map(i => ev(i.toLong, 1L, i, 0.0)) ++
      (4 until 8).map(i => ev(i.toLong, 1L, i, 10.0))
    val short7 = (0 until 7).map(i => ev(100L + i, 2L, i, i.toDouble))
    (shifted ++ short7).toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = EventOps.changepoint.run(spark, dir)
      .select("user_id", "n_events", "cp_index", "cusum_stat")
      .as[(Long, Long, Int, Long)].collect().toList
    assert(got == List((1L, 8L, 4, 160000000L)), s"got $got")
  }
}
