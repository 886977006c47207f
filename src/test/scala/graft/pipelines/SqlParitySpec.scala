package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's primary interface for P3 is a single SQL statement
  * (utils/duckdb_electricity_1-minute.py). This spec proves the SAME
  * pipeline is expressible as ONE `spark.sql` multi-CTE statement —
  * bit-identical to the DataFrame implementation — so a SQL-first user
  * of the reference can port their query nearly verbatim and get the
  * identical Catalyst plan machinery (windows, sequence explode, HOF
  * ordered fold).
  */
class SqlParitySpec extends SparkSpec {

  private val csv = "/root/reference/utils/For Pandas and Polars --- Electricity.csv"

  test("P3 as one spark.sql statement ≡ the DataFrame pipeline (bit-exact)") {
    ElectricityPipeline.read(spark, csv).createOrReplaceTempView("readings")
    val sql = spark.sql(
      """WITH years AS (
        |  SELECT DISTINCT year(LocalDateTime) AS yr FROM readings
        |),
        |bst AS (
        |  SELECT yr,
        |    to_timestamp(concat_ws(' ',
        |      date_sub(last_day(make_date(yr, 3, 1)), (dayofweek(last_day(make_date(yr, 3, 1))) - 1) % 7),
        |      '01:00:00')) AS bst_start,
        |    to_timestamp(concat_ws(' ',
        |      date_sub(last_day(make_date(yr, 10, 1)), (dayofweek(last_day(make_date(yr, 10, 1))) - 1) % 7),
        |      '02:00:00')) AS bst_end
        |  FROM years
        |),
        |utc AS (
        |  SELECT CASE WHEN r.LocalDateTime >= b.bst_start AND r.LocalDateTime < b.bst_end
        |              THEN r.LocalDateTime - INTERVAL 1 HOUR ELSE r.LocalDateTime END AS utc_dt,
        |         r.P, r.OP
        |  FROM readings r JOIN bst b ON year(r.LocalDateTime) = b.yr
        |),
        |deltas AS (
        |  SELECT utc_dt,
        |    lead(utc_dt) OVER w AS next_dt,
        |    (lead(P) OVER w) - P AS dp,
        |    (lead(OP) OVER w) - OP AS dop
        |  FROM utc WINDOW w AS (ORDER BY utc_dt)
        |),
        |grid AS (
        |  SELECT utc_dt, dp, dop,
        |    explode(sequence(utc_dt + INTERVAL 1 MINUTE, next_dt, INTERVAL 1 MINUTE)) AS m
        |  FROM deltas WHERE next_dt IS NOT NULL
        |),
        |cat AS (
        |  SELECT *, CASE WHEN unix_micros(m) % 86400000000 > 23400000000
        |                  AND unix_micros(m) % 86400000000 <= 84600000000
        |                 THEN 'P' ELSE 'OP' END AS category
        |  FROM grid
        |),
        |counted AS (
        |  SELECT *,
        |    sum(CASE WHEN category = 'P' THEN 1 ELSE 0 END) OVER (PARTITION BY utc_dt) AS pmins,
        |    sum(CASE WHEN category = 'OP' THEN 1 ELSE 0 END) OVER (PARTITION BY utc_dt) AS opmins
        |  FROM cat
        |),
        |per_interval AS (
        |  SELECT timestamp_seconds(floor(unix_micros(m - INTERVAL 1 MINUTE) / 900000000) * 900) AS Bucket,
        |    utc_dt,
        |    min(m) AS fm, max(m) AS lm, count(1) AS mins,
        |    sum(CASE WHEN category = 'P' THEN 1 ELSE 0 END) AS cnt_p,
        |    sum(CASE WHEN category = 'OP' THEN 1 ELSE 0 END) AS cnt_op,
        |    first(dp) AS dp, first(dop) AS dop,
        |    first(pmins) AS pmins, first(opmins) AS opmins
        |  FROM counted GROUP BY 1, 2
        |),
        |subs AS (
        |  SELECT Bucket, utc_dt, fm, lm, mins,
        |    CASE WHEN cnt_p > 0 AND pmins > 0
        |         THEN dp * CAST(cnt_p AS DOUBLE) / CAST(pmins AS DOUBLE) END AS p_sub,
        |    CASE WHEN cnt_op > 0 AND opmins > 0
        |         THEN dop * CAST(cnt_op AS DOUBLE) / CAST(opmins AS DOUBLE) END AS op_sub
        |  FROM per_interval
        |),
        |collected AS (
        |  SELECT Bucket,
        |    min(fm) AS First_Minute, max(lm) AS Last_Minute, sum(mins) AS Minutes,
        |    array_sort(collect_list(CASE WHEN p_sub IS NOT NULL
        |      THEN named_struct('u', utc_dt, 'v', p_sub) END)) AS ps,
        |    array_sort(collect_list(CASE WHEN op_sub IS NOT NULL
        |      THEN named_struct('u', utc_dt, 'v', op_sub) END)) AS os
        |  FROM subs GROUP BY Bucket
        |)
        |SELECT Bucket, First_Minute, Last_Minute, Minutes,
        |  CASE WHEN size(ps) > 0
        |       THEN aggregate(ps, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v) END AS P_Usage,
        |  CASE WHEN size(os) > 0
        |       THEN aggregate(os, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v) END AS OP_Usage
        |FROM collected
        |ORDER BY Bucket""".stripMargin)

    val df = ElectricityPipeline.run(spark, csv)
    assert(sql.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    // bit-exact: the deterministic ordered-fold summation makes the two
    // formulations literally identical, not merely close
    assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
    assert(sql.count() == df.count())
  }
}
