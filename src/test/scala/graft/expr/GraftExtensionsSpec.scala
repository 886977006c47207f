package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Builds a second SparkSession (sharing the test JVM's SparkContext)
  * with the extensions wired, proving the SQL surface works without the
  * Scala helpers' lazy registration. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers all graft functions for SQL use") {
    graft.TestSpark.spark // ensure the shared context exists
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = spark.sql(
        """SELECT
          |  vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
          |  poly_hash('ab') AS p,
          |  simhash32(array(3L)) AS s,
          |  min_gram_hash('abcdefghij', 8) AS g,
          |  size(token_hashes('a b c')) AS t,
          |  size(shingle_hashes(array(1L, 2L, 3L, 4L), 3)) AS sh,
          |  size(minhash_sig(array(5L, 6L))) AS m
          |""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == (97L * 31 + 98) % 1000000007L)
      assert(r.getLong(2) == 3L) // single element: bits 0 and 1 set
      assert(!r.isNullAt(3))
      assert(r.getInt(4) == 3)
      assert(r.getInt(5) == 2)
      assert(r.getInt(6) == 8)
      // do NOT stop(): the SparkContext is shared with every other suite
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
