package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ml.Pca

/** Dimensionality reduction over the `embeddings` table — q146: PCA
  * projection to the top-8 principal components (the standard
  * pre-indexing/whitening step for embedding corpora; the rotation
  * family q141's OPQ cites, here as its own first-class operator).
  *
  * Oracle strategy = the q141 pinned-artifact recipe: the fitted model
  * (μ + top-8 eigenvectors) is captured at query run, and the DuckDB
  * twin replays ONLY the projection — a plan-literal fold with term
  * order identical to the Spark kernel — against the pinned literals.
  * Training equivalence is spec-proven (PcaSpec: orthonormality, eigen
  * residuals against a driver-recomputed covariance, per-component
  * variance ≡ eigenvalue). Eigensolving is not expressible in DuckDB
  * SQL, which is exactly the class of problem the pinned recipe exists
  * for (VERDICT r14 #1).
  */
object ReductionQueries {

  private val Dim = 64
  private val NComp = 8

  private val pcaModels =
    new java.util.concurrent.ConcurrentHashMap[String, Pca.PcaModel]()

  private def model(spark: SparkSession, dir: String): Pca.PcaModel =
    pcaModels.computeIfAbsent(dir, { d =>
      Pca.fit(Tables.embeddings(spark, d).select("embedding"), Dim, NComp)
    })

  /** q146: per-vector top-8 PCA coordinates, exploded to
    * (vec_id, component, value) rows (array outputs stay out of the
    * gate's cell compare). Fit = one shuffle-free moment scan; project =
    * one broadcast-GEMV scan. */
  def q146PcaProject(spark: SparkSession, dir: String): DataFrame =
    Pca.project(Tables.embeddings(spark, dir).select("vec_id", "embedding"),
        model(spark, dir))
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("component", "value")))
      .select(col("vec_id"), col("component"),
        round(col("value"), 4).as("value"))

  /** The q146 oracle, interpolating μ/V captured at fit time (q141's
    * single-dir-per-process discipline: fail loudly rather than replay a
    * possibly-wrong model). */
  def q146PcaProjectSql: String = {
    if (pcaModels.size() > 1)
      throw new IllegalStateException(
        "q146 oracle is single-dir per process; models fitted for: " +
          String.join(", ", pcaModels.keySet()))
    val it = pcaModels.values().iterator()
    if (!it.hasNext)
      return "SELECT 'q146 must run before its oracle dumps (model is captured at fit)' AS error"
    val m = it.next()
    // Double.toString round-trips; DuckDB's cast parses correctly-rounded
    val muLit = m.mu.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val vLit = m.components.flatten.map(java.lang.Double.toString)
      .mkString("[", ", ", "]")
    s"""WITH mu AS (SELECT $muLit::DOUBLE[] AS m),
       |vm AS (SELECT $vLit::DOUBLE[] AS v)
       |SELECT vec_id, i AS component, round(y, 4) AS value FROM (
       |  SELECT e.vec_id, t.i,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range($Dim), j ->
       |        vm.v[t.i * $Dim + j + 1] * (e.embedding[j + 1]::DOUBLE - mu.m[j + 1]))),
       |      (a, b) -> a + b) AS y
       |  FROM embeddings e
       |  CROSS JOIN range($NComp) t(i)
       |  CROSS JOIN mu CROSS JOIN vm
       |)""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q146_pca_project" -> (q146PcaProject _)
  )

  def sql: Map[String, String] = Map(
    "q146_pca_project" -> q146PcaProjectSql
  )
}
