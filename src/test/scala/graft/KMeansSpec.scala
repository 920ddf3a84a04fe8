package graft

import graft.ml.KMeans

import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("fit separates two obvious blobs regardless of init membership") {
    // ids 0,1 seed the two centroids; 2,3 join blob A, 4,5 blob B
    val d = df(
      0L -> Seq(0.0f, 0.0f), 2L -> Seq(0.1f, 0.0f), 3L -> Seq(0.0f, 0.1f),
      1L -> Seq(1.0f, 1.0f), 4L -> Seq(0.9f, 1.0f), 5L -> Seq(1.0f, 0.9f))
    val out = KMeans.fit(d, col("vec_id"), col("embedding"),
      k = 2, iters = 3).orderBy("vec_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 2L, 3L).map(byId) === Set(0L))
    assert(Set(1L, 4L, 5L).map(byId) === Set(1L))
    // members of the tight blob sit near their centroid: exact integer
    // dist in micro-units^2, small but nonzero for non-seed members
    assert(out.forall(_.getLong(2) >= 0L))
  }

  test("equidistant points tie-break to the smaller cluster id") {
    // centroids stay at 0 and 1 (symmetric members); 0.5 is equidistant
    val d = df(
      0L -> Seq(0.0f), 1L -> Seq(1.0f), 2L -> Seq(0.5f))
    val out = KMeans.fit(d, col("vec_id"), col("embedding"),
      k = 2, iters = 1).orderBy("vec_id").collect()
    assert(out(2).getLong(1) === 0L)
  }

  test("a cluster that captures no points keeps its previous centroid") {
    // Identical seeds: both centroids start at 0, every point
    // tie-breaks into cluster 0, so cluster 1 is EMPTY after iter 1
    // and must keep its centroid at 0. Iter 1 moves centroid 0 to the
    // mean 0.3; in iter 2 the points at 0.0 can then only return to
    // the RETAINED cluster-1 centroid — if it had collapsed or gone
    // null they would have nowhere exact to land.
    val d = df(0L -> Seq(0.0f), 1L -> Seq(0.0f), 2L -> Seq(0.9f))
    val out = KMeans.fit(d, col("vec_id"), col("embedding"),
      k = 2, iters = 2).orderBy("vec_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === Map(0L -> 1L, 1L -> 1L, 2L -> 0L))
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("halfUpDiv matches sign-safe half-up on negatives") {
    assert(KMeans.halfUpDiv(5, 2) === 3L)
    assert(KMeans.halfUpDiv(-5, 2) === -3L)
    assert(KMeans.halfUpDiv(4, 2) === 2L)
    assert(KMeans.halfUpDiv(-4, 2) === -2L)
    assert(KMeans.halfUpDiv(1, 3) === 0L)
    assert(KMeans.halfUpDiv(-1, 3) === 0L)
  }

  test("a row with the wrong dimensionality raises, never mis-assigns") {
    val d = df(0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f),
      2L -> Seq(0.5f))
    val e = intercept[Exception] {
      KMeans.fit(d, col("vec_id"), col("embedding"), k = 2, iters = 1)
        .collect()
    }
    assert(e.getMessage.contains("kmeans") ||
      Option(e.getCause).exists(_.getMessage.contains("kmeans")))
  }
}
