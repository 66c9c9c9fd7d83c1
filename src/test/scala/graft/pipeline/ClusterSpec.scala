package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.functions.Similarity.jvm

class ClusterSpec extends AnyFunSuite {
  import spark.implicits._

  /** Integer-valued float vectors: every Lloyd mean is an exact small
    * rational, so the distributed avg is order-independent and a driver
    * reference can replay it bit-for-bit. */
  private def vec(xs: Int*): Array[Float] = xs.map(_.toFloat).toArray

  private val pts = Seq(
    (0L, vec(0, 0)), (1L, vec(2, 0)), (2L, vec(0, 2)),   // blob at origin
    (3L, vec(20, 20)), (4L, vec(22, 20)), (5L, vec(20, 22)), // far blob
    (6L, vec(21, 21))
  ).toDF("id", "key")

  test("assign is the brute-force strict-< argmin over the centroids") {
    val cents = Array(vec(0, 0), vec(1, 1), vec(21, 21))
    val got = Cluster.assign(pts, "key", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    val want = pts.select("id", "key").as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        var best = 0; var bestD = Double.MaxValue
        cents.zipWithIndex.foreach { case (c, i) =>
          val d = jvm.sqEuclidean(v, c)
          if (d < bestD) { bestD = d; best = i } // strict < keeps first min
        }
        id -> best
      }.toMap
    assert(got == want)
  }

  test("assign tie-break keeps the lowest centroid index") {
    // point equidistant from centroids 0 and 1
    val one = Seq((0L, vec(1, 0))).toDF("id", "key")
    val cents = Array(vec(0, 0), vec(2, 0))
    val got = Cluster.assign(one, "key", cents)
      .select("cluster").as[Int].head()
    assert(got == 0)
  }

  test("kmeans matches a driver-side Lloyd reference on exact-mean data") {
    val k = 2; val iters = 2
    val (gotCents, assigned) = Cluster.kmeans(pts, "id", "key", k, iters)
    // driver reference: identical seed (k smallest-id vectors), identical
    // assign (strict-< argmin), identical update (mean; exact on this data)
    val data = pts.orderBy("id").select("id", "key")
      .as[(Long, Array[Float])].collect()
    var cents = data.take(k).map(_._2)
    (1 to iters).foreach { _ =>
      val byCell = data.groupBy { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        cents.zipWithIndex.foreach { case (c, i) =>
          val d = jvm.sqEuclidean(v, c)
          if (d < bestD) { bestD = d; best = i }
        }
        best
      }
      cents = cents.indices.map { i =>
        byCell.get(i) match {
          case Some(rows) =>
            val dim = rows.head._2.length
            Array.tabulate(dim) { d =>
              (rows.map(_._2(d).toDouble).sum / rows.size).toFloat
            }
          case None => cents(i)
        }
      }.toArray
    }
    assert(gotCents.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    val gotAssign = assigned.select("id", "cluster")
      .as[(Long, Int)].collect().toMap
    val wantAssign = data.map { case (id, v) =>
      var best = 0; var bestD = Double.MaxValue
      cents.zipWithIndex.foreach { case (c, i) =>
        val d = jvm.sqEuclidean(v, c)
        if (d < bestD) { bestD = d; best = i }
      }
      id -> best
    }.toMap
    assert(gotAssign == wantAssign)
    // the far blob separates from the origin blob
    assert(Set(3L, 4L, 5L, 6L).map(gotAssign).size == 1)
    assert(Set(0L, 1L, 2L).map(gotAssign).size == 1)
    assert(gotAssign(0L) != gotAssign(3L))
  }

  test("embeddingOutliers flags dist2 > factor x cluster mean via exact integers") {
    // two tight blobs + one far point per blob. Blob A at centroid (0,0):
    // members at d2 {0, 4, 4} and an outlier at (10,0) -> d2 100;
    // mean = 108/4 = 27, 100 > 4*27? No (108). Use factor 3: 100*4 > 3*108
    // (400 > 324) -> outlier; the d2=4 members: 16 > 324? no.
    val cents = Array(vec(0, 0), vec(21, 21))
    val data = Seq(
      (0L, vec(0, 0)), (1L, vec(2, 0)), (2L, vec(0, 2)), (3L, vec(10, 0)),
      (4L, vec(21, 21)), (5L, vec(21, 23)), (6L, vec(19, 21)), (7L, vec(21, 5))
    ).toDF("id", "key")
    val got = Cluster.embeddingOutliers(data, "id", "key", cents,
        factorNum = 3L, factorDen = 1L)
      .select("id", "cluster", "dist2_e6", "n_cluster", "is_outlier")
      .as[(Long, Int, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // exact integral distances (integer coordinates -> exact doubles)
    assert(got(0L) == ((0L, 0, 0L, 4L, false)))
    assert(got(1L) == ((1L, 0, 4000000L, 4L, false)))
    assert(got(3L) == ((3L, 0, 100000000L, 4L, true)),
      "the far point must be flagged: 100*4 > 3*108")
    // blob B: d2 {0, 4, 4, 256}; 256*4 > 3*264 -> outlier
    assert(got(7L)._5 && !got(4L)._5 && !got(5L)._5)
    // driver replay of the integer rule over every row
    val byCluster = got.values.groupBy(_._2)
    got.values.foreach { case (id, c, d6, n, flag) =>
      val sum = byCluster(c).map(_._3).sum
      assert(flag == (BigInt(d6) * n > BigInt(3) * sum),
        s"flag mismatch for id $id")
    }
    // degenerate inputs refused loudly
    intercept[IllegalArgumentException] {
      Cluster.embeddingOutliers(data, "id", "key", Array.empty[Array[Float]])
    }
    intercept[IllegalArgumentException] {
      Cluster.embeddingOutliers(data, "id", "key", cents, factorNum = 0L)
    }
  }

  test("balancedSample caps each cluster at perCluster in md5(id) order") {
    val df = (0L until 40L).map(i => (i, (i % 3).toInt)).toDF("id", "cluster")
    val got = Cluster.balancedSample(df, "cluster", "id", 4)
      .select("id", "cluster").as[(Long, Int)].collect()
    assert(got.groupBy(_._2).forall(_._2.length == 4))
    // driver reference: per cluster, the 4 smallest (md5(id string), id)
    val want = (0L until 40L).groupBy(i => (i % 3).toInt).flatMap {
      case (c, ids) =>
        ids.sortBy(i => (org.apache.commons.codec.digest.DigestUtils
          .md5Hex(i.toString), i)).take(4).map(i => (i, c))
    }.toSet
    assert(got.toSet == want)
  }

  test("seedCentroids returns the k smallest-id vectors in id order") {
    val cents = Cluster.seedCentroids(pts, "id", "key", 3)
    assert(cents.map(_.toSeq).toSeq ==
      Seq(vec(0, 0).toSeq, vec(2, 0).toSeq, vec(0, 2).toSeq))
  }
}
