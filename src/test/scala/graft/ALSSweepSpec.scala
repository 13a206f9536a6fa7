package graft

import org.scalatest.funsuite.AnyFunSuite

/** C6b reference-exact ALS building blocks. */
class ALSSweepSpec extends AnyFunSuite {
  val D = ALSSweep.D

  test("choleskySolve solves a known SPD system to machine precision") {
    // A = M Mᵀ + I (deterministic entries) is SPD; check A·x = b
    val m = Array.tabulate(D, D)((i, j) => ((i * 7 + j * 3) % 5 + 1).toDouble)
    val a = new Array[Double](D * D)
    for (i <- 0 until D; j <- 0 until D) {
      var s = if (i == j) 1.0 else 0.0
      for (k <- 0 until D) s += m(i)(k) * m(j)(k)
      a(i * D + j) = s
    }
    val b = Array.tabulate(D)(i => (i + 1).toDouble)
    val x = ALSSweep.choleskySolve(a, b)
    for (i <- 0 until D) {
      var s = 0.0
      for (j <- 0 until D) s += a(i * D + j) * x(j)
      assert(math.abs(s - b(i)) < 1e-9, s"row $i: $s vs ${b(i)}")
    }
  }

  test("alternating sweeps fit a tiny rating matrix below the trivial baseline") {
    val spark = TestSpark.spark
    val s = spark; import s.implicits._
    // 4 users x 3 items, ratings with real structure (user i likes item i%3)
    val r = (for (u <- 0 until 4; i <- 0 until 3)
      yield (u, i, if (i == u % 3) 5.0f else 1.0f)).toDF("user", "item", "rating")
    val (uf, itf) = ALSSweep.fit(spark, r, iters = 5)
    assert(uf.count() == 4 && itf.count() == 3)
    val rmse = {
      val u = uf.select($"id".as("uid"), $"f".as("ufv"))
      val it = itf.select($"id".as("iid"), $"f".as("ifv"))
      r.join(u, $"user" === $"uid").join(it, $"item" === $"iid")
        .select($"rating".cast("double").as("r"),
          org.apache.spark.sql.functions.expr(
            "aggregate(zip_with(ufv, ifv, (x, y) -> x * y), 0d, (s, v) -> s + v)").as("p"))
        .selectExpr("sqrt(avg(pow(r - p, 2))) AS rmse").head.getDouble(0)
    }
    // predict-the-mean RMSE for this matrix is ~1.89; the D=10 fit must do
    // far better on 12 observations
    assert(rmse < 0.5, s"rmse=$rmse")
  }
}
