package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.Metrics
import graft.sources.Tables

/** §2.4 A7: the corr-aggregate matrix (the plan q_corr_matrix runs) must
  * agree with MLlib's `ml.stat.Correlation` — the independent
  * implementation — to float tolerance. Pins the round-2 rewrite that
  * replaced the RowMatrix path with one hash-agg pass.
  */
class MetricsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("A7: corrMatrix (aggregate path) matches ml.stat.Correlation (MLlib path)") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").select(cols.map(col): _*)

    val aggRows = Metrics.corrMatrix(li, cols).collect()
    val aggM = aggRows.map(r => r.getString(0) ->
      cols.map(c => r.getAs[Double](c)).toArray).toMap

    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("features").transform(li)
    val mllibM = Correlation.corr(assembled, "features", "pearson")
      .head().getAs[org.apache.spark.ml.linalg.Matrix](0)

    for (i <- cols.indices; j <- cols.indices) {
      val a = aggM(cols(i))(j)
      val m = mllibM(i, j)
      assert(math.abs(a - m) < 1e-9,
        s"corr(${cols(i)}, ${cols(j)}): agg=$a mllib=$m")
    }
  }
}
