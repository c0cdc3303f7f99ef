package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The trained quality classifier (t21): the model must actually learn
  * the heuristic it distills — held-out AUC floor — and the audit row's
  * accounting must match the hash split.
  */
class MlQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("held-out AUC clears the floor; split accounting matches; verdict true") {
    val (row, auc) = MlQuality.trainAndAudit(spark, sf)
    val r = row.head()
    info(f"held-out AUC = $auc%.3f on ${r.getAs[Long]("n_test")} docs")
    assert(auc >= 0.85, s"model failed to learn the heuristic: AUC $auc")
    assert(r.getAs[Boolean]("auc_ok"))
    val total = graft.Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == total)
    // the hash split is the p01 80/20: train strictly larger
    assert(r.getAs[Long]("n_train") > r.getAs[Long]("n_test"))
    // both classes present in the held-out slice (AUC is meaningful)
    val pos = r.getAs[Long]("n_pos_test")
    assert(pos > 0 && pos < r.getAs[Long]("n_test"))
  }
}
