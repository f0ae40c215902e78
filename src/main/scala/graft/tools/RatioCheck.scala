package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
object RatioCheck {
  def ratioOf(emb: org.apache.spark.sql.DataFrame): Double = {
    val sample = Similarity.trainSample(emb)
      .select(org.apache.spark.sql.functions.col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = sample.head.length; val n = sample.length.toDouble
    val mean = Array.tabulate(dim)(j => sample.map(_(j)).sum / n)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    sample.foreach { v => var i=0; while (i<dim) { var j=0; while (j<dim) { cov(i,j) += (v(i)-mean(i))*(v(j)-mean(j)); j+=1}; i+=1}}
    cov :/= n
    val ev = breeze.linalg.eigSym(cov).eigenvalues.toArray.sorted.reverse
    ev(0) / math.max(ev(dim/2), 1e-12)
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[ratio] fixture: ${ratioOf(MeasureOpq.clusteredFixture(spark, 4000))}%.2f")
    for (sf <- Seq("sf0.001","sf0.01","sf0.1"))
      println(f"[ratio] $sf: ${ratioOf(graft.Tables.embeddings(spark, s"/root/testdata/$sf"))}%.2f")
    spark.stop()
  }
}
