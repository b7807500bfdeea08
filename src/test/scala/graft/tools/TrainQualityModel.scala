package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.QualityModel

/** Trains the committed quality-classifier weights in
  * `data/codebooks/quality_lr.parquet` from the sf0.01 documents —
  * deterministic (hash-ordered bounded sample, ascending-id training
  * order, fixed epochs, integer perceptron), so re-running this tool
  * reproduces the committed parquet values exactly.
  *
  *   Test/runMain graft.tools.TrainQualityModel [sfDir]
  *
  * Labels come from the heuristic gate (`TextOps.qualityOk`) — the
  * bootstrap every real pipeline uses before human labels exist.
  * Prints train-set accuracy so the artifact's fit is on record.
  */
object TrainQualityModel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sample = QualityModel.sampleDocs(docs, "doc_id", "text")
    val model = QualityModel.train(sample, epochs = 5)
    QualityModel.writeWeights(spark, QualityModel.weightsPath, model)
    val correct = sample.count { case (_, text, label) =>
      (model.score(text) > 0L) == label
    }
    val nz = model.weights.count(_ != 0L)
    println(s"TRAINED quality model on ${sample.size} docs from $dir: " +
      s"train accuracy ${correct}/${sample.size} " +
      s"(${1000 * correct / sample.size} permille), " +
      s"$nz nonzero weights, bias ${model.bias} " +
      s"-> ${QualityModel.weightsPath}")
    spark.stop()
  }
}
