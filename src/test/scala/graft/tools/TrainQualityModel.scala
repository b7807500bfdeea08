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
  * The bounded sample is hash-split ~80/20 (`QualityModel.splitSample`,
  * independent base-257 id hash); the COMMITTED weights are trained on
  * the train side only, and both train and HELD-OUT accuracy/precision/
  * recall are printed so the artifact's generalization is on record
  * (train accuracy alone overstates a perceptron). The held-out floor
  * is pinned by `QualityModelSpec`.
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
    val (trainSet, heldOut) = QualityModel.splitSample(sample)
    val model = QualityModel.train(trainSet, epochs = 5)
    QualityModel.writeWeights(spark, QualityModel.weightsPath, model)
    val trainEval = QualityModel.evaluate(model, trainSet)
    val testEval = QualityModel.evaluate(model, heldOut)
    val nz = model.weights.count(_ != 0L)
    println(s"TRAINED quality model on ${trainSet.size} docs from $dir " +
      s"(held out ${heldOut.size}): " +
      s"train acc ${trainEval.accMilli} permille; " +
      s"HELD-OUT acc ${testEval.accMilli} prec ${testEval.precMilli} " +
      s"rec ${testEval.recMilli} permille; " +
      s"$nz nonzero weights, bias ${model.bias} " +
      s"-> ${QualityModel.weightsPath}")
    spark.stop()
  }
}
