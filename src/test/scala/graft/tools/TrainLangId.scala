package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.ops.{LangIdModel, QualityModel}

/** Trains the committed char-trigram Naive-Bayes language classifier
  * (`data/codebooks/langid_nb.parquet`) on the deterministically
  * marker-enriched fixture text (the fixture's `lang` labels carry no
  * textual signal of their own — see `LangIdModel`'s doc). The bounded
  * sample and the 80/20 hash split are the `QualityModel` discipline;
  * the committed θ trains on the train side only and the held-out
  * accuracy printed here is pinned by `LangIdModelSpec`.
  */
object TrainLangId {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("lang").isNotNull)
      .select(col("doc_id").cast(LongType), col("lang").cast(StringType),
        col("text"))
      .orderBy(graft.functions.PolyHash.polyHash(
        col("doc_id").cast(StringType), 131L), col("doc_id"))
      .limit(65536)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        LangIdModel.enrichedJvm(r.getString(2), r.getString(1),
          r.getLong(0))))
      .toSeq
    val (trainSet, heldOut) =
      docs.partition { case (id, _, _) => !QualityModel.holdOut(id) }
    val m = LangIdModel.train(trainSet)
    LangIdModel.writeModel(spark, LangIdModel.modelPath, m)
    val correct = heldOut.count { case (_, lang, text) =>
      LangIdModel.predict(text, m) == lang
    }
    println(s"TRAINED langid on ${trainSet.size} docs from $dir: " +
      s"HELD-OUT accuracy $correct/${heldOut.size} " +
      s"(${correct * 1000 / math.max(1, heldOut.size)} permille) " +
      s"-> ${LangIdModel.modelPath}")
    spark.stop()
  }
}
