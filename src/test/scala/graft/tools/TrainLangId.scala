package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.LangIdModel

/** Trains the committed char-trigram Naive-Bayes language classifier
  * (`data/codebooks/langid_nb.parquet`) on the TRAIN split of the
  * committed multilingual corpus (`GenLangCorpus` — regenerated here,
  * which `LangIdCorpusSpec` pins equal to the committed parquet) and
  * prints held-out per-language accuracy on the TEST split; the floors
  * printed here are pinned by `LangIdModelSpec`.
  */
object TrainLangId {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = GenLangCorpus.corpus()
    val trainSet = corpus.collect { case (id, lang, "train", text) =>
      (id, lang, text)
    }
    val heldOut = corpus.collect { case (id, lang, "test", text) =>
      (id, lang, text)
    }
    val m = LangIdModel.train(trainSet)
    LangIdModel.writeModel(spark, LangIdModel.modelPath, m)
    val byLang = heldOut.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (lang, docs) =>
        val ok = docs.count { case (_, l, t) => LangIdModel.predict(t, m) == l }
        s"$lang $ok/${docs.size}"
    }
    val correct = heldOut.count { case (_, lang, text) =>
      LangIdModel.predict(text, m) == lang
    }
    println(s"TRAINED langid on ${trainSet.size} corpus docs: HELD-OUT " +
      s"accuracy $correct/${heldOut.size} " +
      s"(${correct * 1000 / math.max(1, heldOut.size)} permille; " +
      s"per-lang ${byLang.mkString(", ")}) -> ${LangIdModel.modelPath}")
    spark.stop()
  }
}
