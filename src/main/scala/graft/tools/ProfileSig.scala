package graft.tools

import org.apache.spark.sql.functions._

import graft.expressions.NativeSignatures
import graft.functions.Text

/** Scratch profiler: composed (charShingles → minhash) vs fused
  * (minhashText) signature build over the documents fixture. */
object ProfileSig {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("profile-sig")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .where(length(col("text")) >= 5)
    docs.write.format("noop").mode("overwrite").save() // warm scan

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      time("composed sig noop") {
        docs.select(col("doc_id"),
          NativeSignatures.minhashSignature(
            Text.charShingles(col("text"), 5), 128).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
      time("fused sig noop") {
        docs.select(col("doc_id"),
          NativeSignatures.minhashText(col("text"), 5, 128).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
