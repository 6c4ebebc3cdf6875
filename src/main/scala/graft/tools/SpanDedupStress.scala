package graft.tools

import org.apache.spark.sql.functions._

/** Span-dedup stress on the replica corpora (/tmp/sf1, /tmp/sf5):
  * every document has R exact copies, so every ≥k-token document
  * must come out EXACTLY fully covered — one span [0, ntok) — and
  * rewrite to an empty kept_text. That invariant is checked with
  * aggregates (never a collect), making this both a wall-clock and
  * an at-scale correctness run for the worst case where 100% of
  * windows are duplicated. */
object SpanDedupStress {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local("span-dedup-stress")
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args.toSeq match {
      case Nil => Seq("/tmp/sf1", "/tmp/sf5")
      case ds => ds
    }) {
      val docs = graft.sources.Tables.load(spark, d, "documents")
      val k = 15
      val eligible = docs
        .where(graft.expressions.NativeText.tokenCount(col("text")) >= k)
        .count()
      var t0 = System.nanoTime()
      val spans = graft.operators.SpanDedup.duplicatedSpans(docs, k)
        .localCheckpoint()
      val nSpans = spans.count()
      val tSpans = (System.nanoTime() - t0) / 1e9
      // invariant 1: one span per eligible doc, covering [0, ntok)
      val bad = spans
        .join(docs.select(col("doc_id"),
          graft.expressions.NativeText.tokenCount(col("text")).as("ntok")),
          Seq("doc_id"))
        .where(col("span_start") =!= 0 || col("span_end") =!= col("ntok"))
        .count()
      t0 = System.nanoTime()
      val rewritten = graft.operators.SpanDedup.removeSpans(docs, spans)
      val agg = rewritten.agg(
        count(lit(1)).as("n"),
        sum(when(col("kept_text") === "", 1).otherwise(0)).as("empty"),
        sum(col("n_removed")).as("removed")).head()
      val tRewrite = (System.nanoTime() - t0) / 1e9
      println(s"[$d] eligible=$eligible spans=$nSpans badSpans=$bad " +
        s"docs=${agg.getLong(0)} fullyEmptied=${agg.getLong(1)} " +
        s"tokensRemoved=${agg.getLong(2)} " +
        f"spans=$tSpans%.1fs rewrite=$tRewrite%.1fs")
      assert(nSpans == eligible, s"expected one full span per eligible doc")
      assert(bad == 0, "a span failed the full-coverage invariant")
      assert(agg.getLong(1) == eligible, "an eligible doc kept text")
    }
    spark.stop()
  }
}
