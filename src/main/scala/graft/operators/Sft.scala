package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) data preparation: render conversations —
  * arrays of (role, content) turns — into a single training string in
  * the public ChatML framing (`<|im_start|>role\ncontent<|im_end|>\n`
  * per turn), together with the LOSS-MASK character ranges covering
  * exactly the assistant turns' content (training loss is computed
  * only on what the assistant said; prompts and system text are
  * context). This is the rendering step between curated dialogue data
  * and sequence packing in every SFT pipeline.
  *
  * Character ranges (not token ranges) keep the operator
  * tokenizer-agnostic — the packing layer downstream maps chars to
  * its tokenizer's offsets. Ranges are half-open `[start, end)`.
  *
  * Scale shape: the whole rendering is ONE map-side pass — a fold
  * over each row's turn array with built-in HOFs (no UDF, no
  * shuffle); masks ride along as an array column. Conversations are
  * short (tens of turns), so the per-row fold is trivially bounded.
  */
object Sft {

  private val TurnOpen = "<|im_start|>"
  private val TurnClose = "<|im_end|>\n"

  /** Rendered length of one turn. */
  private def turnLen(role: Column, content: Column): Column =
    lit(TurnOpen.length) + length(role) + 1 + length(content) +
      lit(TurnClose.length)

  /** Render `turnsCol` (array<struct<role,content>>) into:
    *  - `text`: the ChatML string;
    *  - `masks`: array<struct<start,end>> — half-open char ranges of
    *    each `maskRole` turn's CONTENT (tag and newline excluded);
    *  - `masked_chars`: total characters under the mask.
    * A NULL turns array — or ANY turn with a NULL role/content —
    * renders as NULL across all three columns (junk is visible, not
    * silently dropped: array_join would omit a NULL turn from the
    * text while the offset fold nulls out, leaving assistant content
    * with no loss mask — a silent training-span corruption). */
  def render(df: DataFrame, turnsCol: String = "turns",
             maskRole: String = "assistant"): DataFrame = {
    val turns = col(turnsCol)
    val anyNullField = exists(turns, t =>
      t.getField("role").isNull || t.getField("content").isNull)
    // the text is the concatenation of the per-turn renders
    val rendered = array_join(
      transform(turns, t => concat(
        lit(TurnOpen), t.getField("role"), lit("\n"),
        t.getField("content"), lit(TurnClose))), "")
    // fold: carry (offset, masks); per turn, the content starts at
    // offset + len(open) + len(role) + 1
    val masks = aggregate(
      turns,
      struct(lit(0L).as("off"),
        array().cast("array<struct<start:bigint,end:bigint>>").as("ms")),
      (acc, t) => {
        val off = acc.getField("off")
        val role = t.getField("role")
        val content = t.getField("content")
        val cStart = off + lit(TurnOpen.length.toLong) +
          length(role).cast("long") + 1L
        val cEnd = cStart + length(content).cast("long")
        struct(
          (off + turnLen(role, content).cast("long")).as("off"),
          when(role === maskRole,
            concat(acc.getField("ms"),
              array(struct(cStart.as("start"), cEnd.as("end")))))
            .otherwise(acc.getField("ms")).as("ms"))
      },
      acc => acc.getField("ms"))
    df.withColumn("text", when(anyNullField, lit(null)).otherwise(rendered))
      .withColumn("masks",
        when(col("text").isNull,
          lit(null).cast("array<struct<start:bigint,end:bigint>>"))
          .otherwise(masks))
      .withColumn("masked_chars",
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(coalesce(aggregate(col("masks"), lit(0L),
            (a, m) => a + m.getField("end") - m.getField("start")), lit(0L))))
  }

  /** Canonical string form of the mask ranges (`s:e;s:e`) — the
    * cross-engine-comparable projection of `masks` used by gates. */
  def maskSpec(masks: Column): Column =
    array_join(transform(masks, m =>
      concat(m.getField("start").cast("string"), lit(":"),
        m.getField("end").cast("string"))), ";")
}
