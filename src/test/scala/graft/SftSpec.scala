package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sft
import org.apache.spark.sql.functions._

/** ChatML rendering + loss masks: hand-computed offsets, multi-turn
  * masks, role filtering, degenerate inputs. */
class SftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def conv(turns: Seq[(String, String)]) =
    Seq((1L, turns)).toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"), t =>
        struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))

  test("hand-computed render: text layout and mask offsets") {
    val df = Sft.render(conv(Seq(
      ("system", "be brief"), ("user", "hi"), ("assistant", "hello"))))
    val row = df.select("text", "masked_chars").as[(String, Long)].head()
    assert(row._1 ==
      "<|im_start|>system\nbe brief<|im_end|>\n" +
      "<|im_start|>user\nhi<|im_end|>\n" +
      "<|im_start|>assistant\nhello<|im_end|>\n")
    assert(row._2 == 5L)
    val spec = df.select(Sft.maskSpec(col("masks"))).as[String].head()
    // turn lens: sys 24+6+8=38, user 24+4+2=30; assistant content
    // starts at 38+30+12+9+1 = 90, ends 95
    assert(spec == "90:95")
    // the mask really covers the assistant content in the text
    assert(row._1.substring(90, 95) == "hello")
  }

  test("multiple assistant turns produce multiple ranges, in order") {
    val df = Sft.render(conv(Seq(
      ("user", "q1"), ("assistant", "a1"), ("user", "q2"),
      ("assistant", "answer2"))))
    val (text, spec, n) = df.select(col("text"),
      Sft.maskSpec(col("masks")), col("masked_chars"))
      .as[(String, String, Long)].head()
    assert(n == 9L)
    val ranges = spec.split(";").map { r =>
      val Array(s, e) = r.split(":"); (s.toInt, e.toInt)
    }
    assert(ranges.length == 2)
    assert(text.substring(ranges(0)._1, ranges(0)._2) == "a1")
    assert(text.substring(ranges(1)._1, ranges(1)._2) == "answer2")
  }

  test("no assistant turns -> empty mask; empty assistant content -> empty range") {
    val none = Sft.render(conv(Seq(("system", "s"), ("user", "u"))))
    assert(none.select(Sft.maskSpec(col("masks"))).as[String].head() == "")
    assert(none.select("masked_chars").as[Long].head() == 0L)
    val empty = Sft.render(conv(Seq(("user", "u"), ("assistant", ""))))
    val (spec, n) = empty.select(Sft.maskSpec(col("masks")),
      col("masked_chars")).as[(String, Long)].head()
    val Array(s, e) = spec.split(":").map(_.toInt)
    assert(s == e && n == 0L)
  }

  test("custom maskRole trains on the other side") {
    val df = Sft.render(conv(Seq(
      ("user", "query"), ("assistant", "resp"))), maskRole = "user")
    val (text, spec) = df.select(col("text"), Sft.maskSpec(col("masks")))
      .as[(String, String)].head()
    val Array(s, e) = spec.split(":").map(_.toInt)
    assert(text.substring(s, e) == "query")
  }

  test("a NULL role or content in ANY turn nulls the whole render — no unmasked assistant text") {
    val df = Sft.render(spark.sql(
      """SELECT 1L AS conv_id, array(
           named_struct('role', 'user', 'content', CAST(NULL AS STRING)),
           named_struct('role', 'assistant', 'content', 'hi')) AS turns"""))
    val row = df.select("text", "masks", "masked_chars").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("NULL turns render NULL, never a fabricated empty conversation") {
    val df = Sft.render(spark.sql(
      """SELECT 1L AS conv_id,
         CAST(NULL AS array<struct<role:string,content:string>>) AS turns"""))
    val row = df.select("text").collect().head
    assert(row.isNullAt(0))
  }
}
