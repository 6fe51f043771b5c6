package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurrentState, TextOps}
import graft.functions.VectorFunctions

/** Randomized differential tests: each operator against an
  * independent in-JVM reference implementation over seeded random
  * inputs (one Spark job per property — all cases ride in one
  * DataFrame).
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("shingles == naive sliding window on random token lists") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(8) // includes docs shorter than the shingle
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select(col("id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(got(id) == want, s"doc $id: '$text'")
    }
  }

  test("DotProduct == plain-Scala fold on random vectors") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextDouble() * 2 - 1),
        Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val got = vecs.toDF("id", "a", "b")
      .select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, a, b) =>
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      assert(got(id) == want, s"vec $id") // identical fold order -> bitwise equal
    }
  }

  test("CurrentState.latest == sort-based reference on random event sets") {
    val events = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, s"t${rnd.nextInt(4)}")
    }
    val df = events.toDF("event_id", "user_id", "ts", "event_type")
    val got = CurrentState.latest(df, "user_id", Seq("ts", "event_id"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    val want = events.groupBy(_._2).map { case (uid, evs) =>
      uid -> evs.maxBy(e => (e._3, e._1))._1
    }
    assert(got == want)
  }

  test("splitAssign depends only on content (random ids, dup contents)") {
    val contents = Vector.fill(10)(rnd.alphanumeric.take(20).mkString)
    val rows = (0 until 100).map(i => (rnd.nextLong(), contents(i % 10)))
    val got = rows.toDF("id", "text")
      .withColumn("split", graft.operators.PipelineOps.splitAssign("text"))
      .select("text", "split").distinct()
    // 10 distinct contents -> exactly 10 (content, split) pairs
    assert(got.count() == 10)
  }
}
