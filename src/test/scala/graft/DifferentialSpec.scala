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

  test("quantizeInt8 == plain-Scala reference (float-rounded scale, HALF_UP, clamp)") {
    val vecs = (0 until 50).map { i =>
      // include a zero vector and outlier-heavy vectors
      val v = if (i == 0) Array.fill(8)(0.0)
              else Array.fill(8)(rnd.nextDouble() * 20 - 10)
      (i.toLong, v)
    }
    val got = vecs.toDF("id", "v")
      .select(col("id"), VectorFunctions.quantizeInt8(col("v")).as("qv"))
      .select(col("id"), col("qv.scale"), col("qv.q"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getFloat(1), r.getSeq[Byte](2).toSeq)))
      .toMap
    vecs.foreach { case (id, v) =>
      val scaleF = (v.map(math.abs).max / 127.0).toFloat
      val scaleD = scaleF.toDouble
      val codes: Seq[Byte] =
        if (scaleD == 0.0) v.map(_ => 0.toByte).toSeq
        else v.map { x =>
          val r = BigDecimal(x / scaleD)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
          math.max(-127.0, math.min(127.0, r)).toInt.toByte
        }.toSeq
      assert(got(id)._1 == scaleF, s"vec $id scale")
      assert(got(id)._2 == codes, s"vec $id codes")
    }
  }

  test("minhash signatures == driver-side min over per-shingle hashes") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val k = 8
    val got = graft.operators.Sketches
      .minhashSignatures(df, "doc_id", "text", n = 3, k = k)
      .collect()
      .map(r => r.getLong(0) -> (0 until k).map(s => r.getLong(1 + s)))
      .toMap
    // reference: per-shingle hashes computed via the same Spark hash
    // COLUMN (isolating the aggregation/pipeline logic), min'd on the
    // driver per seed
    val perShingle = df
      .select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("tok"))
      .select(col("doc_id") +:
        (0 until k).map(s => xxhash64(lit(s), col("tok")).as(s"h$s")): _*)
      .collect()
    val want = perShingle.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> (0 until k).map(s => rows.map(_.getLong(1 + s)).min)
    }
    assert(got == want)
  }

  test("simhash sketch == driver-side sign-sum over per-token hashes") {
    val vocab = Vector("one", "two", "three", "four")
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Sketches.simhashSketch(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duplicates COUNT (bag semantics): tokens, not distinct shingles
    val perToken = df
      .select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = perToken.groupBy(_._1).map { case (id, rows) =>
      id -> (0 until 64).map { b =>
        val s = rows.map(r => if (((r._2 >> b) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << b else 0L
      }.sum
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
