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

  /** Pure-JVM replica of Spark's `xxhash64(...)` column semantics
    * (seed 42, each argument's hash chaining into the next seed;
    * integers hash via hashInt, strings via their UTF-8 bytes) — so
    * the sketch references below share NO Spark expression with the
    * implementation under test. */
  private def jvmXxhash64(parts: Seq[Either[Int, String]],
                          seed: Long = 42L): Long =
    parts.foldLeft(seed) {
      case (s, Left(i)) =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, s)
      case (s, Right(str)) =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(str), s)
    }

  private def naiveTokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("minhash signatures == fully independent JVM reference (tokens+hash+min)") {
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
    val want = docs.map { case (id, text) =>
      val shingles = naiveTokens(text).sliding(3).map(_.mkString(" "))
        .toSeq.distinct
      id -> (0 until k).map(s =>
        shingles.map(sh => jvmXxhash64(Seq(Left(s), Right(sh)))).min)
    }.toMap
    assert(got == want)
  }

  test("simhash sketch == fully independent JVM reference (bag-of-token sign-sum)") {
    val vocab = Vector("one", "two", "three", "four")
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Sketches.simhashSketch(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duplicates COUNT (bag semantics): tokens, not distinct shingles
    val want = docs.map { case (id, text) =>
      val hashes = naiveTokens(text).map(t => jvmXxhash64(Seq(Right(t))))
      id -> (0 until 64).map { b =>
        val s = hashes.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << b else 0L
      }.sum
    }.toMap
    assert(got == want)
  }

  test("NearestCentroids == plain-Scala ranking on random vectors/centroids") {
    val dim = 8
    val k = 37 // deliberately not a power of two, > nprobe
    val nprobe = 5
    val centroids = Array.fill(k, dim)(rnd.nextDouble() * 2 - 1)
    // include a zero vector and a duplicate centroid to hit the
    // -inf ranking and the tie rule (higher id first)
    centroids(7) = centroids(3).clone()
    val vecs = (0 until 50).map { i =>
      val v = if (i == 0) Array.fill(dim)(0.0)
              else Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      (i.toLong, v)
    }
    val got = vecs.toDF("id", "v")
      .select(col("id"), graft.operators.Similarity
        .nearestCentroid(col("v"), centroids, nprobe).as("cids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      val vn = math.sqrt(v.map(x => x * x).sum)
      val want = centroids.indices.map { c =>
        val cn = math.sqrt(centroids(c).map(x => x * x).sum)
        val dot = v.zip(centroids(c)).map { case (a, b) => a * b }.sum
        val s = if (vn * cn == 0.0) Double.NegativeInfinity else dot / (vn * cn)
        (s, c.toLong)
      }.sortBy { case (s, c) => (-s, -c) }.take(nprobe).map(_._2)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("PqEncode/PqDecode == plain-Scala PQ on random vectors (binary and array layouts bit-for-bit)") {
    val nSub = 4
    val w = 3 // dim 12
    val kcode = 5
    val cbs = Array.fill(nSub, kcode, w)(rnd.nextDouble() * 2 - 1)
    // duplicate codeword to hit the tie rule (first/smallest code wins)
    cbs(1)(3) = cbs(1)(1).clone()
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(nSub * w)(rnd.nextDouble() * 2 - 1)))
    // both layouts in one projection: packed BinaryType (the E10
    // production path since r13 — VERDICT r12 #5) and the legacy
    // array<int>, each decoded through its own type dispatch
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        graft.operators.Similarity.pqEncode(col("v"), cbs).as("codes"),
        graft.operators.Similarity.pqEncode(col("v"), cbs,
          packed = false).as("codes_arr"),
        graft.operators.Similarity.pqDecode(
          graft.operators.Similarity.pqEncode(col("v"), cbs), cbs).as("recon"),
        graft.operators.Similarity.pqDecode(
          graft.operators.Similarity.pqEncode(col("v"), cbs, packed = false),
          cbs).as("recon_arr"))
      .collect()
      .map(r => r.getLong(0) -> (
        r.getAs[Array[Byte]](1).map(_ & 0xFF).toSeq,
        r.getSeq[Int](2),
        r.getSeq[Double](3), r.getSeq[Double](4))).toMap
    vecs.foreach { case (id, v) =>
      val wantCodes = (0 until nSub).map { s =>
        cbs(s).indices.minBy { c =>
          val d = (0 until w).map(j => v(s * w + j) - cbs(s)(c)(j))
            .map(x => x * x).sum
          (d, c) // strict <: first minimal code wins (the tie rule)
        }
      }
      val wantRecon = wantCodes.zipWithIndex.flatMap { case (c, s) => cbs(s)(c) }
      val (codesBin, codesArr, recon, reconArr) = got(id)
      assert(codesBin == wantCodes, s"binary codes for vec $id")
      assert(codesArr == wantCodes, s"array codes for vec $id")
      assert(recon == wantRecon, s"recon for vec $id")
      assert(reconArr == recon, s"binary/array recon diverge for vec $id")
    }
    // ADC identity: dot(q, decode(codes)) == sum of subspace dots
    val q = Array.fill(nSub * w)(rnd.nextDouble())
    val (_, (codes0, _, recon0, _)) = (vecs.head._1, got(vecs.head._1))
    val adc = q.zip(recon0).map { case (a, b) => a * b }.sum
    val bySub = (0 until nSub).map { s =>
      (0 until w).map(j => q(s * w + j) * cbs(s)(codes0(s))(j)).sum
    }.sum
    assert(math.abs(adc - bySub) < 1e-12)
  }

  test("PqAdcDot/PqReconNorm == the decode-then-score path (fused ADC, r13)") {
    val nSub = 4
    val w = 3
    val kcode = 7
    val cbs = Array.fill(nSub, kcode, w)(rnd.nextDouble() * 2 - 1)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.fill(nSub * w)(rnd.nextDouble() * 2 - 1)))
    val S = graft.operators.Similarity
    val enc = S.pqEncode(col("v"), cbs)
    // query = a distinct affine image of v (not v itself) so the dot
    // exercises genuinely different q/corpus sides
    val df = vecs.toDF("id", "v")
      .withColumn("q", expr("transform(v, x -> x * 0.7 + 0.1)"))
    val got = df.select(col("id"),
        S.pqAdcDot(col("q"), enc, cbs).as("fused_dot"),
        graft.functions.VectorFunctions.dot(col("q"),
          S.pqDecode(enc, cbs)).as("decode_dot"),
        S.pqReconNorm(enc, cbs).as("fused_nrm"),
        graft.functions.VectorFunctions.l2(
          S.pqDecode(enc, cbs)).as("decode_nrm"))
      .collect()
    got.foreach { r =>
      // dot: identical summation order → bit-equal
      assert(r.getDouble(1) == r.getDouble(2),
        s"fused ADC dot diverges for id ${r.getLong(0)}")
      // norm: per-subspace partial sums vs flat pass → ulp-equal only
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-12,
        s"fused recon norm diverges for id ${r.getLong(0)}")
    }
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
