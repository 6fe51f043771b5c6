package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Skew, TextOps}

/** LINEAR ground truth for the n-gram pair-dedup family at scale
  * (r11, VERDICT r10 #1 — the one family whose 100× validation was
  * blocked on quadratic DuckDB oracles).
  *
  * `tools/scale_up.py --plant-text-dups` appends token-mutated
  * near-copies at doc_id = orig + [[Off]] (two tiers — see the tool
  * header), so the exact pair Jaccard / shared-shingle counts are
  * recomputable per PLANTED pair via the id-mapped join: O(corpus)
  * for the shingle/df passes plus O(plants · doc_len) for the pair
  * legs, on BOTH engines — where the flat pack's exact pair set is a
  * quadratic explode at 500k docs. Same ANN-benchmark methodology as
  * `dedup_embedding_lsh_planted_check`. On unplanted corpora every
  * truth set is EMPTY and the verdict rows show the trivial regime
  * honestly (exact_pairs = 0, recall vacuously ok) — the contracts
  * bind on the planted packs.
  *
  * Truth shingles are the STRING n-grams (the oracle's form); the
  * operators hash them first (xxhash64) — the established 2^-64
  * collision stance.
  */
private[queries] object Planted {

  /** Planted-dup id offset — STRIDE/2, inside the replica key block
    * (the embeddings DUP_OFF convention). */
  val Off = 500000000L

  /** Exact capped-shingle Jaccard over the id-mapped planted pairs:
    * (i, j = i + Off) for pairs whose capped Jaccard ≥ `tau`, under
    * EXACTLY [[graft.operators.Dedup.jaccardPairs]]'s math — distinct
    * n-gram shingles of the normalized tokens, two-sided df cap
    * (dropped from the index AND the set sizes), inner joins on sizes
    * (a doc with no surviving shingles can't pair). */
  def ngramTruth(docs: DataFrame, n: Int, tau: Double,
                 dfCap: Long): DataFrame = {
    val sh = TextOps.withTokens(
        docs.filter(col("text").isNotNull), "text", Seq(col("doc_id")))
      .select(col("doc_id"),
        explode(TextOps.shingles(col("graft_toks"), n)).as("tok"))
    val capped = Skew.capHotKeys(sh, dfCap, Seq("tok"))
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = capped.as("a").join(capped.as("b"),
        col("b.doc_id") === col("a.doc_id") + lit(Off) &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("a.doc_id").as("i")).agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("sz_i") + col("sz_j") - col("inter"))
    inter
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("sz_i")), "i")
      .join(sizes.select((col("doc_id") - lit(Off)).as("i"),
        col("sz").as("sz_j")), "i")
      .filter(jac >= tau)
      .select(col("i"), (col("i") + lit(Off)).as("j"))
  }

  /** [[ngramTruth]]'s asymmetric twin: exact CONTAINMENT
    * |A∩B| / min(|A|,|B|) ≥ tau over the id-mapped planted pairs —
    * the linear ground truth for [[graft.operators.Dedup
    * .containmentPairs]]' 100× recall check. Same capped shingle
    * universe on both sides. */
  def ngramContainTruth(docs: DataFrame, n: Int, tau: Double,
                        dfCap: Long): DataFrame = {
    val sh = TextOps.withTokens(
        docs.filter(col("text").isNotNull), "text", Seq(col("doc_id")))
      .select(col("doc_id"),
        explode(TextOps.shingles(col("graft_toks"), n)).as("tok"))
    val capped = Skew.capHotKeys(sh, dfCap, Seq("tok"))
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = capped.as("a").join(capped.as("b"),
        col("b.doc_id") === col("a.doc_id") + lit(Off) &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("a.doc_id").as("i")).agg(count(lit(1)).as("inter"))
    val cont = col("inter").cast("double") / least(col("sz_i"), col("sz_j"))
    inter
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("sz_i")), "i")
      .join(sizes.select((col("doc_id") - lit(Off)).as("i"),
        col("sz").as("sz_j")), "i")
      .filter(cont >= tau)
      .select(col("i"), (col("i") + lit(Off)).as("j"))
  }

  /** Known-contaminated PLANTED train docs: j = i + Off where the
    * original i sits in the eval slice and the pair shares ≥
    * `minShared` distinct n-gram shingles THAT THE OPERATOR KEEPS
    * (present on both sides of the eval/train divide, df ≤ dfCap) —
    * [[graft.operators.PipelineOps.decontaminate]]'s exact token
    * filter. Shared-with-the-original lower-bounds shared-with-the-
    * whole-eval-slice, so every truth doc MUST be flagged (recall 1
    * for the exact operator). Returns (doc_id) of the planted docs. */
  def contaminationTruth(docs: DataFrame, isEval: Column, n: Int,
                         minShared: Long, dfCap: Long): DataFrame = {
    val sh = TextOps.withTokens(
        docs.filter(col("text").isNotNull), "text",
        Seq(col("doc_id"), isEval.as("is_eval")))
      .select(col("doc_id"), col("is_eval"),
        explode(TextOps.shingles(col("graft_toks"), n)).as("tok"))
    val kept = sh.groupBy("tok").agg(
        count(when(col("is_eval"), lit(1))).as("n_eval"),
        count(when(!col("is_eval"), lit(1))).as("n_train"))
      .filter(col("n_eval") > 0 && col("n_train") > 0 &&
        (col("n_eval") + col("n_train")) <= dfCap)
      .select("tok")
    val keptSh = sh.join(kept, Seq("tok"), "left_semi")
    keptSh.as("a").filter(col("a.is_eval"))
      .join(keptSh.as("b").filter(!col("b.is_eval")),
        col("b.doc_id") === col("a.doc_id") + lit(Off) &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("doc_id")
  }

  /** One-row recall verdict (the SketchQueries checkRow family):
    * (exact_pairs, recall_ok) where recall = |got ∩ exact| / |exact|.
    * Vacuously true on an empty truth set. */
  def recallRow(got: DataFrame, exact: DataFrame,
                minRecall: Double): DataFrame =
    got.select("i", "j").join(exact.select("i", "j"), Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(exact.agg(count(lit(1)).as("exact_pairs")))
      .select(col("exact_pairs"),
        (col("hits").cast("double") >= col("exact_pairs") * lit(minRecall))
          .as("recall_ok"))

  /** The id-mapped planted pairs of ONE plant tier (`i % 50 = sel`) —
    * the tier selectors are part of the pack contract (scale_up.py
    * header): 17 = heavy mutation, 23 = light/single-token. `i` is
    * additionally restricted to NON-plant ids (id mod the 1e9 replica
    * stride below Off): a plant's own id + Off lands on the NEXT
    * replica's copy of its base doc — a real row that is not a
    * near-dup (replica word tags make cross-replica Jaccard ~0). */
  def tierPairs(docs: DataFrame, sel: Int): DataFrame =
    docs.select(col("doc_id").as("i"))
      .filter(pmod(col("i"), lit(50L)) === sel &&
        pmod(col("i"), lit(1000000000L)) < lit(Off))
      .join(docs.select((col("doc_id") - lit(Off)).as("i")),
        Seq("i"), "left_semi")
      .select(col("i"), (col("i") + lit(Off)).as("j"))
}
