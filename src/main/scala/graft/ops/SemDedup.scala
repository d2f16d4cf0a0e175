package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecExpressions

/** SemDeDup — semantic deduplication over an embedding column (Abbas
  * et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540): cluster the embeddings
  * with a coarse k-means quantizer, compute exact pairwise cosine
  * WITHIN each cluster, call any pair ≥ threshold a semantic
  * duplicate, and keep one document per duplicate group.
  *
  * This is the embedding-level complement of the text families in
  * [[DedupOps]]: MinHash/SimHash catch re-crawls and boilerplate
  * edits of the SAME text; SemDeDup catches semantically identical
  * content with different surface forms (re-captioned images,
  * paraphrased articles) that no lexical sketch can see. The
  * reference pipeline dedups at the file/URL level only (skip-if-
  * exists, src/modules/sites/portal_saude_mg.py:453); this is the
  * content-level operator its image+caption corpus needs at training
  * scale.
  *
  * Scale shape — the paper's own cost model, realized in one shuffle:
  *   assign cell (broadcast centroids, map-side)
  *   → self-join keyed on the cell id ONLY (one hash shuffle of
  *     (id, vec, norm); within-cell pairing is quadratic in the CELL
  *     size n/nlist, never in the corpus)
  *   → exact cosine on the codegen kernel ([[VecExpressions.vec_dot]]),
  *     norms computed once per ROW before the join.
  * `nlist` is the knob that bounds the quadratic term: the paper runs
  * 50k clusters at LAION scale; size it so n/nlist pairs fit a task
  * (AQE skew-join splits a straggler cell's pair block if the
  * quantizer lands one). Cross-CLUSTER near-dups are invisible by
  * design — that is SemDeDup's published semantics, not an
  * approximation defect of this implementation; exact duplicates are
  * always caught (identical vectors get identical cell assignments
  * under the deterministic quantizer, any centroid outcome).
  */
object SemDedup {

  /** Within-cluster semantic near-dup pairs
    * `(id_a, id_b, cl, cosine)` with `id_a < id_b` and
    * cosine ≥ threshold (rounded to 6 dp — bit-stable across engines,
    * see AnnOps scoring). The quantizer is the shared deterministic
    * spherical k-means ([[AnnOps.trainCentroids]]), so the pair set is
    * reproducible across runs and cluster sizes. */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16,
      iters: Int = 2): DataFrame = {
    val cands = df.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    semanticPairsFrozen(cands,
      AnnOps.trainCentroids(cands, nlist, iters), threshold)
  }

  /** [[semanticPairs]] against an ALREADY-TRAINED quantizer — the
    * shared core for the per-call form above and the persisted-index
    * incremental probe ([[AnnIndex.probePairs]], which must reproduce
    * this exactly on the frozen centroids for its parity oracle).
    * `cands` carries (cid, cv). */
  private[graft] def semanticPairsFrozen(cands: DataFrame,
      centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    // norms once per row map-side; the per-pair verify below is then a
    // single native codegen dot product
    val cells = cands
      .withColumn("cl", AnnOps.assignCell(cands, "cv", centroids))
      .withColumn("nrm", VecExpressions.vec_norm($"cv"))
    val l = cells.select($"cid".as("id_a"), $"cv".as("va"),
      $"nrm".as("na"), $"cl")
    val r = cells.select($"cid".as("id_b"), $"cv".as("vb"),
      $"nrm".as("nb"), $"cl")
    // no global orderBy (see DedupOps.exactVerifyPairs) — determinism
    // of SET content is what the oracle checks; ordering is callers'
    l.join(r, Seq("cl")).filter($"id_a" < $"id_b")
      .withColumn("cosine",
        round(VecExpressions.vec_cosine($"va", $"vb", $"na", $"nb"), 6))
      .filter($"cosine" >= threshold)
      .select($"id_a", $"id_b", $"cl", $"cosine")
  }

  /** SemDeDup end to end: `docs` minus every semantic duplicate that
    * is not its group's keeper (lowest id — the library-wide keep-first
    * convention, via [[DedupOps.dedupSurvivors]]'s connected-components
    * resolution, so A~B and B~C keep exactly one of the three even
    * when A~C itself is below threshold). `docs` and `embeddings` may
    * be the same frame or joined sides keyed by `idCol`. */
  def semanticDedup(docs: DataFrame, idCol: String,
      embeddings: DataFrame, embIdCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16,
      iters: Int = 2): DataFrame = {
    val pairs = semanticPairs(embeddings, embIdCol, vecCol,
      threshold, nlist, iters)
    DedupOps.dedupSurvivors(docs, idCol, pairs)
  }
}
