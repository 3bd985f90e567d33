package graft.operators

import org.apache.spark.sql.SparkSession

/** Named builders for every shared model/index cache in the library
  * (the [[QueryCaches]] registry: LSH pairs, shingle tables, the IVF /
  * PQ / SQ8 similarity models, the BPE merge table, the
  * source-attribution classifier).
  *
  * Purpose: benchmark attribution. Each cache is trained once per
  * (session, corpus) and — without this — its full training cost lands
  * on whichever TIMED query happens to touch it first. Round 9's
  * pinned sorted execution order silently moved that "first toucher"
  * role for three caches (q160 picked up BPE training from q163, q104
  * picked up PQ training, q207 the classifier), which read as >2×
  * regressions with no algorithmic change. Running these as named,
  * separately-timed `warm_*` steps before the timed pass makes every
  * per-query number a serving-path number, and the training cost a
  * first-class line of its own in the bench ledger (still part of the
  * headline total — it is real work).
  *
  * Order matters only where one model feeds another: the residual-PQ
  * trainer reuses the IVF index, so `warm_ivf_index` precedes
  * `warm_resid_pq` and each step's time is its own cost.
  */
object ModelWarm {
  val steps: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "warm_shingles" -> ((s, d) => { DedupQueries.shingles(s, d); () }),
    "warm_lsh_pairs" -> ((s, d) => { DedupQueries.nearDupPairs(s, d); () }),
    "warm_contain_cands" -> ((s, d) => { DedupQueries.containCands(s, d); () }),
    "warm_bpe_merges" -> ((s, d) => { TextQueries.trainedMergeTable(s, d); () }),
    "warm_classifier" -> ((s, d) => {
      TextQueries.classifierScores(s, d)
      TextQueries.classifierPredictions(s, d); ()
    }),
    "warm_exact_knn" -> ((s, d) => { SimilarityQueries.exactKnn(s, d); () }),
    "warm_ivf_index" -> ((s, d) => { SimilarityQueries.ivfIndex(s, d); () }),
    "warm_sq8_stats" -> ((s, d) => { SimilarityQueries.sq8StatsCached(s, d); () }),
    "warm_pq_model" -> ((s, d) => { SimilarityQueries.pqModel(s, d); () }),
    "warm_resid_pq" -> ((s, d) => { SimilarityQueries.residModel(s, d); () })
  )
}
