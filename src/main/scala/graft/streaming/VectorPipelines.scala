package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of ANN index maintenance: route ARRIVING vectors onto
  * the trained coarse quantizer micro-batch by micro-batch — the
  * continuous form of q120's batch `assignToCells`. Arrivals land in a
  * cid-partitioned table, i.e. directly into the per-cell posting-list
  * layout the IVF serving path (`ivfProbedKnn`/`ivfAdcKnn`) prunes on:
  * a freshly-routed vector is searchable the moment its batch commits,
  * with no index rebuild.
  *
  * Built entirely on [[EventPipelines.ingestAvailableNow]]'s landing
  * machinery, so every guarantee carries over verbatim: within-batch +
  * against-table dedup on the id (the one-row-per-id cell contract the
  * searchers require), per-partition atomic swaps touching only cells
  * the batch routed into (O(batch), never O(index)), and the
  * checkpoint-namespaced batch ledger for exactly-once replay.
  */
object VectorPipelines {

  /** Drain all available arrivals, routing each micro-batch with a
    * k-row centroid broadcast. `cents` must be the TRAINED quantizer
    * (`Similarity.trainedIndex`'s first element) — routing never
    * retrains. Zero-norm vectors have no cosine and are dropped, as in
    * the batch operator.
    */
  def routeAvailableNow(arrivals: DataFrame, cents: DataFrame,
                        idCol: String, vecCol: String,
                        wh: graft.sources.Warehouse,
                        layer: String, table: String,
                        checkpointDir: Option[String] = None): Unit =
    EventPipelines.ingestAvailableNow(
      arrivals, wh, layer, table,
      keys = Seq(idCol), partCol = "cid", checkpointDir = checkpointDir,
      prep = Some(b => Similarity.assignToCells(b, idCol, vecCol, cents)
        .select(col(idCol), col("cid"), col("cos"))))
}
