package graft.operators

import graft.QueryPack
import graft.operators.Curation._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation query surface: PII redaction, passage-level corpus
  * dedup, deterministic stratified sampling, within-document repetition
  * scoring (Gopher-style quality rule), and Z-order clustering keys.
  * These are the passes a training-data pipeline runs between raw
  * ingest and tokenization; each is a scan-speed map or a single
  * partial-aggregated shuffle, so the plans hold at 100 TB.
  */
object CurationQueries extends QueryPack {

  // q164: tokens per packed training sequence
  private val PACK_BUDGET = 512
  // q170: chunk window / stride (tokens)
  private val CHUNK_N = 10
  private val CHUNK_S = 5

  val queries: Map[String, Q] = Map(
    // PII redaction: regex scrub of emails and phone numbers + match
    // counts for the removal audit log. Pure per-row projection — at
    // 100 TB this is a scan-speed pass with no shuffle at all. The raw
    // corpus has no PII, so the query appends synthetic PII
    // deterministically from doc_id (email on every 3rd doc, phone on
    // every 2nd); the derivation lives in the query so the oracle
    // reproduces it exactly.
    "q87_pii_redact" -> ((s, d) => {
      val raw = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d).select(col("doc_id"), raw.as("raw"))
        .select(
          col("doc_id"),
          emailCount(col("raw")).as("n_emails"),
          phoneCount(col("raw")).as("n_phones"),
          redactPii(col("raw")).as("clean"))
    }),

    // Passage-level corpus dedup (Curation.firstOccurrenceChunks —
    // see its doc for the shape and scale notes).
    "q88_chunk_dedup" -> ((s, d) =>
      firstOccurrenceChunks(Tables.documents(s, d), "text", "doc_id", 10)),

    // Deterministic stratified sampling: per-source keep rates (75% for
    // even source ids, 25% for odd) applied via an md5-derived uniform —
    // reproducible across runs, engines, and cluster sizes, unlike
    // rand()/TABLESAMPLE. The mixing pass every multi-source training
    // corpus runs; scan-speed, no shuffle, and re-runnable to the byte.
    "q89_stratified_sample" -> ((s, d) => {
      val srcNum = substring(col("source"), 4, 8).cast("int")
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("source"),
          hashU16(col("doc_id"), "seed42-").as("u16"),
          when(srcNum % 2 === 0, 49152).otherwise(16384).as("cut"))
        .where(col("u16") < col("cut"))
    }),

    // Within-document repetition (the Gopher "top n-gram share" quality
    // rule): the most frequent word bigram's share of all bigrams,
    // flagged when it exceeds 10%. Non-distinct bigrams by construction
    // (frequency is the point — shinglesOfTokens dedups, so it doesn't
    // apply). Share is floor-quantized to 1e-6 before the compare so the
    // flag can't straddle engines on a representation edge. Per-doc
    // group-by with map-side partials — scan-bound at corpus scale.
    "q90_repetition" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val grams = toks.select(
        col("doc_id"),
        explode(
          when(size(col("ts")) >= 2,
            transform(sequence(lit(1), size(col("ts")) - 1),
              i => concat(element_at(col("ts"), i), lit(" "), element_at(col("ts"), i + 1))))
            .otherwise(array().cast("array<string>"))).as("gram"))
      val perGram = grams.groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("c"))
      perGram.groupBy(col("doc_id"))
        .agg(
          sum(col("c")).as("n_grams"),
          max(col("c")).as("top_gram_count"),
          floor(max(col("c")).cast("double") / sum(col("c")).cast("double") * 1e6)
            .cast("long").as("top_share_q6"))
        .withColumn("is_repetitive", col("top_share_q6") > 100000L)
    }),

    // Z-order clustering key over two event dimensions + per-cell
    // profile. Writing the table sorted by this key gives every file a
    // tight bounding box in BOTH user and value, so min/max stats prune
    // 2-D predicates — the data-layout half of scan performance at
    // 100 TB (CurationSpec asserts the bounding-box property).
    "q91_zorder" -> ((s, d) => {
      val pts = Tables.events(s, d).select(
        col("event_id"),
        (col("user_id") % 256).cast("int").as("x"),
        (floor(col("value")).cast("int") % 256).as("y"))
      pts.select(col("event_id"), zValue(col("x"), col("y"), 8).as("z"))
        .groupBy(shiftright(col("z"), 6).cast("int").as("z_cell"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("z")).as("z_min"),
          max(col("z")).as("z_max"),
          sum(col("event_id")).as("sum_event_id"))
    }),

    // 3-D Z-order over the layout key a training corpus actually
    // partitions by — (source, length, token count) — interleaved into
    // one 24-bit key. Files written sorted by this key carry tight
    // min/max stats on ALL THREE columns, so predicates on any
    // combination prune; the cell profile (top 4 bits per dimension)
    // is the audit of that layout. Same scan-speed shape as q91.
    "q125_zorder3d" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        (substring(col("source"), 4, 8).cast("int") % 256).as("src"),
        (col("n_chars") % 256).cast("int").as("len"),
        (size(split(col("text"), " ")) % 256).cast("int").as("tok"))
      docs.select(col("doc_id"),
          zValueN(Seq(col("src"), col("len"), col("tok")), 8).as("z"))
        .groupBy(shiftright(col("z"), 12).cast("int").as("z_cell"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("z")).as("z_min"),
          max(col("z")).as("z_max"),
          sum(col("doc_id")).as("sum_doc_id"))
    }),

    // Temperature-weighted source mixing (α = 1/2, the XLM-R/mT5
    // multilingual sampling recipe): per-source quotas ∝ sqrt(n_docs)
    // over a half-corpus budget, derived in pure integer arithmetic
    // (Curation.temperatureQuotas), applied as a stateless md5-uniform
    // threshold filter (temperatureMix — no window, no per-source
    // rank, scan-speed at 100 TB). Output is the mixing audit: the
    // derivation (n_docs → quota → rate_u16) plus what the filter
    // actually kept (count + id-sum pins the selected SET, not just
    // its size).
    "q127_source_mixing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val quotas = temperatureQuotas(docs, "source")
      val sel = temperatureMix(docs, "source", "doc_id", MixSalt)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"),
          sum(col("doc_id")).as("sum_selected_ids"))
      quotas.join(sel, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("quota"), col("rate_u16"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("sum_selected_ids"), lit(0L)).as("sum_selected_ids"))
    }),

    // JSONL EXPORT roundtrip — the sink format trainers actually read:
    // documents are hash-sharded (deterministic u16 mod 8, the shard
    // count a deployment sizes to its loader parallelism), written as
    // partitioned JSON lines, then READ BACK and aggregated per shard;
    // the oracle computes the same aggregates from the raw table, so
    // a green hash proves the export is complete and lossless (the
    // q113 CSV-roundtrip pattern pointed at the training-data format).
    "q203_jsonl_roundtrip" -> ((s, d) => {
      val dir = graft.plans.EtlQueries.tmpWarehouse() + "/jsonl_export"
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
        .withColumn("shard", (hashU16(col("doc_id"), "jl") % 8).cast("int"))
        .write.mode("overwrite").partitionBy("shard").json(dir)
      s.read.json(dir)
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(length(col("text")).cast("long")).as("sum_chars"))
    }),

    // Deterministic QUALITY-WEIGHTED subsampling — priority sampling
    // in pure integers: each document draws priority
    // (q6+1)·65536 div (h+1) with h its salted hash-u16, so selection
    // probability rises with quality but every quality band keeps a
    // chance (soft filtering, the alternative to q94's hard gate);
    // the corpus-wide top 20% by (priority, id) is the sample.
    // Reproducible on any cluster layout (orderedRanks = range
    // partition + zipWithIndex, no global window), and the report
    // shows the mechanism working: mean selected quality > mean
    // overall quality per source.
    "q198_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        floor(graft.functions.TextFunctions.qualityScore(col("text"), TextQueries.EN)
          * 1e6).cast("long").as("q6"))
        .withColumn("h", hashU16(col("doc_id"), "ws").cast("long"))
        .withColumn("pri", expr("((q6 + 1) * 65536) div (h + 1)"))
      val ranked = Relational.orderedRanks(docs,
        Seq(col("pri").desc, col("doc_id")), "rk")
      val tot = docs.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("sel", col("rk") <= expr("n div 5"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_selected"),
          expr("sum(q6) div count(1)").as("mean_q6_all"),
          expr("sum(CASE WHEN sel THEN q6 END) div sum(CASE WHEN sel THEN 1 END)")
            .as("mean_q6_selected"))
    }),

    // Budget-constrained waterfill allocation — the C4/CCNet per-domain
    // balancing policy next to q127's temperature smoothing: small
    // sources keep everything, big crawls clip to one common integer
    // water level chosen so the total exactly fits a 50% budget.
    // Division-free feasibility test + one integer division for the
    // cap; windows only over the |sources|-row count relation.
    "q178_waterfill_mix" -> ((s, d) =>
      Curation.waterfillQuotas(Tables.documents(s, d), "source")),

    // Corpus-wide boilerplate removal (the C4 repeated-line rule):
    // drop EVERY copy of any 3-token chunk occurring ≥ 3 times in the
    // corpus — including the first, which is what separates this from
    // q88's first-occurrence keep (navigation chrome / license headers
    // are noise in all their copies). Frequency state shards by content
    // hash; see Curation.removeFrequentChunks for the shape.
    "q148_chunk_freq_dedup" -> ((s, d) =>
      removeFrequentChunks(Tables.documents(s, d), "text", "doc_id",
        n = 3, maxFreq = 2)),

    // Per-source document cap (the C4/CCNet per-domain cap): keep at
    // most 15 docs per source, chosen by the salted md5 uniform (a
    // deterministic random sample, not crawl order — crawl order
    // over-weights whatever the frontier hit first). One window
    // PARTITIONED by source — state shards per source; a skewed
    // mega-source is the known caveat and the sampled u16 order means
    // the cap could also be applied as a threshold filter like q127
    // when a source is too hot for one partition.
    "q149_source_cap" -> ((s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("u16"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          hashU16(col("doc_id"), CapSalt).as("u16"))
        .withColumn("rk", row_number().over(w).cast("int"))
        .where(col("rk") <= 15)
    }),

    // Deterministic MLM-style corruption (the BERT 15% masking pass,
    // reproducible to the byte): token (doc, pos) is masked iff the
    // salted md5 uniform of 'doc_id:pos' < 9830 (15% of 2^16). Pure
    // per-row projection — transform over the staged token array, ZERO
    // shuffle, scan-speed at 100 TB; same salt ⇒ same masks on every
    // run, engine, and cluster size (rand() gives none of that).
    "q150_mlm_mask" -> ((s, d) => {
      val masked = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), size(col("ts")).as("n_tokens"),
          transform(col("ts"), (t, i) =>
            when(hashU16(concat(col("doc_id").cast("string"), lit(":"),
              i.cast("string")), MaskSalt) < 9830, lit("<MASK>"))
              .otherwise(t)).as("mt"))
      masked.select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        size(filter(col("mt"), t => t === "<MASK>")).cast("long").as("n_masked"),
        concat_ws(" ", col("mt")).as("masked_text"))
    }),

    // Blocklist filtering (the C4 badword rule) as a per-source audit:
    // flag docs whose token set intersects the blocklist, report
    // count + id-sum (pins the flagged SET) + bps rate per source.
    // Membership against a literal array — scan-speed, no shuffle
    // before the per-source rollup; two of the three listed words are
    // absent from the corpus, proving absent-term handling.
    "q151_blocklist" -> ((s, d) => {
      val bad = array(Blocklist.map(lit): _*)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          arrays_overlap(split(col("text"), " "), bad).as("flagged"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
          coalesce(sum(when(col("flagged"), col("doc_id"))), lit(0L))
            .as("sum_flagged_ids"))
        .withColumn("flagged_bps",
          floor(lit(10000.0) * col("n_flagged") / col("n_docs")).cast("long"))
    }),

    // Stratified train/val split with EXACT per-stratum counts: q81's
    // hash-bucket split is only ~90/10 in expectation; evaluation sets
    // need exactly ceil(10%) of every stratum. Per-stratum ranks come
    // from ONE global orderedRanks pass sorted (stratum, md5-uniform,
    // id) minus each stratum's start ordinal (min rank per stratum — a
    // |strata|-row broadcast), so no stratum ever needs to fit in one
    // partition the way a per-group window would demand at 100 TB.
    // Deterministic: same split on every run, engine, cluster size.
    "q165_stratified_split" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      val ranked = Relational.orderedRanks(docs,
        Seq(col("lang"), col("h"), col("doc_id")), "grank")
      val counts = ranked.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_s"), min(col("grank")).as("start"))
      ranked.join(broadcast(counts), "lang")
        .withColumn("stratum_rank", col("grank") - col("start") + 1L)
        .select(col("doc_id"), col("lang"), col("stratum_rank"),
          when(col("stratum_rank") <= expr("(n_s + 9) div 10"), "val")
            .otherwise("train").as("split"))
    }),

    // Sequence packing — the step between curation and the trainer:
    // concatenate the epoch-ordered token stream and cut it into
    // fixed-budget sequences (GPT-style pack-then-chunk). Each doc's
    // placement is the exclusive prefix sum of token counts in the
    // deterministic shuffle order — computed by the two-pass
    // distributed scan (Relational.orderedPrefixSum: range-partition +
    // per-partition totals + offset re-stream, bounded driver state of
    // one long per partition, NO single-partition window). bin_id and
    // the boundary-straddle flag are then plain projections. At 100 TB
    // the plan is: one range shuffle + two partition-local passes.
    "q164_seq_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      Relational.orderedPrefixSum(docs, Seq(col("h"), col("doc_id")),
        "n_tokens", "offset_tokens")
        .select(col("doc_id"), col("n_tokens"), col("offset_tokens"),
          expr(s"offset_tokens div $PACK_BUDGET").as("bin_id"),
          (expr(s"(offset_tokens + n_tokens - 1) div $PACK_BUDGET")
            =!= expr(s"offset_tokens div $PACK_BUDGET")).as("spans_boundary"))
    }),

    // Context-window chunking WITH OVERLAP — the long-document prep for
    // a fixed-context trainer: token windows of CHUNK_N starting every
    // CHUNK_S tokens (windows start while start ≤ n; the tail window is
    // partial), each with its content hash for downstream chunk-level
    // dedup. posexplode over a stride sequence — scan-speed, zero
    // shuffle, chunk count ∝ doc length / stride.
    "q170_overlap_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      docs.select(col("doc_id"),
          col("ts"),
          posexplode(sequence(lit(1), size(col("ts")), lit(CHUNK_S)))
            .as(Seq("ci", "start")))
        .withColumn("win", slice(col("ts"), col("start"), lit(CHUNK_N)))
        .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          size(col("win")).cast("long").as("n_chunk_tokens"),
          md5(array_join(col("win"), " ")).as("chunk_hash"))
    }),

    // Per-source EXACT length percentiles — the curation dashboard's
    // robust stats, rank-based so both engines agree to the byte where
    // interpolating percentile implementations never would: p = the
    // len at stratum rank ceil(p·n) in (len, id) order. Ranks via the
    // q165 global-orderedRanks-minus-stratum-start trick — no source
    // stratum ever needs a single-partition window.
    // Mergeable quantile SKETCH with an error audit — the bounded-
    // memory twin of q171's exact percentiles: lengths collapse into
    // log₂ bins with 4 sub-bins per octave (≤ 12.5% relative error by
    // construction, ~250 bins total at any corpus size), the bin
    // histogram is a plain additive aggregate (mergeable across
    // partitions/shards — the property exact rank percentiles lack),
    // and each percentile estimate is the upper bound of the first bin
    // whose cumulative count reaches the exact-rank threshold.
    // Reported next to the exact values with the realized error in
    // bps, so the 100 TB deployment knows precisely what it trades.
    "q190_quantile_sketch" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      val binned = docs
        .withColumn("b", length(bin(col("len"))).cast("long"))
        .withColumn("scale", expr("CAST(pow(2, greatest(b - 3, 0)) AS BIGINT)"))
        .withColumn("upper", expr("((len div scale) + 1) * scale - 1"))
      val hist = binned.groupBy(col("source"), col("upper"))
        .agg(count(lit(1)).as("c"))
      val tot = hist.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      import org.apache.spark.sql.expressions.Window
      val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("upper"))))
      val est = cum.join(broadcast(tot), "source")
        .groupBy(col("source"), col("n_s"))
        .agg(min(when(col("cum") >= expr("(n_s + 1) div 2"), col("upper"))).as("p50_est"),
          min(when(col("cum") >= expr("(9 * n_s + 9) div 10"), col("upper"))).as("p90_est"),
          min(when(col("cum") >= expr("(99 * n_s + 99) div 100"), col("upper"))).as("p99_est"))
      val ranked = Relational.orderedRanks(docs,
        Seq(col("source"), col("len"), col("doc_id")), "grank")
      val starts = ranked.groupBy(col("source")).agg(min(col("grank")).as("start"))
      val exact = ranked.join(broadcast(starts), "source")
        .join(broadcast(tot), "source")
        .withColumn("rk", col("grank") - col("start") + 1L)
        .groupBy(col("source"))
        .agg(max(when(col("rk") === expr("(n_s + 1) div 2"), col("len"))).as("p50_exact"),
          max(when(col("rk") === expr("(9 * n_s + 9) div 10"), col("len"))).as("p90_exact"),
          max(when(col("rk") === expr("(99 * n_s + 99) div 100"), col("len"))).as("p99_exact"))
      est.join(exact, "source")
        .select(col("source"), col("n_s").as("n"),
          col("p50_exact"), col("p50_est"),
          col("p90_exact"), col("p90_est"),
          col("p99_exact"), col("p99_est"),
          expr("((p99_est - p99_exact) * 10000) div p99_exact").as("p99_err_bps"))
    }),

    "q171_length_percentiles" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"))
      val ranked = Relational.orderedRanks(docs,
        Seq(col("source"), col("len"), col("doc_id")), "grank")
      val stats = ranked.groupBy(col("source"))
        .agg(min(col("grank")).as("start"), count(lit(1)).as("n_s"))
      ranked.join(broadcast(stats), "source")
        .withColumn("rk", col("grank") - col("start") + 1L)
        .groupBy(col("source"))
        .agg(
          max(when(col("rk") === expr("(n_s + 1) div 2"), col("len"))).as("p50_tokens"),
          max(when(col("rk") === expr("(9 * n_s + 9) div 10"), col("len"))).as("p90_tokens"),
          max(when(col("rk") === expr("(99 * n_s + 99) div 100"), col("len"))).as("p99_tokens"))
    }),

    // Monolingual sequence packing — q164 within each lang stratum, so
    // no packed sequence mixes languages (the form curriculum and
    // per-language loss weighting want). Same scalable shape as
    // q165's rank trick: ONE global prefix sum ordered (stratum,
    // shuffle-uniform, id), then each doc's stratum-local token offset
    // is the global prefix minus the stratum's first prefix (a
    // |strata|-row broadcast of min-per-lang) — no stratum ever needs
    // a single-partition scan.
    "q169_pack_by_lang" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      val summed = Relational.orderedPrefixSum(docs,
        Seq(col("lang"), col("h"), col("doc_id")), "n_tokens", "gpre")
      val starts = summed.groupBy(col("lang")).agg(min(col("gpre")).as("start"))
      summed.join(broadcast(starts), "lang")
        .withColumn("offset_tokens", col("gpre") - col("start"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("offset_tokens"),
          expr(s"offset_tokens div $PACK_BUDGET").as("bin_id"))
    }),

    // Deterministic epoch shuffle: the reproducible training data
    // order — each epoch ranks the corpus by an epoch-salted md5
    // uniform (doc_id tie-break), so every worker, run, and engine
    // derives the SAME order for epoch e without a shared RNG state.
    // Ranks come from Relational.orderedRanks (range-partition +
    // distributed zipWithIndex), NOT a single-partition window — the
    // global sort shards at 100 TB. Two epochs in one relation prove
    // per-epoch independence.
    "q154_epoch_shuffle" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Seq(1, 2).map { e =>
        val keyed = docs.select(col("doc_id"),
          hashU16(col("doc_id"), s"epoch$e-").as("u16"))
        Relational.orderedRanks(keyed, Seq(col("u16"), col("doc_id")), "pos")
          .select(lit(e).as("epoch"), col("doc_id"), col("u16"), col("pos"))
      }.reduce(_ union _)
    }),

    // Gopher-style quality-rule bundle (Rae et al. 2021 §A1.1): the
    // per-rule flag table a curation run publishes before ANDing into
    // the final gate — token-count bounds, mean-word-length bounds,
    // stopword presence. All integer arithmetic: mean word length is
    // centi-chars via integer div (sum of token lengths = n_chars −
    // (n_tokens − 1) for single-space text); bounds tightened to this
    // corpus's observed [370, 530] range (Gopher's 3–10 chars would
    // pass everything) so the rule discriminates. Scan-speed, zero
    // shuffle.
    "q156_gopher_rules" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_chars"),
          arrays_overlap(split(col("text"), " "),
            array(lit("the"), lit("a"))).as("has_stopword"))
        .withColumn("mean_len_c2",
          expr("(100 * (n_chars - n_tokens + 1)) div n_tokens"))
        .withColumn("len_ok", col("n_tokens") >= 15 && col("n_tokens") <= 80)
        .withColumn("word_ok",
          col("mean_len_c2") >= 430 && col("mean_len_c2") <= 480)
        .withColumn("pass",
          col("len_ok") && col("word_ok") && col("has_stopword"))
        .drop("n_chars")),

    // Token-budget-constrained selection: the curation endgame verb —
    // given a 40%-of-corpus token budget, take documents in QUALITY
    // DENSITY order (quality per token, the knapsack greedy) until the
    // budget line. The selection frontier is a DISTRIBUTED exclusive
    // prefix sum of token counts in (density desc, id) order
    // ([[Relational.orderedPrefixSum]] — range partition + two passes,
    // no corpus-sized window); "selected" = prefix < budget, which is
    // prefix-closed (the straddling document is the only possible
    // overshoot, documented). Per-source report shows where the budget
    // actually went — the number a mixing policy is argued against.
    "q242_budget_select" -> ((s, d) => {
      import graft.functions.TextFunctions.qualityScore
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          floor(qualityScore(col("text"), TextQueries.EN) * 1e6)
            .cast("long").as("q6"))
        .withColumn("density_ppb", expr("(q6 * 1000) div n_tokens"))
      val tot = docs.agg(sum(col("n_tokens")).as("tt"))
      val pre = Relational.orderedPrefixSum(docs,
        Seq(col("density_ppb").desc, col("doc_id").asc), "n_tokens", "pre")
      pre.crossJoin(broadcast(tot))
        .withColumn("selected", col("pre") < expr("(tt * 2) div 5"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
          sum(when(col("selected"), col("n_tokens")).otherwise(0L)).as("tok_selected"),
          expr("sum(CASE WHEN selected THEN q6 END) div " +
            "nullif(sum(CASE WHEN selected THEN 1 END), 0)").as("mean_q6_selected"))
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    // every document under a language model trained ONLY on the trusted
    // slice (source = 'src0' — the same vetted set q83/q92/q217 anchor
    // on), then cut each language into head/middle/tail terciles by
    // score. CCNet trains a 5-gram KenLM on Wikipedia; the integer-exact
    // core here is the q177 add-one bigram model restricted to trusted
    // counts, with unseen bigrams paying the full smoothing penalty
    // (coalesce(c12,0), coalesce(c1,0)) — higher mean_ppm = more
    // Wikipedia-like. Per-language ranks go through
    // [[Relational.orderedRanks]] on the composite (lang, -score, id)
    // key — one global range-partitioned sort, NO per-language
    // single-partition window even when one language dominates the
    // corpus (en at web scale); tercile membership is then integer
    // arithmetic against per-language counts.
    "q218_ccnet_buckets" -> ((s, d) => {
      import graft.functions.TextFunctions.positionalShinglesOfTokens
      val docs = Tables.documents(s, d)
      val trusted = docs.filter(col("source") === "src0")
      // stage the token array in a projection before the shingle
      // lambda — passing split(text) straight in re-inlines the split
      // per element (the TextFunctions.scala:87 contract)
      val tbi = trusted
        .select(split(col("text"), " ").as("__ts"))
        .select(explode(positionalShinglesOfTokens(col("__ts"), 2)).as("bigram"))
      val bc = tbi.groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      val ctx = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val vocab = trusted.select(explode(split(col("text"), " ")).as("tok"))
        .agg(count_distinct(col("tok")).as("v"))
      val dbi = docs
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("__ts"))
        .select(col("doc_id"), col("lang"),
          explode(positionalShinglesOfTokens(col("__ts"), 2)).as("bigram"))
        .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      val scored = dbi
        .join(bc.select(col("bigram"), col("c12")), Seq("bigram"), "left")
        .join(ctx, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("lang"),
          expr("((coalesce(c12, 0) + 1) * 1000000) div (coalesce(c1, 0) + v)").as("p_ppm"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("nb"), sum(col("p_ppm")).as("sp"))
        .select(col("doc_id"), col("lang"), expr("sp div nb").as("mean_ppm"))
      val ranked = Relational.orderedRanks(scored,
        Seq(col("lang").asc, col("mean_ppm").desc, col("doc_id").asc), "ord")
      val perLang = ranked.groupBy(col("lang"))
        .agg(min(col("ord")).as("ord0"), count(lit(1)).as("n"))
      ranked.join(broadcast(perLang), Seq("lang"))
        .withColumn("rk", col("ord") - col("ord0") + 1)
        .select(col("doc_id"), col("lang"), col("mean_ppm"),
          when(col("rk") * 3 <= col("n"), "head")
            .when(col("rk") * 3 <= col("n") * 2, "middle")
            .otherwise("tail").as("bucket"))
    })
  )

  private val MixSalt = "mix1-"
  private val CapSalt = "cap1-"
  private val MaskSalt = "mask1-"
  private val Blocklist = Seq("dup", "nsfw", "badword")

  private val rawSql =
    """text
      || CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END
      || CASE WHEN doc_id % 2 = 0
              THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END"""

  /** hashU16's oracle twin for an arbitrary salt over d.doc_id. */
  private def u16SqlWith(salt: String): String = {
    def nib(i: Int) =
      s"strpos('123456789abcdef', substr(md5('$salt' || CAST(d.doc_id AS VARCHAR)), $i, 1))"
    s"CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS INT)"
  }

  /** hashU16's oracle twin over an arbitrary VARCHAR key expression. */
  private def u16KeySql(salt: String, keySql: String): String = {
    def nib(i: Int) =
      s"strpos('123456789abcdef', substr(md5('$salt' || ($keySql)), $i, 1))"
    s"CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS INT)"
  }

  private val u16Sql = {
    def nib(i: Int) =
      s"strpos('123456789abcdef', substr(md5('seed42-' || CAST(doc_id AS VARCHAR)), $i, 1))"
    s"CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS INT)"
  }

  val oracleSql: Map[String, String] = Map(
    "q165_stratified_split" ->
      """WITH t AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
         |           FROM documents),
         |r AS (SELECT doc_id, lang,
         |        CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
         |          AS BIGINT) AS stratum_rank,
         |        count(*) OVER (PARTITION BY lang) AS n_s
         |      FROM t)
         |SELECT doc_id, lang, stratum_rank,
         |       CASE WHEN stratum_rank <= (n_s + 9) // 10
         |            THEN 'val' ELSE 'train' END AS split
         |FROM r""".stripMargin,
    "q170_overlap_chunks" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |w AS (SELECT doc_id, ts,
         |        unnest(generate_series(1, len(ts), $CHUNK_S)) AS start
         |      FROM t)
         |SELECT doc_id,
         |  CAST((start - 1) // $CHUNK_S AS INT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(len(ts[start:least(start + ${CHUNK_N - 1}, len(ts))]) AS BIGINT)
         |    AS n_chunk_tokens,
         |  md5(array_to_string(ts[start:least(start + ${CHUNK_N - 1}, len(ts))], ' '))
         |    AS chunk_hash
         |FROM w""".stripMargin,
    "q190_quantile_sketch" ->
      """WITH t AS (SELECT source, doc_id,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS len
         |           FROM documents),
         |bb AS (SELECT source, len,
         |         CAST(pow(2, greatest(CAST(length(bin(len)) AS BIGINT) - 3, 0))
         |              AS BIGINT) AS scale
         |       FROM t),
         |h AS (SELECT source, ((len // scale) + 1) * scale - 1 AS upper,
         |        CAST(count(*) AS BIGINT) AS c
         |      FROM bb GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM h GROUP BY 1),
         |cum AS (SELECT source, upper,
         |          CAST(sum(c) OVER (PARTITION BY source ORDER BY upper)
         |               AS BIGINT) AS cum
         |        FROM h),
         |est AS (SELECT c.source, t.n_s,
         |          min(CASE WHEN cum >= (n_s + 1) // 2 THEN upper END) AS p50_est,
         |          min(CASE WHEN cum >= (9 * n_s + 9) // 10 THEN upper END) AS p90_est,
         |          min(CASE WHEN cum >= (99 * n_s + 99) // 100 THEN upper END) AS p99_est
         |        FROM cum c JOIN tot t USING (source) GROUP BY 1, 2),
         |r AS (SELECT source, len,
         |        row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY source) AS n_s
         |      FROM t),
         |ex AS (SELECT source,
         |         MAX(CASE WHEN rk = (n_s + 1) // 2 THEN len END) AS p50_exact,
         |         MAX(CASE WHEN rk = (9 * n_s + 9) // 10 THEN len END) AS p90_exact,
         |         MAX(CASE WHEN rk = (99 * n_s + 99) // 100 THEN len END) AS p99_exact
         |       FROM r GROUP BY source)
         |SELECT e.source, t.n_s AS n,
         |       x.p50_exact, e.p50_est, x.p90_exact, e.p90_est,
         |       x.p99_exact, e.p99_est,
         |       ((e.p99_est - x.p99_exact) * 10000) // x.p99_exact AS p99_err_bps
         |FROM est e JOIN ex x USING (source) JOIN tot t USING (source)""".stripMargin,
    "q171_length_percentiles" ->
      """WITH t AS (SELECT source, doc_id,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS len
         |           FROM documents),
         |r AS (SELECT source, len,
         |        row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY source) AS n_s
         |      FROM t)
         |SELECT source,
         |  MAX(CASE WHEN rk = (n_s + 1) // 2 THEN len END) AS p50_tokens,
         |  MAX(CASE WHEN rk = (9 * n_s + 9) // 10 THEN len END) AS p90_tokens,
         |  MAX(CASE WHEN rk = (99 * n_s + 99) // 100 THEN len END) AS p99_tokens
         |FROM r GROUP BY source""".stripMargin,
    "q169_pack_by_lang" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             md5(CAST(doc_id AS VARCHAR)) AS h
         |           FROM documents)
         |SELECT doc_id, lang, n_tokens,
         |       CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
         |              ORDER BY h, doc_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS BIGINT) AS offset_tokens,
         |       CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
         |              ORDER BY h, doc_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS BIGINT) // $PACK_BUDGET AS bin_id
         |FROM t""".stripMargin,
    "q164_seq_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             md5(CAST(doc_id AS VARCHAR)) AS h
         |           FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS offset_tokens
         |      FROM t)
         |SELECT doc_id, n_tokens, offset_tokens,
         |       offset_tokens // $PACK_BUDGET AS bin_id,
         |       ((offset_tokens + n_tokens - 1) // $PACK_BUDGET)
         |         != (offset_tokens // $PACK_BUDGET) AS spans_boundary
         |FROM c""".stripMargin,
    "q87_pii_redact" ->
      s"""SELECT doc_id,
         CAST(len(regexp_extract_all(raw, '$EmailRe')) AS INT) AS n_emails,
         CAST(len(regexp_extract_all(raw, '$PhoneRe')) AS INT) AS n_phones,
         regexp_replace(regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
                        '$PhoneRe', '<PHONE>', 'g') AS clean
         FROM (SELECT doc_id, $rawSql AS raw FROM documents)""",
    "q88_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         raw AS (SELECT doc_id,
                   unnest(generate_series(0, CAST(ceil(len(ts) / 10.0) AS INT) - 1)) AS pos,
                   unnest(list_transform(generate_series(0, CAST(ceil(len(ts) / 10.0) AS INT) - 1),
                          i -> array_to_string(ts[(i*10+1):(i*10+10)], ' '))) AS chunk
                 FROM toks),
         kept AS (SELECT doc_id, pos, chunk,
                    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rn
                  FROM raw)
         SELECT doc_id, count(*) AS n_kept,
                string_agg(chunk, ' ' ORDER BY pos) AS clean_text
         FROM kept WHERE rn = 1 GROUP BY doc_id""",
    "q89_stratified_sample" ->
      s"""SELECT doc_id, source, u16, cut FROM (
           SELECT doc_id, source, $u16Sql AS u16,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                  THEN 49152 ELSE 16384 END AS cut
           FROM documents)
         WHERE u16 < cut""",
    "q90_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         grams AS (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1])) AS gram
                   FROM toks),
         per_gram AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2)
         SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(MAX(c) AS BIGINT) AS top_gram_count,
           CAST(floor(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1000000.0) AS BIGINT)
             AS top_share_q6,
           CAST(floor(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1000000.0) AS BIGINT)
             > 100000 AS is_repetitive
         FROM per_gram GROUP BY doc_id""",
    "q91_zorder" ->
      s"""WITH pts AS (SELECT event_id,
                        CAST(user_id % 256 AS INT) AS x,
                        CAST(floor(value) AS INT) % 256 AS y
                      FROM events),
         zv AS (SELECT event_id, CAST(${zValueSql("x", "y", 8)} AS BIGINT) AS z FROM pts)
         SELECT CAST(z >> 6 AS INT) AS z_cell, count(*) AS n_events,
           MIN(z) AS z_min, MAX(z) AS z_max,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id
         FROM zv GROUP BY 1""",
    "q125_zorder3d" ->
      s"""WITH dims AS (SELECT doc_id,
                          CAST(substr(source, 4) AS INT) % 256 AS src,
                          CAST(n_chars % 256 AS INT) AS len,
                          CAST(len(string_split(text, ' ')) % 256 AS INT) AS tok
                        FROM documents),
         zv AS (SELECT doc_id,
                  CAST(${zValueSqlN(Seq("src", "len", "tok"), 8)} AS BIGINT) AS z
                FROM dims)
         SELECT CAST(z >> 12 AS INT) AS z_cell, count(*) AS n_docs,
           MIN(z) AS z_min, MAX(z) AS z_max,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
         FROM zv GROUP BY 1""",
    // Mirrors Curation.temperatureQuotas/temperatureMix: α = 1/2 weight
    // floor(sqrt(n)) (IEEE sqrt correctly rounded on both engines),
    // half-corpus budget, integer pro-rata quota, 16-bit keep threshold
    // against the salted md5 uniform.
    "q127_source_mixing" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         w AS (SELECT source, n_docs,
                 CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq
               FROM c),
         t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                      CAST(SUM(isq) AS BIGINT) AS sum_isq FROM w),
         r AS (SELECT source, n_docs,
                 ((n_total // 2) * isq) // sum_isq AS quota,
                 LEAST(65536, ((((n_total // 2) * isq) // sum_isq) * 65536) // n_docs)
                   AS rate_u16
               FROM w, t),
         sel AS (SELECT d.source, count(*) AS n_selected,
                   CAST(SUM(d.doc_id) AS BIGINT) AS sum_selected_ids
                 FROM documents d JOIN r USING (source)
                 WHERE ${u16SqlWith(MixSalt)} < rate_u16
                 GROUP BY 1)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(quota AS BIGINT) AS quota, CAST(rate_u16 AS BIGINT) AS rate_u16,
           COALESCE(n_selected, 0) AS n_selected,
           COALESCE(sum_selected_ids, 0) AS sum_selected_ids
         FROM r LEFT JOIN sel USING (source)""",
    "q203_jsonl_roundtrip" -> {
      val shardSql = u16KeySql("jl", "CAST(doc_id AS VARCHAR)") + " % 8"
      s"""SELECT CAST($shardSql AS INT) AS shard,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |       CAST(sum(len(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1""".stripMargin
    },
    "q198_weighted_sample" -> {
      val q6Sql = s"CAST(floor((least(1.0, CAST(${TextQueries.nTokensSql} AS DOUBLE)" +
        s" / 50.0) * (1.0 - ${TextQueries.stopRatioSql})) * 1000000.0) AS BIGINT)"
      val hSql = u16KeySql("ws", "CAST(doc_id AS VARCHAR)")
      s"""WITH g AS (SELECT doc_id, source, $q6Sql AS q6,
         |             CAST($hSql AS BIGINT) AS h
         |           FROM documents),
         |p AS (SELECT doc_id, source, q6,
         |        ((q6 + 1) * 65536) // (h + 1) AS pri
         |      FROM g),
         |r AS (SELECT doc_id, source, q6,
         |        CAST(row_number() OVER (ORDER BY pri DESC, doc_id) AS BIGINT) AS rk,
         |        (SELECT CAST(count(*) AS BIGINT) FROM g) AS n
         |      FROM p)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN rk <= n // 5 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_selected,
         |       CAST(sum(q6) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_q6_all,
         |       CAST(sum(CASE WHEN rk <= n // 5 THEN q6 END) AS BIGINT) //
         |         CAST(sum(CASE WHEN rk <= n // 5 THEN 1 END) AS BIGINT)
         |         AS mean_q6_selected
         |FROM r GROUP BY source""".stripMargin
    },
    "q178_waterfill_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                      CAST(count(*) AS BIGINT) AS m FROM c),
         r AS (SELECT source, n_docs,
                 CAST(row_number() OVER (ORDER BY n_docs, source) AS BIGINT) AS k,
                 CAST(COALESCE(sum(n_docs) OVER (ORDER BY n_docs, source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS s_prev,
                 (SELECT n_total FROM t) // 2 AS b,
                 (SELECT m FROM t) AS m
               FROM c),
         ks AS (SELECT k AS kk, s_prev + n_docs AS ss FROM r
                WHERE n_docs * (m - k + 1) + s_prev <= b
                ORDER BY k DESC LIMIT 1),
         kx AS (SELECT COALESCE((SELECT kk FROM ks), 0) AS kk,
                       COALESCE((SELECT ss FROM ks), 0) AS ss)
       SELECT source, n_docs,
              CAST(CASE WHEN kk >= m THEN n_docs
                        ELSE LEAST(n_docs, (b - ss) // (m - kk)) END AS BIGINT)
                AS quota,
              (CASE WHEN kk >= m THEN n_docs
                    ELSE LEAST(n_docs, (b - ss) // (m - kk)) END) < n_docs
                AS capped
       FROM r, kx""",
    "q148_chunk_freq_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         raw AS (SELECT doc_id,
                   unnest(generate_series(0, CAST(ceil(len(ts) / 3.0) AS INT) - 1)) AS pos,
                   unnest(list_transform(generate_series(0, CAST(ceil(len(ts) / 3.0) AS INT) - 1),
                          i -> array_to_string(ts[(i*3+1):(i*3+3)], ' '))) AS chunk
                 FROM toks),
         f AS (SELECT md5(chunk) AS h, count(*) AS c FROM raw GROUP BY 1)
         SELECT doc_id, count(*) AS n_chunks,
           CAST(count(*) FILTER (WHERE c > 2) AS BIGINT) AS n_removed,
           COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE c <= 2), '')
             AS clean_text
         FROM raw JOIN f ON md5(raw.chunk) = f.h
         GROUP BY doc_id""",
    "q149_source_cap" ->
      s"""SELECT doc_id, source, u16, rk FROM (
           SELECT d.doc_id, d.source, ${u16SqlWith(CapSalt)} AS u16,
             CAST(row_number() OVER (PARTITION BY d.source
                  ORDER BY ${u16SqlWith(CapSalt)}, d.doc_id) AS INT) AS rk
           FROM documents d)
         WHERE rk <= 15""",
    "q150_mlm_mask" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         m AS (SELECT doc_id, len(ts) AS n_tokens,
                 list_transform(generate_series(1, len(ts)), i ->
                   CASE WHEN ${u16KeySql(MaskSalt,
                     "CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")} < 9830
                        THEN '<MASK>' ELSE ts[i] END) AS mt
               FROM toks)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(list_filter(mt, x -> x = '<MASK>')) AS BIGINT) AS n_masked,
           array_to_string(mt, ' ') AS masked_text
         FROM m""",
    "q151_blocklist" ->
      s"""WITH f AS (SELECT doc_id, source,
             len(list_intersect(string_split(text, ' '),
                 [${Blocklist.map(w => s"'$w'").mkString(", ")}])) > 0 AS flagged
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE flagged) AS BIGINT) AS n_flagged,
           COALESCE(CAST(SUM(doc_id) FILTER (WHERE flagged) AS BIGINT), 0)
             AS sum_flagged_ids,
           CAST(floor(10000.0 * (count(*) FILTER (WHERE flagged)) / count(*)) AS BIGINT)
             AS flagged_bps
         FROM f GROUP BY 1""",
    "q154_epoch_shuffle" -> Seq(1, 2).map { e =>
      val u16 = {
        def nib(i: Int) =
          s"strpos('123456789abcdef', substr(md5('epoch$e-' || CAST(d.doc_id AS VARCHAR)), $i, 1))"
        s"CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS INT)"
      }
      s"""SELECT $e AS epoch, d.doc_id, $u16 AS u16,
            row_number() OVER (ORDER BY $u16, d.doc_id) AS pos
          FROM documents d"""
    }.mkString(" UNION ALL "),
    "q156_gopher_rules" ->
      """WITH t AS (SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens, n_chars,
             len(list_intersect(string_split(text, ' '), ['the', 'a'])) > 0
               AS has_stopword
           FROM documents),
         r AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                 has_stopword,
                 CAST((100 * (n_chars - n_tokens + 1)) // n_tokens AS BIGINT)
                   AS mean_len_c2,
                 n_tokens BETWEEN 15 AND 80 AS len_ok
               FROM t)
         SELECT doc_id, source, n_tokens, has_stopword, mean_len_c2, len_ok,
           mean_len_c2 BETWEEN 430 AND 480 AS word_ok,
           len_ok AND (mean_len_c2 BETWEEN 430 AND 480) AND has_stopword AS pass
         FROM r""",
    "q242_budget_select" -> {
      import TextQueries.{nTokensSql, stopRatioSql}
      val q6Sql = s"CAST(floor((least(1.0, CAST($nTokensSql AS DOUBLE) / 50.0)" +
        s" * (1.0 - $stopRatioSql)) * 1000000.0) AS BIGINT)"
      s"""WITH g AS (SELECT doc_id, source,
         |             CAST($nTokensSql AS BIGINT) AS n_tokens,
         |             $q6Sql AS q6
         |           FROM documents),
         |dd AS (SELECT *, (q6 * 1000) // n_tokens AS density_ppb FROM g),
         |tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM g),
         |p AS (SELECT doc_id, source, n_tokens, q6,
         |        CAST(COALESCE(SUM(n_tokens) OVER (
         |          ORDER BY density_ppb DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS pre
         |      FROM dd),
         |sel AS (SELECT *, pre < ((SELECT tt FROM tt) * 2) // 5 AS selected
         |        FROM p)
         |SELECT source, count(*) AS n_docs,
         |  CAST(SUM(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
         |  CAST(SUM(CASE WHEN selected THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tok_selected,
         |  CAST(SUM(CASE WHEN selected THEN q6 END)
         |       // NULLIF(SUM(CASE WHEN selected THEN 1 END), 0) AS BIGINT)
         |    AS mean_q6_selected
         |FROM sel GROUP BY 1""".stripMargin
    },
    "q218_ccnet_buckets" ->
      """WITH tts AS (SELECT string_split(text, ' ') AS ts FROM documents
         |            WHERE source = 'src0'),
         |tbi AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
         |                 i -> ts[i] || ' ' || ts[i+1])) AS bigram FROM tts),
         |bc AS (SELECT bigram, count(*) AS c12,
         |         string_split(bigram, ' ')[1] AS w1 FROM tbi GROUP BY 1),
         |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok) AS v
         |      FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |            FROM documents WHERE source = 'src0')),
         |dts AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
         |dbi AS (SELECT doc_id, lang,
         |          unnest(list_transform(generate_series(1, len(ts) - 1),
         |            i -> ts[i] || ' ' || ts[i+1])) AS bigram FROM dts),
         |sc AS (SELECT d.doc_id, d.lang,
         |         ((COALESCE(bc.c12, 0) + 1) * 1000000)
         |           // (COALESCE(ctx.c1, 0) + (SELECT v FROM v)) AS p_ppm
         |       FROM dbi d
         |       LEFT JOIN bc USING (bigram)
         |       LEFT JOIN ctx ON ctx.w1 = string_split(d.bigram, ' ')[1]),
         |doc AS (SELECT doc_id, lang,
         |          CAST(CAST(sum(p_ppm) AS BIGINT) // count(*) AS BIGINT) AS mean_ppm
         |        FROM sc GROUP BY 1, 2),
         |r AS (SELECT doc_id, lang, mean_ppm,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY mean_ppm DESC, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM doc)
         |SELECT doc_id, lang, mean_ppm,
         |       CASE WHEN rk * 3 <= n THEN 'head'
         |            WHEN rk * 3 <= n * 2 THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM r""".stripMargin
  )
}
