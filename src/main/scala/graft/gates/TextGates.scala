package graft.gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ivf, Sim, Text}
import graft.operators.{AsOfJoin, Dedup, Sessionize}
import graft.ops.{Dims, Quality}
import graft.sources.Tables

/** Text-analysis gates: language ID, quality scoring, token counts,
  * word counts, curation rules, chunking, PII scrub, BM25, top-k UDAF.
  *
  * Split out of SparkEntry (one gate map per operator family); the
  * driver contract is still the combined SparkEntry.queries /
  * SparkEntry.oracleSql. Helpers and shared oracle CTEs live in
  * [[GateSupport]].
  */
private[graft] object TextGates {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X7 language ID (stopword heuristic + CJK fast path) — rows-only
    // (accuracy vs the fixture lang column is asserted in ScalaTest)
    "x07_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X8 quality scoring (length/punct/stopword composite) — rows-only
    "x08_quality_score" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.punctRatio(col("text")).as("punct_ratio"),
          Text.stopwordRatio(col("text")).as("stopword_ratio"),
          Text.charEntropy(col("text")).as("entropy"),
          Text.qualityScore(col("text")).as("quality"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X9 token counting (whitespace + subword proxy) — portable oracle
    "x09_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.tokenCount(col("text")).as("n_tok"),
          Text.subwordCount(col("text")).as("n_subword"),
          length(col("text")).cast(LongType).as("n_chars_calc"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X19 curation verdicts: quality signals + rule attribution
    // (rows-only; signal math covered by unit tests + x08/x09 oracles)
    "x19_curation" -> ((s, d) =>
      graft.operators.Curation.annotate(t(s, d, "documents"))
        .select(col("doc_id"), col("n_tok"), col("entropy"),
          col("top_bigram_frac"), col("dup_ngram_frac"), col("dup_line_frac"),
          to_json(col("drop_reasons")).as("drop_reasons"), col("keep"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X15 [UDTF surface] explode token stream → global top-20 words
    "x15_word_counts" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, asc_nulls_first("word"))
        .limit(20)),

    // X46 BM25 relevance (query-driven corpus curation): top-10 docs
    // for a 3-term probe query, Okapi BM25 with corpus-wide N/avgdl.
    // Both the tokenizer (the x15/x43 stream) and the scoring formula
    // are engine-replayable, so the oracle recomputes scores
    // term-for-term. Compared score is ROUND(...,2): Spark and DuckDB
    // sum the ≤3 per-term contributions in different orders, so the
    // float sums differ in the last ulps — a 2-decimal grid keeps a
    // boundary flip (sum within ~1e-13 of a 0.005 edge) out of
    // realistic reach where a 4-decimal grid did not. Ordering uses
    // the same rounded score + doc_id tiebreak so the top-10
    // selection is engine-stable.
    "x46_bm25_topk" -> ((s, d) =>
      graft.operators.Bm25.score(t(s, d, "documents"),
          Seq("window", "column", "scan"))
        .select(col("doc_id"), round(col("score"), 2).as("score"))
        .orderBy(col("score").desc, asc_nulls_first("doc_id"))
        .limit(10)),

    // X22 token-window chunking (training-data prep): 80-token
    // windows, 20-token overlap; map-only native expression emitting
    // struct<chunk, n_tok> so the per-chunk token count rides along
    // from the window construction instead of being re-tokenized.
    // Oracle replicates the window arithmetic.
    "x22_chunking" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.Text.chunksWithCounts(col("text"), 80, 20)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          col("col.n_tok").as("n_tok"),
          col("col.chunk").as("chunk"))
        .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("chunk_id"))),

    // X61 REAL byte-pair encoding (Sennrich et al. 2016, not the
    // length/4 estimate): merges trained on the corpus half (one
    // distributed word-count shuffle + vocabulary-bounded driver
    // merge learning, the subword-nmt split), applied to the other
    // half by a map-only native expression. BPE merge ranks are not
    // SQL-replayable → rows-only here; x61b pins the algebraic
    // contract with a full oracle.
    "x61_bpe_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.functions.Bpe.modelFor(s"bpe:$d",
        docs.where(col("doc_id") < 300), numMerges = 200)
      docs.where(col("doc_id") >= 300)
        .select(col("doc_id"),
          graft.functions.Bpe.subwordCount(col("text"), model)
            .cast(LongType).as("n_bpe"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X61b the oracle-gated BPE audit (the x26/x34 backstop pattern):
    // reconstruction (concatenated subwords == concatenated tokens,
    // marker-free merges never cross a word), the per-doc lower bound
    // (>= 1 subword per token), and genuine compression (in-domain
    // merges make strictly fewer symbols than characters). Verdicts
    // computed distributed; the oracle recomputes the doc count and
    // pins every bound.
    "x61b_bpe_audit" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.functions.Bpe.modelFor(s"bpe:$d",
        docs.where(col("doc_id") < 300), numMerges = 200)
      docs.where(col("doc_id") >= 300)
        .select(col("doc_id"),
          graft.functions.Bpe.subwords(col("text"), model).as("sw"),
          graft.functions.Text.tokens(col("text")).as("ts"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          (count(when(concat_ws("", col("sw")) =!= concat_ws("", col("ts")), 1))
            === 0).as("recon_ok"),
          (count(when(size(col("sw")) < size(col("ts")), 1)) === 0)
            .as("lower_bound_ok"),
          (sum(size(col("sw"))) < sum(length(concat_ws("", col("ts")))))
            .as("compresses"))
    }),

    // X57 statistical LM quality scoring (the CCNet perplexity-filter
    // shape): a bigram LM with add-one smoothing trains on the corpus
    // half (doc_id < 300, the x50/x56 split) and scores the other
    // half. Per-transition cost is quantized to a LONG before the
    // per-document sum (floor(−log2 P · 10⁴ + 0.5)) so the aggregate
    // is an integer — immune to cross-engine float-accumulation-order
    // differences a ROUND(AVG(…)) would be exposed to. The oracle
    // replays training and scoring in full.
    "x57_lm_perplexity" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val lm = graft.operators.LmScore.lmFor(s"bigram_lm:$d",
        docs.where(col("doc_id") < 300))
      graft.operators.LmScore.scoreBits(
        docs.where(col("doc_id") >= 300), lm)
        .select(col("doc_id"), col("nll_e4").cast(LongType).as("nll_e4"),
          col("n_bigrams").cast(LongType).as("n_bigrams"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X55 duplicate-line REMOVAL (the Gopher repetition rule applied,
    // not just scored like dup_line_frac in x19): drop every
    // non-blank line whose exact text appeared earlier in the
    // document, keep blank lines as structure. The fixture text has
    // no newlines, so the gate synthesizes deterministic multi-line
    // docs by pure arithmetic on the row index (the x31 pattern) —
    // 12 lines per doc, 3 distinct content values + 3 blanks, so
    // exactly 6 lines drop from every document.
    "x55_dedup_lines" -> ((s, d) => {
      val line = (j: Column) => when(j % 4 === 3, lit(""))
        .otherwise(concat(lit("line "),
          ((col("i") * 7 + j * j) % 5).cast(StringType)))
      s.range(200).select(col("id").as("i"))
        .select(col("i"), concat_ws("\n",
          transform(sequence(lit(0), lit(11)), line)).as("text"))
        .select(col("i"),
          graft.expressions.NativeText.dedupLines(col("text")).as("r"))
        .select(col("i"), col("r.kept_text").as("kept_text"),
          col("r.n_removed").as("n_removed"))
        .orderBy(asc_nulls_first("i"))
    }),

    // X31 PII scrubbing through the gate: the fixture corpus has no
    // PII, so the gate synthesizes deterministic PII-bearing text by
    // pure arithmetic on the row index (the x17 pattern) and checks
    // the scrubbed output plus per-kind counts. The regex constants
    // are RE2-portable and shared verbatim with the oracle SQL —
    // single source of truth, engine-identical matches.
    "x31_pii_scrub" -> ((s, d) => {
      val raw = concat(
        lit("user"), col("i"), lit(" wrote from 10.0."),
        (col("i") % 256).cast(StringType), lit("."),
        ((col("i") * 7) % 256).cast(StringType),
        lit(" contact user"), col("i"),
        lit("@example.com or call 555-123-"),
        lpad(((col("i") * 37) % 10000).cast(StringType), 4, "0"),
        lit(" about the weather"))
      s.range(50).select(col("id").as("i"))
        .select(col("i"), raw.as("raw"))
        .select(col("i"),
          Text.scrubPii(col("raw")).as("clean"),
          Text.piiCounts(col("raw")).as("pc"))
        .select(col("i"), col("clean"),
          col("pc.emails").cast(LongType).as("emails"),
          col("pc.ips").cast(LongType).as("ips"),
          col("pc.phones").cast(LongType).as("phones"))
        .orderBy(asc_nulls_first("i"))
    }),

    // X21 [A6 UDAF] the same kNN ranking as x05, but through the
    // bounded-heap Aggregator UDAF instead of a row_number window —
    // map-side partial top-k, so only ≤k rows per (partition, query)
    // reach the shuffle. Checked against the identical window oracle.
    "x21_topk_udaf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(graft.expressions.NativeVector.cosineSim(col("qv"), col("cv")), 4)
            .as("sim"))
      val tk = graft.functions.TopKAgg.topK(5)
      scored.groupBy("query_id")
        .agg(tk(col("neighbor_id"), col("sim")).as("topk"))
        .select(col("query_id"), posexplode(col("topk")))
        .select(col("query_id"), col("col.id").as("neighbor_id"),
          col("col.score").as("sim"), (col("pos") + 1).cast("long").as("rnk"))
        .orderBy(asc_nulls_first("query_id"), asc_nulls_first("rnk"))
    }),

    // X62 Gopher duplicate-n-gram repetition signals (Rae et al.
    // 2021): fraction of token CHARACTERS covered by n-grams that
    // occur ≥2× in the document — coverage UNION, so a character
    // counts once however many duplicated windows overlap it.
    // Complements x19's top-bigram share (one dominating loop) with
    // the diffuse-boilerplate signal. Map-only native expression;
    // FULL-value oracle (window n-grams, duplicate detection, and
    // the position-coverage union all replayed in SQL).
    "x62_dup_ngrams" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.dupNgramCharFrac(col("text"), 2).as("dup2_frac"),
          Text.dupNgramCharFrac(col("text"), 3).as("dup3_frac"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X64 CROSS-document boilerplate removal (CCNet/RefinedWeb):
    // lines verbatim-repeated across ≥ minDocs docs are stripped
    // corpus-wide — the step x55's within-doc rule can't reach. The
    // fixture docs are single-line with no cross-doc repeats, so the
    // gate synthesizes a deterministic newsletter corpus by index
    // arithmetic (the x31/x55 pattern): per-group header and footer
    // lines repeat across 20 docs each (frequent), body lines are
    // unique (kept), a space-only line checks blank preservation.
    // FULL-value oracle: document frequency, the frequent set, and
    // the per-occurrence rewrite all replayed in SQL.
    "x64_boilerplate" -> ((s, d) => {
      val docs = s.range(120).select(col("id").as("i"),
        concat(
          lit("=== newsletter header "), col("id") % 6, lit(" ===\n"),
          lit("body "), col("id"), lit(" first unique line\n"),
          lit("  \n"),
          lit("body "), col("id"), lit(" second unique line\n"),
          lit("unsubscribe at list "), col("id") % 6, lit(" dot example"))
          .as("text"))
      graft.operators.Boilerplate.stripFrequentLines(docs, minDocs = 5,
          idCol = "i")
        .orderBy(asc_nulls_first("i"))
    }),

    // X66 URL curation (the first step of every crawl pipeline):
    // canonical URL (lowercase scheme/host, default ports stripped,
    // fragment dropped, tracking params removed, query sorted, path
    // slashes trimmed), registrable domain (multi-part public-suffix
    // aware), and a blocklist verdict. The fixture synthesizes URLs
    // by doc_id arithmetic covering mixed case, default/explicit
    // ports, tracking params, fragments, a multi-part TLD, and a
    // malformed variant (NULL on both sides); the oracle replays the
    // full normalization spec as a regex/list pipeline.
    "x66_url_curation" -> ((s, d) => {
      graft.functions.Url.curate(
          t(s, d, "documents").select(col("doc_id"),
            urlFixture(col("doc_id")).as("url")), "url",
          blockedDomains = Seq("example.net"))
        .select(col("doc_id"), col("url_norm"), col("host"),
          col("domain"), col("keep"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X68 HTML → text extraction (before any text signal runs on a
    // web corpus): comments and script/style ELEMENTS (content too)
    // removed, remaining tags each become one space, XML entities
    // decoded (&amp; last), then the x65 cleanup. The fixture wraps
    // the documents text in deterministic HTML by doc_id arithmetic —
    // title/style/script/comment/entities variants; FULL-value oracle
    // replays the exact regex pipeline the native walk is specified
    // against (script bodies contain < and > to prove element removal
    // happens before tag stripping).
    "x68_html_extract" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          htmlFixture(col("doc_id"), col("text")).as("html"))
        .select(col("doc_id"), Text.htmlExtract(col("html")).as("extracted"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X70 the composed WEB-INGEST pipeline (the x25 pattern for the
    // ingest layer): per document, the x66 URL and x68 HTML fixtures
    // feed Url.curate + htmlExtract + tokenCount in ONE plan, and the
    // admission verdict conjoins the URL keep with a minimum-length
    // gate on the EXTRACTED text — the linkage (n_tok counted on the
    // post-extraction text, not the raw html) is what the composition
    // proves. Everything stays map-only; the oracle composes the x66
    // and x68 oracle texts verbatim as subqueries (single source of
    // truth, nothing re-specified).
    "x70_web_ingest" -> ((s, d) => {
      val df = t(s, d, "documents").select(col("doc_id"),
        urlFixture(col("doc_id")).as("url"),
        htmlFixture(col("doc_id"), col("text")).as("html"))
      graft.functions.Url.curate(df, "url", blockedDomains = Seq("example.net"))
        .select(col("doc_id"), col("url_norm"), col("domain"),
          Text.tokenCount(Text.htmlExtract(col("html")))
            .cast(LongType).as("n_tok"),
          col("keep").as("keep_url"))
        .select(col("doc_id"), col("url_norm"), col("domain"), col("n_tok"),
          (col("keep_url") && col("n_tok") >= 10).as("keep"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X71 WARC crawl-archive ingest: the staged fixture packs every
    // document's x68 HTML into a per-record-gzip-member `.warc.gz`
    // corpus (request records interleaved for id%5==0 — the reader
    // must skip them; status 404 for id%11==0), then the gate runs the
    // REAL archive path end-to-end: concatenated-member gunzip → WARC
    // framing → HTTP status/header/body split → htmlExtract — so the
    // oracle checks record framing, type filtering, date parse, and
    // payload fidelity in FULL values. The WARC roundtrip is the
    // system under test; the oracle recomputes the logical content
    // (URI/epoch/status by doc_id arithmetic, text via the x68
    // subquery) without ever seeing the archive bytes.
    "x71_warc_ingest" -> ((s, d) => {
      val p = stageWarc(s, d)
      // persist before the global sort (same reason as x72): the
      // range partitioner's sampling job would otherwise replay the
      // full archive parse + extraction a second time
      graft.sources.Warc.readResponses(s, p)
        .select(
          regexp_extract(col("target_uri"), "item([0-9]+)$", 1)
            .cast(LongType).as("doc_id"),
          col("target_uri"),
          col("warc_date").cast(LongType).as("fetch_epoch"),
          col("http_status"),
          Text.htmlExtract(decode(col("body"), "UTF-8")).as("extracted"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X84 sentence segmentation (portable regex rule — boundary =
    // [.!?]+ then spaces then [A-Z0-9]; Spark's builtin sentences()
    // is BreakIterator/locale-bound and unreplayable). FULL-value
    // check on the count and the first/last sentence per doc; the
    // oracle runs the identical marker-replace pipeline in RE2.
    "x84_sentences" -> ((s, d) => {
      val ss = Text.sentenceSplit(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), ss.as("ss"))
        .select(col("doc_id"),
          size(col("ss")).cast(LongType).as("n_sent"),
          when(size(col("ss")) > 0, element_at(col("ss"), 1)).as("first_s"),
          when(size(col("ss")) > 0, element_at(col("ss"), -1)).as("last_s"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X80 fill-in-the-middle transformation (Bavarian et al. 2022):
    // PSM re-encoding <PRE>p<SUF>s<MID>m at two character offsets,
    // applied to 3/4 of the corpus (doc_id % 4 = 3 passes through —
    // the paper's partial-transform recipe). Offsets are doc_id
    // arithmetic so the oracle replays the exact cuts; the
    // hash-offset production helper (applyFim) is spec-covered.
    "x80_fim_transform" -> ((s, d) => {
      val n = length(col("text"))
      val a = (col("doc_id") * 7919) % (n + 1)
      val b = a + ((col("doc_id") * 104729) % (n - a + 1))
      val out = when(col("doc_id") % 4 === 3, col("text"))
        .otherwise(graft.operators.Fim.fim(col("text"), a, b))
      t(s, d, "documents")
        .select(col("doc_id"), out.as("fim_text"),
          length(out).cast(LongType).as("n_chars"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X75 malformed-tolerant JSONL ingest (the interchange format LLM
    // corpora actually ship in — Dolma, RedPajama, FineWeb are all
    // jsonl.gz): documents staged as gzip JSON-lines with a
    // deterministically-injected malformed line per doc_id % 17 = 0,
    // read back PERMISSIVE with an explicit schema + corrupt-record
    // quarantine column — bad lines must surface as data (the raw
    // line, FULL value) rather than kill or silently vanish from a
    // 100 TB load. The oracle rebuilds both populations by arithmetic.
    "x75_jsonl_ingest" -> ((s, d) => {
      val p = stageJsonl(s, d)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
        .select(col("doc_id"),
          col("_corrupt_record").isNotNull.as("corrupt"),
          coalesce(col("_corrupt_record"), col("text")).as("payload"))
        .orderBy(asc_nulls_first("doc_id"), col("payload"))
    }),

    // X74 robots.txt crawl politeness (RFC 9309): per-URL allow/deny
    // against a parsed per-host rule table — longest matching pattern
    // wins, allow wins length ties, no matching rule = allowed,
    // malformed URL = NULL verdict. URLs are synthesized by doc_id
    // arithmetic (host site{id%7}, five path shapes incl. query and
    // trailing-slash variants, id%13=0 malformed); the rule fixture
    // exercises wildcard, anchored-$, tie, deny-all, and rule-less
    // hosts. The oracle replays each pattern as its equivalent
    // anchored regex and the same longest-then-allow window.
    "x74_robots" -> ((s, d) => {
      import s.implicits._
      val urls = t(s, d, "documents")
        .select(col("doc_id"), robotsUrl(col("doc_id")).as("url"))
      val rules = robotsRules.toDF("host", "directive", "pattern")
      graft.operators.Robots.verdicts(urls, rules)
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X73 supervised quality classification (multinomial Naive Bayes
    // with add-one smoothing — the model-based quality-filter shape;
    // the unsupervised complement is the x57 perplexity screen). The
    // fixture labels even-doc_id training docs by doc_id % 3; odd docs
    // are scored. Every per-token / prior cost is quantized to LONG
    // before any sum (the x57 convention) and the argmin tie-breaks on
    // (nll, label), so the oracle can replay training AND scoring in
    // full: counts, totals, V, N, smoothed -log2 terms, argmin.
    "x73_nb_classifier" -> ((s, d) => {
      val lab = when(col("doc_id") % 3 === 0, "ref")
        .when(col("doc_id") % 3 === 1, "web").otherwise("junk")
      val m = graft.operators.TextClassifier.modelFor(s"nb:$d",
        t(s, d, "documents").where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), lab.as("label"), col("text")))
      graft.operators.TextClassifier.classify(
          t(s, d, "documents").where(col("doc_id") % 2 === 1), m)
        .select(col("doc_id"), col("pred_label"),
          col("nll_e4").cast(LongType).as("nll_e4"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X72 CDX-style WARC index + ranged fetch: the selective-access
    // path a 100 TB archive corpus is actually queried through. One
    // full scan builds a columnar member index (file, offset, length +
    // CDX metadata); every later query filters the SMALL index — here
    // "200-OK responses whose doc_id % 3 = 0" — and fetchAt seek-reads
    // exactly those compressed members, never touching the rest of the
    // archives. The oracle recomputes the expected record set and
    // extracted text purely from documents-table arithmetic (the x71
    // pattern), so index construction, offset arithmetic, ranged
    // reads, and the HTTP split must all be exact for the values to
    // match.
    "x72_warc_index" -> ((s, d) => {
      val p = stageWarc(s, d)
      val idx = graft.sources.Warc.buildIndex(s, p)
      val wanted = idx
        .where(col("warc_type") === "response" && col("http_status") === 200)
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "item([0-9]+)$", 1).cast(LongType))
        .where(col("doc_id") % 3 === 0)
      // persist before the global sort: ORDER BY's range partitioner
      // runs a SAMPLING job over its child first, and an unpinned
      // child would re-run the whole archive walk + seek-read lineage
      // for it — the sampling pass now fills the cache, the sort
      // reads it (one physical fetch instead of two)
      graft.sources.Warc.fetchAt(s, wanted)
        .select(
          regexp_extract(col("target_uri"), "item([0-9]+)$", 1)
            .cast(LongType).as("doc_id"),
          col("target_uri"),
          col("warc_date").cast(LongType).as("fetch_epoch"),
          col("http_status"),
          Text.htmlExtract(decode(col("body"), "UTF-8")).as("extracted"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X65 Unicode/text ingest normalization: NFC canonical composition
    // (decomposed `e`+U+0301 must equal `é` before any fingerprint or
    // n-gram signal sees the text) plus the cleanup walk (strip C0/DEL
    // controls keeping \n \t, CRLF → LF, collapse space/tab runs,
    // trim edge spaces). The fixture text is ASCII, so the gate
    // decorates it with deterministic Unicode suffixes keyed by
    // doc_id % 6 (the x31 pattern); the oracle rebuilds the identical
    // raw string via chr() arithmetic and replays NFC with DuckDB's
    // own nfc_normalize and the cleanup as the equivalent regex
    // pipeline — FULL-value oracle on both output strings.
    "x65_nfc_normalize" -> ((s, d) => {
      val deco = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(array(nfcVariants.map(lit): _*),
            (col("doc_id") % 6).cast("int") + 1)).as("raw"))
      deco.select(col("doc_id"),
          Text.nfc(col("raw")).as("nfc"),
          length(Text.nfc(col("raw"))).cast(LongType).as("n_nfc"),
          Text.normalizeText(col("raw")).as("clean"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X97 registrable domains under the FULL publicsuffix.org
    // algorithm: hosts synthesized by doc_id arithmetic exercise an
    // exact multi-label rule the old 12-entry subset missed (com.tr),
    // a second one (co.kr), a WILDCARD ccTLD (*.kh — every 2nd-level
    // label is a registry), the wildcard EXCEPTION (!www.ck), a
    // classic exact rule (co.uk), and the implicit default (.org).
    // The oracle replays the expected domain per fixture case with
    // the same arithmetic — the algorithm's verdicts, value-for-value.
    "x97_psl_domains" -> ((s, d) => {
      val id = col("doc_id")
      val host = when(id % 6 === 0,
          concat(lit("www.shop"), id, lit(".example.com.tr")))
        .when(id % 6 === 1, concat(lit("a.b.site"), id, lit(".co.kr")))
        .when(id % 6 === 2, concat(lit("x.gov"), id, lit(".kh")))
        .when(id % 6 === 3, concat(lit("foo"), id, lit(".www.ck")))
        .when(id % 6 === 4, concat(lit("blog.example"), id, lit(".co.uk")))
        .otherwise(concat(lit("plain"), id, lit(".org")))
      t(s, d, "documents")
        .select(col("doc_id"), host.as("host"),
          graft.functions.Url.registrableDomain(host).as("domain"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X97b the PSL PRIVATE section (bundled psl_snapshot.dat through
    // the SuffixRules.parse seam): hosted-platform suffixes where
    // each subdomain is an independent publisher — an exact private
    // rule (github.io), the blogspot family, a private WILDCARD
    // (*.compute.amazonaws.com), a deep exact rule (s3.amazonaws.com),
    // and pages.dev; doc_id % 31 = 0 rows probe the host-IS-a-suffix
    // edge (returns itself). Without these rules domain caps and
    // temperature mixing would treat every github.io site as one
    // domain.
    "x97b_psl_private" -> ((s, d) => {
      val id = col("doc_id")
      val host = when(id % 31 === 0, lit("github.io"))
        .when(id % 5 === 0, concat(lit("docs.user"), id, lit(".github.io")))
        .when(id % 5 === 1, concat(lit("my.site"), id, lit(".blogspot.com")))
        .when(id % 5 === 2,
          concat(lit("a.b"), id, lit(".eu-west-1.compute.amazonaws.com")))
        .when(id % 5 === 3, concat(lit("bucket"), id, lit(".s3.amazonaws.com")))
        .otherwise(concat(lit("app"), id, lit(".pages.dev")))
      t(s, d, "documents")
        .select(col("doc_id"), host.as("host"),
          graft.functions.Url.registrableDomain(host).as("domain"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X89 SFT chat-template rendering + loss masks: conversations
    // synthesized from documents (system + user + assistant, a second
    // user/assistant exchange when doc_id % 3 = 0) rendered into the
    // public ChatML framing, with half-open char ranges over exactly
    // the assistant turns' content — the spans an SFT trainer computes
    // loss on. FULL-value oracle: the identical string assembly plus
    // the mask arithmetic from the same part lengths. Map-side only;
    // the fold is a per-row HOF over a short turn array.
    "x89_sft_render" -> ((s, d) => {
      val sys = lit("you are a helpful assistant.")
      val u1 = expr("substring(text, 1, 40)")
      val a1 = expr("substring(text, 41)")
      val u2 = lit("please continue.")
      val a2 = expr("substring(text, 1, 25)")
      def turn(role: String, content: org.apache.spark.sql.Column) =
        struct(lit(role).as("role"), content.as("content"))
      val turns = when(col("doc_id") % 3 === 0,
        array(turn("system", sys), turn("user", u1), turn("assistant", a1),
          turn("user", u2), turn("assistant", a2)))
        .otherwise(array(turn("system", sys), turn("user", u1),
          turn("assistant", a1)))
      graft.operators.Sft.render(
          t(s, d, "documents").select(col("doc_id"), turns.as("turns")))
        .select(col("doc_id"), col("text"),
          graft.operators.Sft.maskSpec(col("masks")).as("mask_spec"),
          col("masked_chars"))
        .orderBy(asc_nulls_first("doc_id"))
    }),
  )

  /** x71 staging: the documents table serialized as a WARC corpus —
    * 8 `.warc.gz` files of concatenated per-record gzip members (the
    * public Common Crawl layout), each response carrying the x68 HTML
    * as an HTTP/1.1 message. Staged once per dataset dir (the copy is
    * setup, not the operator) on disk tmp for the same reason as
    * [[GateSupport.stageEvents]]. The raw java.io writes assume the
    * harness's single-host executors (unlike the Spark-writer stage
    * helpers) — WARC member bytes have no DataFrame writer; writes go
    * through an attempt-unique temp file + rename so task retries
    * cannot corrupt a member stream. */
  /** x75 staging: documents as a gzip JSON-lines corpus, with one
    * deterministically malformed line per doc_id % 17 = 0 (the
    * quarantine population the gate must surface verbatim). Spark
    * text writer — the staging itself is distributed. */
  private val stagedJsonlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageJsonl(s: SparkSession, d: String): String =
    stagedJsonlCache.computeIfAbsent(d, _ => {
      val p = sessionTempDir("graft_jsonl_stage")
      t(s, d, "documents")
        .select(when(col("doc_id") % 17 === 0,
            concat(lit("{bad json line "), col("doc_id"), lit("}")))
          .otherwise(to_json(struct(col("doc_id"), col("text")))).as("value"))
        .repartition(8)
        .write.mode("overwrite").option("compression", "gzip").text(p)
      p
    })

  private val stagedWarcCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageWarc(s: SparkSession, d: String): String =
    stagedWarcCache.computeIfAbsent(d, _ => {
      val p = sessionTempDir("graft_warc_stage")
      t(s, d, "documents")
        .select(col("doc_id"), htmlFixture(col("doc_id"), col("text")).as("html"))
        // 32 archives, not 8: buildIndex is one task per file
        // (members are only discoverable sequentially), so the
        // fixture must carry at least a core's worth of files for
        // the x71/x72 measurements to exercise the intended
        // file-parallel layout (a real crawl dump is thousands of
        // archives); gate outputs are file-layout invariant
        .repartition(32)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          import graft.sources.Warc
          val tc = org.apache.spark.TaskContext.get()
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = new java.io.File(p, f"part-$pid%05d.warc.gz")
          // attempt-unique temp + rename: a retried/speculative task
          // must never interleave bytes into the final file (the
          // never-throw parser would read the corrupt prefix as a
          // short file, not an error)
          val tmp = new java.io.File(p,
            f".part-$pid%05d.${if (tc == null) 0L else tc.taskAttemptId()}%d.tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp), 1 << 16)
          try it.foreach { r =>
            val id = r.getLong(0)
            val uri = s"https://site${id % 7}.example.com/item$id"
            val date = java.time.Instant.ofEpochSecond(1700000000L + id).toString
            if (id % 5 == 0)
              out.write(Warc.gzipMember(Warc.writeRecord(
                Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri,
                  "WARC-Date" -> date,
                  "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-4000-8000-req$id%09d>",
                  "Content-Type" -> "application/http; msgtype=request"),
                Warc.httpRequestBytes("GET", s"/item$id", s"site${id % 7}.example.com"))))
            val status = if (id % 11 == 0) 404 else 200
            out.write(Warc.gzipMember(Warc.writeRecord(
              Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
                "WARC-Date" -> date,
                "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-4000-8000-rsp$id%09d>",
                "Content-Type" -> "application/http; msgtype=response"),
              Warc.httpResponseBytes(status, if (status == 200) "OK" else "Not Found",
                "text/html; charset=utf-8",
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
          } finally out.close()
          if (!tmp.renameTo(f)) {
            if (f.exists()) tmp.delete() // lost to another attempt — fine
            else throw new java.io.IOException(s"rename $tmp -> $f failed")
          }
          ()
        }
      p
    })

  /** x66/x70 URL fixture by doc_id arithmetic: mixed case,
    * default/explicit/out-of-range ports, tracking params, fragments,
    * a co.uk multi-part TLD, and junk/malformed variants. The x66
    * oracle replays the identical CASE arithmetic in SQL. */
  private def urlFixture(id: Column): Column = {
    val built = concat(
      when(id % 2 === 0, "http").otherwise("HTTPS"), lit("://"),
      when(id % 3 === 0, "WWW.").when(id % 3 === 1, "").otherwise("blog."),
      lit("Site"), (id % 7).cast("string"), lit(".Example."),
      when(id % 4 === 0, "COM").when(id % 4 === 1, "org")
        .when(id % 4 === 2, "co.uk").otherwise("net"),
      when(id % 7 === 5, ":70000") // out-of-range port -> NULL path
        .when(id % 5 === 0, ":443").when(id % 5 === 1, ":8080")
        .when(id % 5 === 2, ":80").otherwise(""),
      lit("/Articles/Item"), id.cast("string"),
      when(id % 3 === 0, "/").otherwise(""),
      when(id % 4 === 0, concat(lit("?utm_source=feed&b=2&a="), (id % 3).cast("string")))
        .when(id % 4 === 1, "?z=9&gclid=abc&a=1")
        .when(id % 4 === 2, "?ref=tw").otherwise(""),
      when(id % 6 === 0, "#section-2").otherwise(""))
    when(id % 7 === 6, concat(lit("junk:"), id.cast("string"))).otherwise(built)
  }

  /** x68/x70 HTML fixture wrapping the document text: title/style/
    * script/comment/entity variants by doc_id arithmetic; script
    * bodies contain < and > so element removal must precede tag
    * stripping. The x68 oracle replays the identical concat. */
  private def htmlFixture(id: Column, text: Column): Column = concat(
    lit("<!DOCTYPE html><html><head><title>Doc "), id.cast("string"),
    lit("</title>"),
    when(id % 3 === 0,
      "<style type=\"text/css\">body { color: red; }</style>").otherwise(""),
    lit("</head><body>"),
    when(id % 4 === 0, "<script>var x = 1 < 2 && 2 > 1;</script>").otherwise(""),
    lit("<!-- comment "), id.cast("string"), lit(" -->"),
    lit("<h1>Title &amp; "), (id % 9).cast("string"), lit("</h1><p>"),
    text, lit("</p>"),
    when(id % 5 === 0,
      "<p>A &lt;tag&gt; &quot;quoted&quot; &#39;s&nbsp;end</p>").otherwise(""),
    lit("</body></html>"))

  /** x65 fixture decorations: deterministic Unicode suffixes keyed by
    * doc_id % 6 — decomposed Latin (NFC must compose), a C0 control
    * char, precomposed accents (NFC identity), tab/space runs, CRLF,
    * and non-Latin NFC-invariant text. Single source of truth for the
    * Spark side (`lit`) and the oracle ([[GateSupport.sqlStr]] renders
    * non-ASCII as chr() concatenation). */
  private val nfcVariants: Seq[String] = Seq(
    "Cafe\u0301 du  Monde",                    // e + combining acute -> e-acute
    "u\u0308ber\tU\u0308BER done",             // decomposed umlauts + tab
    "A\u030Angstro\u0308m \u0001 unit",        // decomposed Aring/odiaeresis + C0 control
    "caf\u00e9 d\u00e9j\u00e0 vu ",            // precomposed - NFC identity
    "\u0645\u0631\u062d\u0628\u0627  hello",   // Arabic - NFC-invariant
    "line1\r\nline2  end")

  private lazy val x68Oracle: String =
    """WITH h AS (
           SELECT doc_id,
             '<!DOCTYPE html><html><head><title>Doc ' || doc_id || '</title>' ||
             (CASE WHEN doc_id % 3 = 0
                   THEN '<style type="text/css">body { color: red; }</style>'
                   ELSE '' END) ||
             '</head><body>' ||
             (CASE WHEN doc_id % 4 = 0
                   THEN '<script>var x = 1 < 2 && 2 > 1;</script>'
                   ELSE '' END) ||
             '<!-- comment ' || doc_id || ' -->' ||
             '<h1>Title &amp; ' || (doc_id % 9) || '</h1><p>' || text || '</p>' ||
             (CASE WHEN doc_id % 5 = 0
                   THEN '<p>A &lt;tag&gt; &quot;quoted&quot; &#39;s&nbsp;end</p>'
                   ELSE '' END) ||
             '</body></html>' AS html
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(regexp_replace(
             nfc_normalize(
               replace(replace(replace(replace(replace(replace(replace(
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                   '(?s)<!--.*?-->', ' ', 'g'),
                   '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                 '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&')),
             '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'), '[ \t]+', ' ', 'g')) AS extracted
         FROM h ORDER BY doc_id NULLS FIRST"""

  private lazy val x66Oracle: String = {
      val tldList = graft.expressions.NativeUrl.multiPartTlds.toSeq.sorted
        .map(t => s"'$t'").mkString(", ")
      s"""WITH raw AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 6 THEN 'junk:' || doc_id ELSE
               (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTPS' END) || '://' ||
               (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'WWW.' WHEN 1 THEN '' ELSE 'blog.' END) ||
               'Site' || (doc_id % 7) || '.Example.' ||
               (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'COM' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk' ELSE 'net' END) ||
               (CASE WHEN doc_id % 7 = 5 THEN ':70000'
                     ELSE (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN ':443' WHEN 1 THEN ':8080' WHEN 2 THEN ':80' ELSE '' END) END) ||
               '/Articles/Item' || doc_id ||
               (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
               (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '?utm_source=feed&b=2&a=' || (doc_id % 3)
                     WHEN 1 THEN '?z=9&gclid=abc&a=1'
                     WHEN 2 THEN '?ref=tw' ELSE '' END) ||
               (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)
             END AS url
           FROM documents),
         parsed AS (
           SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(url, '^[^#]*\\?([^#]*)', 1) AS query
           FROM raw),
         np AS (
           SELECT doc_id, scheme, auth, path, query,
             (scheme <> '' AND auth <> ''
              AND (regexp_extract(auth, ':([0-9]+)$$', 1) = ''
                   OR TRY_CAST(regexp_extract(auth, ':([0-9]+)$$', 1) AS BIGINT) <= 65535)) AS ok,
             CASE WHEN regexp_matches(auth, ':[0-9]+$$')
                  THEN lower(regexp_extract(auth, '^(.*):[0-9]+$$', 1))
                  ELSE lower(auth) END AS host,
             regexp_extract(auth, ':([0-9]+)$$', 1) AS port
           FROM parsed),
         built AS (
           SELECT doc_id, ok, scheme,
             CASE WHEN host = '' THEN NULL ELSE host END AS host,
             scheme || '://' || host ||
             (CASE WHEN port <> '' AND NOT ((scheme = 'http' AND TRY_CAST(port AS BIGINT) = 80)
                                         OR (scheme = 'https' AND TRY_CAST(port AS BIGINT) = 443))
                   THEN ':' || TRY_CAST(port AS BIGINT) ELSE '' END) ||
             (CASE WHEN regexp_replace(path, '/+$$', '') = '' THEN '/'
                   ELSE regexp_replace(path, '/+$$', '') END) ||
             (CASE WHEN len(list_sort(list_filter(string_split(query, '&'),
                     x -> x <> '' AND NOT regexp_matches(x, '^utm_')
                       AND NOT regexp_matches(x, '^(fbclid|gclid|msclkid|ref)(=|$$)')))) > 0
                   THEN '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
                     x -> x <> '' AND NOT regexp_matches(x, '^utm_')
                       AND NOT regexp_matches(x, '^(fbclid|gclid|msclkid|ref)(=|$$)'))), '&')
                   ELSE '' END) AS norm
           FROM np),
         dom AS (
           SELECT doc_id, ok, scheme, host, norm,
             CASE WHEN host IS NULL THEN NULL
                  WHEN len(string_split(host, '.')) >= 3
                       AND (string_split(host, '.')[len(string_split(host, '.')) - 1]
                            || '.' || string_split(host, '.')[len(string_split(host, '.'))])
                           IN ($tldList)
                  THEN string_split(host, '.')[len(string_split(host, '.')) - 2] || '.' ||
                       string_split(host, '.')[len(string_split(host, '.')) - 1] || '.' ||
                       string_split(host, '.')[len(string_split(host, '.'))]
                  WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[len(string_split(host, '.')) - 1]
                       || '.' || string_split(host, '.')[len(string_split(host, '.'))]
                  ELSE host END AS domain
           FROM built)
         SELECT doc_id,
           CASE WHEN ok THEN norm ELSE NULL END AS url_norm,
           CASE WHEN ok THEN host ELSE NULL END AS host,
           CASE WHEN ok THEN domain ELSE NULL END AS domain,
           CASE WHEN NOT ok THEN FALSE
                ELSE (scheme IN ('http', 'https') AND domain <> 'example.net') END AS keep
         FROM dom ORDER BY doc_id NULLS FIRST"""
    }

  def oracleSql: Map[String, String] = Map(
    // per-case replay of the PSL algorithm's expected verdicts:
    // exact rules take label+suffix, the wildcard takes label+2, the
    // exception IS the registrable name, default rule takes last two
    "x97_psl_domains" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN 'www.shop' || doc_id || '.example.com.tr'
             WHEN 1 THEN 'a.b.site' || doc_id || '.co.kr'
             WHEN 2 THEN 'x.gov' || doc_id || '.kh'
             WHEN 3 THEN 'foo' || doc_id || '.www.ck'
             WHEN 4 THEN 'blog.example' || doc_id || '.co.uk'
             ELSE 'plain' || doc_id || '.org' END AS host,
           CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN 'example.com.tr'
             WHEN 1 THEN 'site' || doc_id || '.co.kr'
             WHEN 2 THEN 'x.gov' || doc_id || '.kh'
             WHEN 3 THEN 'www.ck'
             WHEN 4 THEN 'example' || doc_id || '.co.uk'
             ELSE 'plain' || doc_id || '.org' END AS domain
         FROM documents
         ORDER BY doc_id NULLS FIRST""",
    // private-section replay: exact rules take label+suffix, the
    // wildcard *.compute.amazonaws.com takes label+region+suffix, a
    // host that IS a suffix returns itself
    "x97b_psl_private" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 31 = 0 THEN 'github.io'
                WHEN doc_id % 5 = 0 THEN 'docs.user' || doc_id || '.github.io'
                WHEN doc_id % 5 = 1 THEN 'my.site' || doc_id || '.blogspot.com'
                WHEN doc_id % 5 = 2 THEN 'a.b' || doc_id || '.eu-west-1.compute.amazonaws.com'
                WHEN doc_id % 5 = 3 THEN 'bucket' || doc_id || '.s3.amazonaws.com'
                ELSE 'app' || doc_id || '.pages.dev' END AS host,
           CASE WHEN doc_id % 31 = 0 THEN 'github.io'
                WHEN doc_id % 5 = 0 THEN 'user' || doc_id || '.github.io'
                WHEN doc_id % 5 = 1 THEN 'site' || doc_id || '.blogspot.com'
                WHEN doc_id % 5 = 2 THEN 'b' || doc_id || '.eu-west-1.compute.amazonaws.com'
                WHEN doc_id % 5 = 3 THEN 'bucket' || doc_id || '.s3.amazonaws.com'
                ELSE 'app' || doc_id || '.pages.dev' END AS domain
         FROM documents
         ORDER BY doc_id NULLS FIRST""",
    // identical ChatML assembly + mask arithmetic from the same part
    // lengths: turn length = 24 + len(role) + len(content); assistant
    // content starts 22 chars into its turn (12 tag + 9 role + 1 \n)
    "x89_sft_render" ->
      """WITH parts AS (
           SELECT doc_id,
                  'you are a helpful assistant.' AS sys,
                  substr(text, 1, 40) AS u1,
                  substr(text, 41) AS a1,
                  'please continue.' AS u2,
                  substr(text, 1, 25) AS a2,
                  doc_id % 3 = 0 AS five
           FROM documents),
         r AS (
           SELECT doc_id, five, a1, a2,
             '<|im_start|>system' || chr(10) || sys || '<|im_end|>' || chr(10) ||
             '<|im_start|>user' || chr(10) || u1 || '<|im_end|>' || chr(10) ||
             '<|im_start|>assistant' || chr(10) || a1 || '<|im_end|>' || chr(10) ||
             CASE WHEN five THEN
               '<|im_start|>user' || chr(10) || u2 || '<|im_end|>' || chr(10) ||
               '<|im_start|>assistant' || chr(10) || a2 || '<|im_end|>' || chr(10)
             ELSE '' END AS text,
             24 + 6 + length(sys) AS t1,
             24 + 4 + length(u1) AS t2,
             24 + 9 + length(a1) AS t3,
             24 + 4 + length(u2) AS t4
           FROM parts),
         m AS (
           SELECT doc_id, text, five,
                  length(a1) AS la1, length(a2) AS la2,
                  t1 + t2 + 22 AS m1s,
                  t1 + t2 + 22 + length(a1) AS m1e,
                  t1 + t2 + t3 + t4 + 22 AS m2s,
                  t1 + t2 + t3 + t4 + 22 + length(a2) AS m2e
           FROM r)
         SELECT doc_id, text,
                CASE WHEN five THEN
                  CAST(m1s AS VARCHAR) || ':' || CAST(m1e AS VARCHAR) ||
                  ';' || CAST(m2s AS VARCHAR) || ':' || CAST(m2e AS VARCHAR)
                ELSE CAST(m1s AS VARCHAR) || ':' || CAST(m1e AS VARCHAR)
                END AS mask_spec,
                CAST(la1 + CASE WHEN five THEN la2 ELSE 0 END AS BIGINT)
                  AS masked_chars
         FROM m ORDER BY doc_id NULLS FIRST""",
    "x15_word_counts" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
           SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '')) AS word
           FROM documents) t
         GROUP BY word ORDER BY n DESC, word NULLS FIRST LIMIT 20""",
    "x07_lang_id" -> {
      val scores = Text.stopwordSets.map { case (lang, ws) =>
        s"len(list_intersect(list_distinct(ts), ${sqlList(ws)})) AS s_$lang"
      }.mkString(",\n                ")
      val langsDesc = Text.stopwordSets.map(_._1).sorted.reverse
      val mx = Text.stopwordSets.map(s => "s_" + s._1).mkString("GREATEST(", ", ", ")")
      val pick = langsDesc.init.map(l => s"WHEN s_$l = $mx THEN '$l'")
        .mkString("\n                ") + s"\n                ELSE '${langsDesc.last}'"
      s"""WITH $tokCte,
         sc AS (SELECT doc_id, text,
                $scores
                FROM tok)
         SELECT doc_id,
           CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                WHEN $mx = 0 THEN 'und'
                $pick END AS lang_pred
         FROM sc ORDER BY doc_id NULLS FIRST"""
    },
    "x08_quality_score" ->
      s"""WITH $tokCte,
         $entCte,
         $punctCte,
         sr AS (
           SELECT doc_id, len(ts) AS n_tok,
                  CASE WHEN len(ts) > 0 THEN
                    ROUND(CAST(len(list_filter(ts,
                          t -> list_contains(${sqlList(Text.enStopwords)}, t)))
                      AS DOUBLE) / len(ts), 4)
                  ELSE 0.0 END AS stopword_ratio
           FROM tok)
         SELECT d.doc_id, pr.punct_ratio, sr.stopword_ratio,
                COALESCE(ent.entropy, 0.0) AS entropy,
                ROUND(
                  LEAST(CASE WHEN sr.n_tok BETWEEN 20 AND 5000 THEN 1.0
                             WHEN sr.n_tok > 0 THEN sr.n_tok / 20.0
                             ELSE 0.0 END, 1.0) * 0.4 +
                  (1.0 - LEAST(pr.punct_ratio * 5.0, 1.0)) * 0.3 +
                  LEAST(sr.stopword_ratio * 4.0, 1.0) * 0.3, 4) AS quality
         FROM documents d
         JOIN pr USING (doc_id) JOIN sr USING (doc_id)
         LEFT JOIN ent USING (doc_id)
         ORDER BY doc_id NULLS FIRST""",
    "x19_curation" ->
      s"""WITH $tokCte,
         $entCte,
         $punctCte,
         $curationRulesCte
         SELECT doc_id, n_tok, entropy, top_bigram_frac, dup_ngram_frac,
                dup_line_frac,
                CAST(to_json(reasons) AS VARCHAR) AS drop_reasons,
                len(reasons) = 0 AS keep
         FROM rs ORDER BY doc_id NULLS FIRST""",
    // same oracle by design: the UDAF must reproduce the window result
    "x21_topk_udaf" -> knnOracleSql,
    // 80-token windows, step 60: chunk count = 1 if n<=80 else
    // 1+ceil((n-80)/60); chunk k covers tokens [k*60+1, min(k*60+80,n)]
    "x22_chunking" ->
      """WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents),
         cc AS (
           SELECT doc_id, ts, len(ts) AS n,
                  CASE WHEN len(ts) = 0 THEN 0
                       WHEN len(ts) <= 80 THEN 1
                       ELSE 1 + CAST(ceil(CAST(len(ts) - 80 AS DOUBLE) / 60) AS INT)
                  END AS c
           FROM tk),
         ch AS (SELECT doc_id, unnest(range(c)) AS k, ts, n FROM cc WHERE c > 0),
         ck AS (
           SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
                  array_to_string(ts[CAST(k*60+1 AS INT) :
                                     CAST(least(k*60+80, n) AS INT)], ' ') AS chunk
           FROM ch)
         SELECT doc_id, chunk_id,
                CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok, chunk
         FROM ck
         ORDER BY doc_id NULLS FIRST, chunk_id NULLS FIRST""",
    // Okapi BM25 replay: same tokenizer as x15/x43, same smoothed
    // Robertson idf and k1=1.2 / b=0.75 saturation; 2-decimal rounded
    // score as the selection key (coarse grid — engines sum the float
    // contributions in different orders)
    "x46_bm25_topk" ->
      """WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '') AS ts
           FROM documents),
         stats AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  AVG(CAST(len(ts) AS DOUBLE)) AS avgdl FROM tk),
         f AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
                      unnest(ts) AS term FROM tk),
         tf AS (
           SELECT doc_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
           FROM f WHERE term IN ('window', 'column', 'scan')
           GROUP BY doc_id, term, dl),
         df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id,
                  SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)))
                    AS score
           FROM tf JOIN df USING (term), stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, ROUND(score, 2) AS score FROM sc
         ORDER BY ROUND(score, 2) DESC, doc_id NULLS FIRST LIMIT 10""",
    "x09_token_count" ->
      """SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(
                list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword,
         CAST(length(text) AS BIGINT) AS n_chars_calc
         FROM documents ORDER BY doc_id NULLS FIRST""",
    // doc count recomputed from the data; the three algebraic bounds
    // pinned TRUE (merge ranks themselves are not SQL-replayable —
    // x61 is rows-only by declared design, this is its backstop)
    "x61b_bpe_audit" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS recon_ok,
                TRUE AS lower_bound_ok, TRUE AS compresses
         FROM documents WHERE doc_id >= 300""",
    // full training + scoring replay: bigram counts with multiplicity
    // from the train half, context totals as the bigram-table
    // reaggregation, V = distinct train tokens, then the identical
    // smoothed -log2 quantized per transition and integer-summed
    "x57_lm_perplexity" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '') AS ts
           FROM documents),
         trg AS (
           SELECT w.a AS a, w.b AS b FROM (
             SELECT unnest(list_transform(range(1, len(ts)),
               i -> {'a': ts[CAST(i AS INT)], 'b': ts[CAST(i AS INT) + 1]})) AS w
             FROM tk WHERE doc_id < 300 AND len(ts) >= 2)),
         big AS (SELECT a, b, COUNT(*) AS c_big FROM trg GROUP BY a, b),
         ctx AS (SELECT a, SUM(c_big) AS c_ctx FROM big GROUP BY a),
         v AS (SELECT COUNT(DISTINCT u) AS v FROM (
                 SELECT unnest(ts) AS u FROM tk WHERE doc_id < 300)),
         g AS (
           SELECT doc_id, w.a AS a, w.b AS b FROM (
             SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> {'a': ts[CAST(i AS INT)], 'b': ts[CAST(i AS INT) + 1]})) AS w
             FROM tk WHERE doc_id >= 300 AND len(ts) >= 2)),
         sc AS (
           SELECT g.doc_id,
                  CAST(floor(-ln((COALESCE(bc.c_big, 0) + 1.0) /
                                 (COALESCE(cc.c_ctx, 0) + v.v)) / ln(2.0)
                             * 10000 + 0.5) AS BIGINT) AS e4
           FROM g LEFT JOIN big bc ON bc.a = g.a AND bc.b = g.b
                  LEFT JOIN ctx cc ON cc.a = g.a
                  CROSS JOIN v)
         SELECT doc_id, CAST(SUM(e4) AS BIGINT) AS nll_e4,
                CAST(COUNT(*) AS BIGINT) AS n_bigrams
         FROM sc GROUP BY doc_id ORDER BY doc_id NULLS FIRST""",
    // same generator arithmetic; keep = blank OR first occurrence,
    // survivors re-joined in line order
    "x55_dedup_lines" ->
      """WITH lines AS (
           SELECT CAST(g.i AS BIGINT) AS i, CAST(h.j AS BIGINT) AS j,
                  CASE WHEN h.j % 4 = 3 THEN ''
                       ELSE 'line ' || CAST((g.i * 7 + h.j * h.j) % 5 AS VARCHAR)
                  END AS l
           FROM (SELECT unnest(range(200)) AS i) g,
                (SELECT unnest(range(12)) AS j) h),
         marked AS (
           SELECT i, j, l,
                  trim(l) = '' OR
                  ROW_NUMBER() OVER (PARTITION BY i, l ORDER BY j) = 1 AS keep
           FROM lines)
         SELECT i,
                COALESCE(string_agg(CASE WHEN keep THEN l END, chr(10)
                                    ORDER BY j), '') AS kept_text,
                CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                  AS n_removed
         FROM marked GROUP BY i ORDER BY i NULLS FIRST""",
    "x31_pii_scrub" -> {
      val em = graft.functions.Text.emailRe
      val ip = graft.functions.Text.ipv4Re
      val ph = graft.functions.Text.phoneRe
      s"""WITH g AS (SELECT unnest(range(50)) AS i),
         r AS (SELECT i,
                 'user' || i || ' wrote from 10.0.' || (i % 256) || '.' ||
                 ((i * 7) % 256) || ' contact user' || i ||
                 '@example.com or call 555-123-' ||
                 lpad(CAST((i * 37) % 10000 AS VARCHAR), 4, '0') ||
                 ' about the weather' AS raw
               FROM g)
         SELECT i,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')
             AS clean,
           CAST(len(regexp_extract_all(raw, '$em')) AS BIGINT) AS emails,
           CAST(len(regexp_extract_all(regexp_replace(raw, '$em', '', 'g'),
             '$ip')) AS BIGINT) AS ips,
           CAST(len(regexp_extract_all(regexp_replace(regexp_replace(raw,
             '$em', '', 'g'), '$ip', '', 'g'), '$ph')) AS BIGINT) AS phones
         FROM r ORDER BY i NULLS FIRST"""
    },

    // Full replay of the dup-n-gram coverage semantics via the shared
    // chain builder (ONE SQL definition with x19/x25 — see
    // GateSupport.dupNgramChainCte): window grams, ≥2 duplicate
    // detection, DISTINCT position coverage union, round4 formula.
    "x62_dup_ngrams" ->
      s"""WITH $tokCte,
         $dupNgramBaseCte,
         ${dupNgramChainCte(2)},
         ${dupNgramChainCte(3)}
         SELECT k.doc_id, f2.dup2_frac, f3.dup3_frac
         FROM tok k
           JOIN f2 USING (doc_id)
           JOIN f3 USING (doc_id)
         ORDER BY doc_id NULLS FIRST""",

    // Full replay of the cross-doc boilerplate strip: per-doc DISTINCT
    // lines → document frequency → frequent set (df >= 5) → rewrite
    // keeping blank lines and non-frequent occurrences, order kept.
    "x64_boilerplate" ->
      """WITH g AS (SELECT unnest(range(120)) AS i),
         d AS (SELECT i,
                 '=== newsletter header ' || (i % 6) || ' ===' || chr(10) ||
                 'body ' || i || ' first unique line' || chr(10) ||
                 '  ' || chr(10) ||
                 'body ' || i || ' second unique line' || chr(10) ||
                 'unsubscribe at list ' || (i % 6) || ' dot example' AS text
               FROM g),
         dl AS (SELECT i, unnest(list_distinct(string_split(text, chr(10)))) AS line
                FROM d),
         freq AS (SELECT line FROM (
                    SELECT line, COUNT(*) AS c FROM dl
                    WHERE trim(line, ' ') <> '' GROUP BY 1)
                  WHERE c >= 5),
         lp AS (SELECT i, unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1) AS pos
                FROM d),
         kept AS (SELECT i, line, pos FROM lp
                  WHERE trim(line, ' ') = ''
                     OR line NOT IN (SELECT line FROM freq)),
         r AS (SELECT i, string_agg(line, chr(10) ORDER BY pos) AS kept_text,
                      COUNT(*) AS nk
               FROM kept GROUP BY i),
         tot AS (SELECT i, len(string_split(text, chr(10))) AS nl FROM d)
         SELECT CAST(d.i AS BIGINT) AS i,
                COALESCE(r.kept_text, '') AS kept_text,
                CAST(tot.nl - COALESCE(r.nk, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN r USING (i) JOIN tot USING (i)
         ORDER BY i NULLS FIRST""",

    // Full replay of the Unicode normalization: the identical raw
    // string rebuilt via chr() arithmetic (sqlStr keeps combining
    // marks and the control char out of the SQL text), NFC via
    // DuckDB's own nfc_normalize (independent implementation — Java
    // Normalizer vs utf8proc must agree), cleanup as the equivalent
    // strip-controls → collapse-space/tab-runs → trim-spaces regex
    // pipeline the native walk is specified against.
    "x65_nfc_normalize" -> {
      val cases = nfcVariants.zipWithIndex.map { case (v, i) =>
        s"WHEN $i THEN ${sqlStr(v)}"
      }.mkString("\n             ")
      s"""WITH deco AS (
           SELECT doc_id, text || ' ' || CASE CAST(doc_id % 6 AS INT)
             $cases END AS raw
           FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS nfc,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
           trim(regexp_replace(regexp_replace(nfc_normalize(raw),
                '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g'),
                '[ \\t]+', ' ', 'g')) AS clean
         FROM deco ORDER BY doc_id NULLS FIRST"""
    },

    // Full replay of the HTML extraction as the regex pipeline the
    // native walk is specified against: comments, script/style
    // elements (RE2 (?is) + \b boundary + non-greedy body), generic
    // tags, the entity replace chain with &amp; LAST, then the x65
    // cleanup pipeline.
    "x68_html_extract" -> x68Oracle,

    // Full replay of the URL normalization spec as a regex/list
    // pipeline: parse scheme/authority/path/query with RE2 extracts,
    // strip default ports by integer compare (':080' ≡ ':80', the
    // Scala toInt), drop tracking params by NAME (regexp — LIKE's _
    // wildcard would over-match 'utm='), sort + rejoin the rest,
    // trim trailing path slashes, registrable domain over the same
    // multi-part suffix set, blocklist verdict with malformed → false.
    "x66_url_curation" -> x66Oracle,

    // The composed ingest pipeline, with the x66 and x68 oracle
    // texts embedded VERBATIM as subqueries (DuckDB ignores their
    // inner ORDER BY) — the composition re-specifies nothing; only
    // the token count on the extracted text and the conjoined
    // verdict are new.
    "x70_web_ingest" ->
      s"""SELECT u.doc_id, u.url_norm, u.domain, e.n_tok,
           (COALESCE(u.keep, FALSE) AND e.n_tok >= 10) AS keep
         FROM ($x66Oracle) u
         JOIN (SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(extracted, '\\s+'),
                          x -> x <> '')) AS BIGINT) AS n_tok
               FROM ($x68Oracle)) e USING (doc_id)
         ORDER BY u.doc_id NULLS FIRST""",

    // The WARC ingest roundtrip: the oracle never sees the archive —
    // it recomputes the logical record content by the same doc_id
    // arithmetic the staging used (URI, fetch epoch, status) and
    // takes the extracted text from the x68 oracle verbatim. Any
    // framing, gunzip, type-filter, date-parse, or payload defect in
    // the reader shows up as a value mismatch here.
    "x71_warc_ingest" ->
      s"""SELECT d.doc_id,
           'https://site' || (d.doc_id % 7) || '.example.com/item' || d.doc_id
             AS target_uri,
           CAST(1700000000 + d.doc_id AS BIGINT) AS fetch_epoch,
           CAST(CASE WHEN d.doc_id % 11 = 0 THEN 404 ELSE 200 END AS INTEGER)
             AS http_status,
           e.extracted
         FROM documents d JOIN ($x68Oracle) e USING (doc_id)
         ORDER BY d.doc_id NULLS FIRST""",

    // identical marker-replace pipeline in RE2; list indexing for
    // first/last (out-of-range -> NULL matches the guarded Spark side)
    "x84_sentences" ->
      """WITH sp AS (
           SELECT doc_id,
                  list_filter(
                    string_split(
                      regexp_replace(text, '([.!?]+) +([A-Z0-9])',
                                     '\1' || chr(1) || '\2', 'g'),
                      chr(1)),
                    x -> x <> '') AS ss
           FROM documents)
         SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_sent,
                ss[1] AS first_s, ss[len(ss)] AS last_s
         FROM sp ORDER BY doc_id NULLS FIRST""",

    // same split arithmetic, same PSM concatenation, replayed in SQL
    "x80_fim_transform" ->
      """WITH s AS (
           SELECT doc_id, text, length(text) AS n,
                  (doc_id * 7919) % (length(text) + 1) AS a
           FROM documents),
         s2 AS (
           SELECT doc_id, text, n, a,
                  a + ((doc_id * 104729) % (n - a + 1)) AS b
           FROM s),
         o AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 4 = 3 THEN text
                       ELSE '<PRE>' || substr(text, 1, CAST(a AS INT)) ||
                            '<SUF>' || substr(text, CAST(b + 1 AS INT),
                                              CAST(n - b AS INT)) ||
                            '<MID>' || substr(text, CAST(a + 1 AS INT),
                                              CAST(b - a AS INT))
                  END AS fim_text
           FROM s2)
         SELECT doc_id, fim_text,
                CAST(length(fim_text) AS BIGINT) AS n_chars
         FROM o ORDER BY doc_id NULLS FIRST""",

    // both populations rebuilt by arithmetic: clean docs carry their
    // text verbatim through the JSON roundtrip, corrupt lines surface
    // as the exact raw line
    "x75_jsonl_ingest" ->
      """SELECT doc_id, FALSE AS corrupt, text AS payload
         FROM documents WHERE doc_id % 17 <> 0
         UNION ALL
         SELECT CAST(NULL AS BIGINT) AS doc_id, TRUE AS corrupt,
                '{bad json line ' || doc_id || '}' AS payload
         FROM documents WHERE doc_id % 17 = 0
         ORDER BY doc_id NULLS FIRST, payload""",

    // rule patterns replayed as anchored regexes; longest-then-allow
    // via ROW_NUMBER; pathq arithmetic mirrors the gate's CASE
    "x74_robots" ->
      s"""WITH $robotsOracleCtes
         SELECT doc_id, allowed FROM verdicts
         ORDER BY doc_id NULLS FIRST""",

    // full NB replay: per-label token counts, totals, V, N, the
    // identical quantized smoothed -log2 per token + prior, integer
    // sums, argmin with the (nll, label) tie-break
    "x73_nb_classifier" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '') AS ts
           FROM documents),
         tr AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN 'ref'
                       WHEN doc_id % 3 = 1 THEN 'web'
                       ELSE 'junk' END AS label, ts
           FROM tk WHERE doc_id % 2 = 0),
         ttok AS (SELECT label, unnest(ts) AS tok FROM tr),
         tokc AS (SELECT label, tok, COUNT(*) AS c_tok FROM ttok
                  GROUP BY label, tok),
         labtot AS (SELECT label, SUM(c_tok) AS n_tokens FROM tokc
                    GROUP BY label),
         labdoc AS (SELECT label, COUNT(*) AS n_docs FROM tr GROUP BY label),
         v AS (SELECT COUNT(DISTINCT tok) AS v FROM ttok),
         n AS (SELECT COUNT(*) AS n FROM tr),
         sc AS (SELECT doc_id, unnest(ts) AS tok FROM tk
                WHERE doc_id % 2 = 1 AND len(ts) >= 1),
         pl AS (
           SELECT s.doc_id, ld.label,
                  CAST(floor(-ln((COALESCE(tc.c_tok, 0) + 1.0) /
                                 (lt.n_tokens + v.v)) / ln(2.0)
                             * 10000 + 0.5) AS BIGINT) AS e4,
                  CAST(floor(-ln(ld.n_docs / CAST(n.n AS DOUBLE)) / ln(2.0)
                             * 10000 + 0.5) AS BIGINT) AS prior_e4
           FROM sc s
           CROSS JOIN labdoc ld
           JOIN labtot lt ON lt.label = ld.label
           LEFT JOIN tokc tc ON tc.label = ld.label AND tc.tok = s.tok
           CROSS JOIN v CROSS JOIN n),
         agg AS (SELECT doc_id, label,
                        SUM(e4) + MIN(prior_e4) AS nll_e4
                 FROM pl GROUP BY doc_id, label)
         SELECT doc_id, label AS pred_label, CAST(nll_e4 AS BIGINT) AS nll_e4
         FROM agg
         QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY nll_e4, label) = 1
         ORDER BY doc_id NULLS FIRST""",

    "x72_warc_index" ->
      s"""SELECT d.doc_id,
           'https://site' || (d.doc_id % 7) || '.example.com/item' || d.doc_id
             AS target_uri,
           CAST(1700000000 + d.doc_id AS BIGINT) AS fetch_epoch,
           CAST(200 AS INTEGER) AS http_status,
           e.extracted
         FROM documents d JOIN ($x68Oracle) e USING (doc_id)
         WHERE d.doc_id % 3 = 0 AND d.doc_id % 11 <> 0
         ORDER BY d.doc_id NULLS FIRST""",
  )
}
