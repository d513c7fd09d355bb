package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text scoring for training-data curation: BM25 relevance,
  * unigram language-model cross-entropy (the classic perplexity-ish
  * quality filter), per-language token entropy, and similarity-graph
  * degree profiling.
  *
  * Determinism: every double expression is written with IDENTICAL
  * operator shape on the Spark and DuckDB sides (same associativity,
  * same casts), per-term values are ROUNDed before any SUM, and sums
  * accumulate in DECIMAL so the result is independent of partition
  * merge order (Dsl rules R1/R2).
  */
object TextScoring extends QueryModule {

  private def words: Column = split(lower(col("text")), " ")
  private val sqlWords = "string_split(lower(text), ' ')"
  /** The corpus-wide stop list (one definition: [[Llm.stopWords]]). */
  private def sqlStopList: String =
    Llm.stopWords.map(w => s"'$w'").mkString("[", ",", "]")

  /** One explode + (doc, tok) aggregate — the shared shuffle every score
    * below derives from (ReuseExchange collapses repeated use). */
  private def tokCounts(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), explode(words).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  private val sqlTok =
    s"tok AS (SELECT doc_id, unnest($sqlWords) AS tok FROM documents)"
  private val sqlTf =
    "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok)"

  /** BM25 (k1=1.2, b=0.75) of every document against the 5 highest-df
    * corpus terms, top-20 docs. Scale shape: the heavy exchange is the
    * single (doc,tok) aggregate; df and the 5-term query set are
    * broadcast; doc length joins on doc_id (same key as tf — co-moves in
    * one exchange); the corpus stats are a 1-row broadcast. Per-term
    * scores are ROUND 6 then DECIMAL-summed per doc (order-independent),
    * so the top-20 is bit-stable across partitionings. */
  val bm25: Q = Q(
    s"""WITH $sqlTok,
       |$sqlTf,
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       |qt AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 5),
       |terms AS (SELECT tf.doc_id, ROUND(
       |    ln((CAST(stats.n_docs AS DOUBLE) - qt.df + 0.5) / (qt.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6) AS term
       |  FROM tf JOIN qt ON tf.tok = qt.tok
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
       |SELECT doc_id, CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS bm25
       |FROM terms GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    val tf = tokCounts(s, d)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val qt = df.orderBy(desc("df"), asc("tok")).limit(5)
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val term = idf * (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(broadcast(qt), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(term, 6).as("term"))
      .groupBy("doc_id")
      .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id")).limit(20)
  }

  /** Unigram LM cross-entropy per document — the standard cheap quality
    * filter (a doc of globally-rare tokens scores high). The corpus
    * unigram table is broadcast (vocabulary-bounded); the only
    * data-volume exchange is the shared token explode. Per-token log-probs
    * are ROUND 6 then DECIMAL-averaged per doc. */
  val unigramLm: Q = Q(
    s"""WITH $sqlTok,
       |cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
       |tot AS (SELECT COUNT(*) AS t FROM tok),
       |terms AS (SELECT tok.doc_id,
       |    ROUND(ln(CAST(cnt.c AS DOUBLE) / tot.t), 6) AS lp
       |  FROM tok JOIN cnt ON tok.tok = cnt.tok CROSS JOIN tot
       |  WHERE tok.doc_id < 50)
       |SELECT doc_id, COUNT(*) AS n_tok,
       |  ROUND((-CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE)) / COUNT(*), 6)
       |    AS cross_entropy
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tok = documents(s, d).select(col("doc_id"), explode(words).as("tok"))
    val cnt = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = tok.agg(count(lit(1)).as("t"))
    tok.filter(col("doc_id") < 50)
      .join(broadcast(cnt), "tok")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), round(log(col("c").cast("double") / col("t")), 6).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round((-sum(col("lp").cast("decimal(18,6)")).cast("double")) / count(lit(1)), 6)
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** Per-language token entropy H = -Σ p·ln p — corpus diversity profile
    * (a near-constant-token corpus shows up as low entropy). Two
    * aggregates over the shared (lang, tok) exchange; the per-term p·ln p
    * is ROUND 9 then DECIMAL-summed, emitted ROUND 6. */
  val langEntropy: Q = Q(
    s"""WITH tok AS (SELECT lang, unnest($sqlWords) AS tok FROM documents),
       |cnt AS (SELECT lang, tok, COUNT(*) AS c FROM tok GROUP BY lang, tok),
       |tot AS (SELECT lang, COUNT(*) AS t FROM tok GROUP BY lang),
       |terms AS (SELECT cnt.lang,
       |    ROUND((CAST(cnt.c AS DOUBLE) / tot.t)
       |          * ln(CAST(cnt.c AS DOUBLE) / tot.t), 9) AS plp
       |  FROM cnt JOIN tot ON cnt.lang = tot.lang)
       |SELECT lang,
       |  ROUND(CAST(-SUM(CAST(plp AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
       |FROM terms GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val tok = documents(s, d).select(col("lang"), explode(words).as("tok"))
    val cnt = tok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val tot = tok.groupBy("lang").agg(count(lit(1)).as("t"))
    val p = col("c").cast("double") / col("t")
    cnt.join(broadcast(tot), "lang")
      .select(col("lang"), round(p * log(p), 9).as("plp"))
      .groupBy("lang")
      .agg(round((-sum(col("plp").cast("decimal(28,9)"))).cast("double"), 6).as("entropy"))
      .orderBy("lang")
  }

  /** Degree histogram of the embedding near-dup similarity graph
    * (q80's pair semantics): per-node degree, then nodes per degree.
    * Pair space is label-blocked exactly like q80 — per-cell all-pairs,
    * never corpus² — and the two downstream aggregates are tiny. */
  val simGraphDegree: Q = Q(
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  ${Llm.sqlEmbeddingPairsFromWhere}),
       |deg AS (SELECT v, COUNT(*) AS degree FROM (
       |  SELECT va AS v FROM pairs UNION ALL SELECT vb FROM pairs) GROUP BY v)
       |SELECT degree, COUNT(*) AS n_nodes
       |FROM deg GROUP BY degree ORDER BY degree""".stripMargin) { (s, d) =>
    // the SAME edge set as q80, by construction (shared builder)
    val pairs = Llm.embeddingPairs(s, d).select(col("vec_a").as("va"), col("vec_b").as("vb"))
    pairs.select(col("va").as("v")).unionAll(pairs.select(col("vb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  /** Fixed-point PageRank (3 unrolled iterations, d=0.85) over the q110
    * embedding-similarity graph — "which documents sit at the center of
    * a near-duplicate neighborhood" is the curation signal that plain
    * degree (q110) misses.
    *
    * EXACT iterative computation at scale: ranks live as SCALED BIGINTs
    * (10^12 units) and every step is integer multiply / integer DIV, so
    * each iteration is associative-commutative — merge order, partition
    * count and engine cannot change a single bit (float PageRank sums
    * are order-dependent and would never hash-match DuckDB). The same
    * discipline as Dsl.dsum, extended through division by outdegree.
    *
    * Plan shape: the edge relation is built once and its exchange reused
    * by all three propagation joins (same key, same partitioning —
    * ReuseExchange); each iteration is one shuffle on dst. At 100×:
    * iterations stay O(E) with no driver round-trips; node count arrives
    * via a 1-row broadcast, never a collect. */
  val pagerank: Q = {
    val SCALE = 1000000000000L
    def sqlIter(k: Int): String =
      s"""agg$k AS (SELECT e.dst AS id, CAST(SUM(p.pr // p.outdeg) AS BIGINT) AS s
         |  FROM pr${k - 1} p JOIN edges e ON p.id = e.src GROUP BY e.dst),
         |pr$k AS (SELECT d.src AS id, d.outdeg, nn.n,
         |    ((($SCALE // nn.n) * 15) // 100) + ((85 * COALESCE(a.s, 0)) // 100) AS pr
         |  FROM deg d CROSS JOIN nn LEFT JOIN agg$k a ON d.src = a.id)""".stripMargin
    Q(
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  ${Llm.sqlEmbeddingPairsFromWhere}),
         |edges AS (SELECT va AS src, vb AS dst FROM pairs
         |  UNION ALL SELECT vb, va FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |pr0 AS (SELECT d.src AS id, d.outdeg, nn.n, $SCALE // nn.n AS pr
         |  FROM deg d CROSS JOIN nn),
         |${sqlIter(1)},
         |${sqlIter(2)},
         |${sqlIter(3)}
         |SELECT id AS vec_id, pr AS pr_fixed FROM pr3
         |ORDER BY pr_fixed DESC, vec_id""".stripMargin) { (s, d) =>
      val pairs = Llm.embeddingPairs(s, d)
        .select(col("vec_a").as("va"), col("vec_b").as("vb"))
      // materialize the edge relation ONCE: exchange reuse does not
      // bridge the three iterations' differing join shapes, so without
      // this the cosine pair join would recompute per iteration (the
      // same localCheckpoint discipline ConnectedComponents uses —
      // iterative algorithms pay one materialization, then every round
      // reads the small edge set, and plan size stays constant)
      val edges = pairs.select(col("va").as("src"), col("vb").as("dst"))
        .unionAll(pairs.select(col("vb").as("src"), col("va").as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val nn = deg.agg(count(lit(1)).as("n"))
      val pr0 = deg.crossJoin(broadcast(nn))
        .select(col("src").as("id"), col("outdeg"), col("n"),
          expr(s"$SCALE DIV n").as("pr"))
      val pr3 = (1 to 3).foldLeft(pr0) { (pr, _) =>
        val contrib = pr.as("p").join(edges.as("e"), col("p.id") === col("e.src"))
          .select(col("e.dst").as("cid"), expr("p.pr DIV p.outdeg").as("c"))
        val sums = contrib.groupBy("cid").agg(sum("c").as("s"))
        deg.crossJoin(broadcast(nn))
          .join(sums, col("src") === col("cid"), "left")
          .select(col("src").as("id"), col("outdeg"), col("n"),
            (expr(s"(($SCALE DIV n) * 15) DIV 100") +
              expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("pr"))
      }
      pr3.select(col("id").as("vec_id"), col("pr").as("pr_fixed"))
        .orderBy(desc("pr_fixed"), col("vec_id"))
    }
  }

  /** GPT-2-style REGEX PRE-TOKENIZATION accounting — the token-budget
    * arithmetic q59 approximates (chars/4) done properly: split text
    * into letter runs, digit runs and single punctuation marks, the
    * category structure every BPE pre-tokenizer (GPT-2, tiktoken,
    * SentencePiece byte-level) imposes before merges. Per-lang totals of
    * each category feed budget planning (merges only shrink counts
    * within a pre-token, so `n_tokens` upper-bounds true BPE tokens,
    * a SOUND budget bound, while chars/4 is only a guess). The pattern
    * uses character classes + alternation only — the regex subset on
    * which java.util.regex (Spark) and RE2 (DuckDB) agree exactly, so
    * the row is fully oracle-checkable. One codegen'd pass over text;
    * the only exchange is the 5-row lang aggregate. */
  val regexTokens: Q = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    Q(
      s"""SELECT lang,
         |  CAST(SUM(len(regexp_extract_all(lower(text), '$pat'))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS n_word_runs,
         |  CAST(SUM(len(regexp_extract_all(lower(text), '[0-9]+'))) AS BIGINT) AS n_digit_runs,
         |  CAST(SUM(len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))) AS BIGINT) AS n_punct
         |FROM documents WHERE text IS NOT NULL
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      def n(p: String) = sum(size(regexp_extract_all(lower(col("text")), lit(p), lit(0))))
      documents(s, d).filter(col("text").isNotNull)
        .groupBy("lang")
        .agg(n(pat).as("n_tokens"), n("[a-z]+").as("n_word_runs"),
          n("[0-9]+").as("n_digit_runs"), n("[^a-z0-9 ]").as("n_punct"))
        .orderBy("lang")
    }
  }

  /** PMI bigram association — the collocation miner behind phrase
    * vocabularies (wordpiece seeding, stop-phrase lists): score every
    * adjacent word pair by pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))), keep pairs seen ≥5 times, top-50.
    *
    * Scale shape: bigram generation is ARRAY-LOCAL (one `transform` over
    * the token array — no positional self-join, no extra shuffle), so
    * the only data-volume exchange is the (a,b) count aggregate. The
    * unigram table is vocabulary-bounded and broadcast twice (once per
    * bigram side); corpus totals arrive as 1-row broadcasts. The PMI
    * arithmetic is written with IDENTICAL shape both engines
    * (CAST(c_ab)·n_uni·n_uni / (CAST(n_big)·c_a·c_b), left-to-right),
    * ROUND 6 absorbing libm ln last-ulp noise (same discipline as bm25). */
  val pmiBigrams: Q = Q(
    """WITH w AS (SELECT string_split(lower(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |big AS (SELECT w[i] AS a, w[i+1] AS b
      |        FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)),
      |bcnt AS (SELECT a, b, COUNT(*) AS c_ab FROM big GROUP BY a, b),
      |tok AS (SELECT unnest(w) AS tok FROM w),
      |uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
      |nu AS (SELECT COUNT(*) AS n_uni FROM tok),
      |nb AS (SELECT COUNT(*) AS n_big FROM big)
      |SELECT a, b, c_ab,
      |  ROUND(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
      |         / (CAST(n_big AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
      |FROM bcnt JOIN uni ua ON bcnt.a = ua.tok JOIN uni ub ON bcnt.b = ub.tok
      |CROSS JOIN nu CROSS JOIN nb
      |WHERE c_ab >= 5
      |ORDER BY pmi DESC, a, b LIMIT 50""".stripMargin) { (s, d) =>
    val docs = documents(s, d).filter(col("text").isNotNull)
      .select(words.as("w"))
    // adjacent pairs in-place: sequence is only valid ascending, so the
    // size>=2 guard keeps sequence(1, size-1) from running backwards
    val big = docs.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w)-1), i -> named_struct('a', w[i-1], 'b', w[i]))")).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val bcnt = big.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val tok = docs.select(explode(col("w")).as("tok"))
    val uni = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val nUni = tok.agg(count(lit(1)).as("n_uni"))
    val nBig = big.agg(count(lit(1)).as("n_big"))
    val pmi = round(log((col("c_ab").cast("double") * col("n_uni") * col("n_uni")) /
      (col("n_big").cast("double") * col("c_a") * col("c_b"))), 6)
    bcnt.filter(col("c_ab") >= 5)
      .join(broadcast(uni.select(col("tok").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(uni.select(col("tok").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
      .select(col("a"), col("b"), col("c_ab"), pmi.as("pmi"))
      .orderBy(desc("pmi"), asc("a"), asc("b")).limit(50)
  }

  /** Zipf slope per language — fit ln(freq) ~ ln(rank) by least squares
    * over the top-500 terms; natural corpora sit near slope −1, so a
    * language whose slope collapses toward 0 (near-uniform token use) is
    * machine-generated/boilerplate — a corpus-health gate next to
    * q109's entropy.
    *
    * DETERMINISTIC regression: no regr_slope (float accumulation order
    * differs between engines) — the closed form (n·Σxy − ΣxΣy)/(n·Σx² −
    * (Σx)²) over ROUND-9 points with DECIMAL sums, the Dsl discipline
    * extended to second moments. The rank window partitions by lang over
    * the vocabulary-bounded count table (never the corpus), and the
    * 500-term cap bounds every lang's regression input regardless of
    * vocabulary size. */
  val zipfSlope: Q = Q(
    """WITH tok AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
      |             FROM documents WHERE text IS NOT NULL),
      |cnt AS (SELECT lang, tok, COUNT(*) AS c FROM tok GROUP BY lang, tok),
      |rnk AS (SELECT lang, c,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS r FROM cnt),
      |pts AS (SELECT lang, ROUND(ln(CAST(r AS DOUBLE)), 9) AS x,
      |               ROUND(ln(CAST(c AS DOUBLE)), 9) AS y
      |        FROM rnk WHERE r <= 500),
      |sums AS (SELECT lang, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(ROUND(x*y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(ROUND(x*x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx
      |  FROM pts GROUP BY lang)
      |SELECT lang, n AS n_terms,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
      |FROM sums ORDER BY lang""".stripMargin) { (s, d) =>
    val tok = documents(s, d).filter(col("text").isNotNull)
      .select(col("lang"), explode(words).as("tok"))
    val cnt = tok.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy(desc("c"), asc("tok"))
    val pts = cnt.withColumn("r", row_number().over(w)).filter(col("r") <= 500)
      .select(col("lang"), round(log(col("r").cast("double")), 9).as("x"),
        round(log(col("c").cast("double")), 9).as("y"))
    val sums = pts.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,9)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,9)")).cast("double").as("sy"),
      sum(round(col("x") * col("y"), 9).cast("decimal(28,9)")).cast("double").as("sxy"),
      sum(round(col("x") * col("x"), 9).cast("decimal(28,9)")).cast("double").as("sxx"))
    sums.select(col("lang"), col("n").as("n_terms"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"))
      .orderBy("lang")
  }

  /** Held-out BIGRAM language-model scoring — the CCNet/KenLM-style
    * perplexity quality filter, one level up from q105's unigram
    * cross-entropy: train add-one-smoothed bigram counts on the md5
    * train split (same portable split rule as q81: md5(doc_id) prefix
    * < 'd0') and score every held-out document's per-bigram cross
    * entropy lp(w2|w1) = ln((c(w1w2)+1)/(c(w1·)+V)), where c(w1·) is
    * the count of train bigrams led by w1 and V the distinct lead-word
    * vocabulary. Unseen bigrams and unseen lead words fall back to the
    * smoothing mass via LEFT joins (coalesce 0) — exactly the add-one
    * estimator, no special-casing.
    *
    * Scale shape: bigrams shuffle as 8-byte xxhash64 keys (the strings
    * never leave the scan, same move as q139); the three train
    * aggregates and the two probe joins all hash-partition on those
    * keys. V is a 1-row broadcast. At 100 TB the model tables are
    * data-bound aggregates you'd persist once and reuse across scoring
    * runs (the q97 publish shape); the probe side is a linear scan
    * joined against them. Hash-vs-string keying is count-invariant
    * modulo 64-bit collisions (~1e-10 at fixture cardinality), and the
    * string-keyed oracle turns any collision into a loud mismatch.
    * Per-term lp is ROUND 9 then DECIMAL-summed per doc (order
    * independent), emitted ROUND 6. */
  val bigramPerplexity: Q = Q(
    s"""WITH ws AS (SELECT doc_id, $sqlWords AS w,
       |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd0' AS is_train
       |  FROM documents WHERE text IS NOT NULL),
       |tb AS (SELECT doc_id, is_train,
       |    unnest(list_transform(range(len(w) - 1),
       |      i -> w[i+1] || ' ' || w[i+2])) AS bg
       |  FROM ws WHERE len(w) >= 2),
       |tb2 AS (SELECT doc_id, is_train, bg,
       |    split_part(bg, ' ', 1) AS w1 FROM tb),
       |cb AS (SELECT bg, COUNT(*) AS cb FROM tb2 WHERE is_train GROUP BY bg),
       |cu AS (SELECT w1, COUNT(*) AS cu FROM tb2 WHERE is_train GROUP BY w1),
       |v AS (SELECT COUNT(DISTINCT w1) AS v FROM tb2 WHERE is_train),
       |terms AS (SELECT t.doc_id,
       |    ROUND(ln((COALESCE(cb.cb, 0) + 1.0) /
       |      (CAST(COALESCE(cu.cu, 0) AS DOUBLE) + v.v)), 9) AS lp
       |  FROM tb2 t LEFT JOIN cb USING (bg) LEFT JOIN cu USING (w1)
       |  CROSS JOIN v WHERE NOT t.is_train)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  ROUND((-CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE)) / COUNT(*), 6)
       |    AS cross_entropy
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = graft.Tables.wide(s, documents(s, d)).filter(col("text").isNotNull)
      .select(col("doc_id"), words.as("w"),
        (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "d0")
          .as("is_train"))
      .filter(size(col("w")) >= 2)
    // (bigram hash, lead-word hash) pairs — 16 bytes per bigram, built in
    // one pass; the equivalent strings exist only inside the oracle.
    // Hashes are seed-chained element_at, not slice() — the slice form
    // allocates a fresh array per bigram (the r13 hashedShinglesOf
    // finding, ~2× the map side); values change but both relations of
    // every hb/h1 join derive from THIS tb, so results are invariant
    // (same 64-bit collision class).
    val tb = ws.select(col("doc_id"), col("is_train"),
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(
            xxhash64(element_at(col("w"), i), element_at(col("w"), i + 1)).as("hb"),
            xxhash64(element_at(col("w"), i)).as("h1")))).as("t"))
      .select(col("doc_id"), col("is_train"), col("t.hb"), col("t.h1"))
    val train = tb.filter(col("is_train"))
    val cb = train.groupBy("hb").agg(count(lit(1)).as("cb"))
    val cu = train.groupBy("h1").agg(count(lit(1)).as("cu"))
    val v = train.agg(count_distinct(col("h1")).as("v"))
    tb.filter(!col("is_train"))
      .join(cb, Seq("hb"), "left")
      .join(cu, Seq("h1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)).cast("double") + col("v"))), 9).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round((-sum(col("lp").cast("decimal(18,9)")).cast("double")) / count(lit(1)), 6)
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** N-GRAM DIVERSITY per source — the corpus-QA self-repetition probe
    * (low distinct-trigram ratio ⇒ templated/boilerplate-heavy source,
    * the thing you cap before training). Per source: total trigram
    * occurrences, distinct trigrams, their ratio, and the share of the
    * single most repeated trigram (a one-line "how templated is the
    * worst offender" diagnostic). Scale shape: trigrams shuffle once as
    * (source, xxhash64) 8-byte keys into a (source, h) count — strings
    * never leave the scan (q139's move); everything after is per-source
    * rows. COUNT(DISTINCT) rides the same exchange as the max/total
    * (one expand, same key). Hash-vs-string keying is count-invariant
    * modulo 64-bit collisions; the string-keyed oracle makes a
    * collision a loud mismatch. */
  val ngramDiversity: Q = Q(
    s"""WITH ws AS (SELECT source, $sqlWords AS w FROM documents
       |            WHERE text IS NOT NULL),
       |tg AS (SELECT source, unnest(list_transform(range(len(w) - 2),
       |         i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
       |       FROM ws WHERE len(w) >= 3),
       |cnt AS (SELECT source, g, COUNT(*) AS c FROM tg GROUP BY source, g)
       |SELECT source, CAST(SUM(c) AS BIGINT) AS n_grams,
       |  COUNT(*) AS n_distinct,
       |  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS diversity,
       |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_share
       |FROM cnt GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val tg = documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), words.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("w")) - 2),
          i => xxhash64(slice(col("w"), i, lit(3))))).as("g"))
    tg.groupBy("source", "g").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
        round(count(lit(1)).cast("double") / sum("c"), 6).as("diversity"),
        round(max("c").cast("double") / sum("c"), 6).as("top_share"))
      .orderBy("source")
  }

  /** Boolean retrieval: conjunctive (AND) multi-term search through an
    * inverted index — the exact-match complement to BM25's ranked
    * retrieval (q100). A doc matches iff it contains EVERY query term.
    *
    * The distributed shape is intersect-by-counting: explode to DISTINCT
    * (doc, term) postings, keep only postings for query terms, then a
    * doc qualifies when its surviving posting count equals |terms|.
    * This is the classic posting-list intersection without ever
    * materializing per-term lists or joining them pairwise: ONE shuffle
    * keyed by doc_id, term-filter pushed below it so only matching
    * postings move. At 100 TB the filter runs at scan time (terms are a
    * literal IN-list → codegen'd), the exchange carries only docs that
    * contain at least one query term, and the HAVING count is a
    * map-side-combinable aggregate. No posting list is ever collected. */
  val booleanRetrieval: Q = {
    val terms = Seq("spark", "join", "window")
    val sqlTerms = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    Q(
      s"""WITH post AS (SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest($sqlWords) AS tok FROM documents)
         |  WHERE tok IN $sqlTerms),
         |hits AS (SELECT doc_id FROM post GROUP BY doc_id
         |         HAVING COUNT(*) = ${terms.size})
         |SELECT h.doc_id, d.lang, d.source
         |FROM hits h JOIN documents d ON h.doc_id = d.doc_id
         |ORDER BY h.doc_id""".stripMargin) { (s, d) =>
      val post = documents(s, d)
        .select(col("doc_id"), explode(words).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .distinct()
      val hits = post.groupBy("doc_id").agg(count(lit(1)).as("nt"))
        .filter(col("nt") === terms.size)
        .select("doc_id")
      hits.join(documents(s, d).select("doc_id", "lang", "source"), "doc_id")
        .orderBy("doc_id")
    }
  }

  /** Vocabulary coverage truncation — the tokenizer-building question
    * "how many types cover 95% of tokens?" answered per language.
    * ALL-INTEGER thresholding: the crossing test is `100·prefix ≥
    * 95·total` over exact BIGINT counts, so no float comparison can
    * disagree between engines at the boundary. The cumulative sum runs
    * over the VOCABULARY relation (types, not tokens) — orders of
    * magnitude smaller than the corpus — partitioned per lang under a
    * total (count DESC, token ASC) order. With an unbounded vocabulary
    * the per-lang window would become the single-partition cliff; the
    * escape is the same two-phase shape as operators.PrefixSum (range-
    * exchange by count bucket, offset-stamp per partition) — documented
    * here, not needed at any plausible vocab size (vocab grows ~√corpus
    * by Heaps' law). */
  val vocabCoverage: Q = Q(
    s"""WITH cnt AS (SELECT lang, tok, COUNT(*) AS c FROM (
       |    SELECT lang, unnest($sqlWords) AS tok FROM documents)
       |  GROUP BY lang, tok),
       |cum AS (SELECT lang, c,
       |    SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, tok ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
       |    SUM(c) OVER (PARTITION BY lang) AS total
       |  FROM cnt)
       |SELECT lang, COUNT(*) AS vocab_total,
       |  CAST(MAX(total) AS BIGINT) AS total_tokens,
       |  COUNT(*) FILTER (WHERE (pfx - c) * 100 < 95 * total) AS vocab_95,
       |  ROUND(CAST(COUNT(*) FILTER (WHERE (pfx - c) * 100 < 95 * total) AS DOUBLE)
       |    / COUNT(*), 6) AS vocab_share_95
       |FROM cum GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val cnt = documents(s, d).select(col("lang"), explode(words).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("lang").orderBy(desc("c"), asc("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    val cum = cnt.select(col("lang"), col("c"),
      sum("c").over(wCum).as("pfx"), sum("c").over(wAll).as("total"))
    val crossed = (col("pfx") - col("c")) * 100 < lit(95) * col("total")
    cum.groupBy("lang")
      .agg(count(lit(1)).as("vocab_total"),
        max("total").as("total_tokens"),
        count(when(crossed, 1)).as("vocab_95"),
        round(count(when(crossed, 1)).cast("double") / count(lit(1)), 6)
          .as("vocab_share_95"))
      .orderBy("lang")
  }

  /** DSIR-style data selection (importance resampling over hashed
    * n-gram features — the published method behind most "select
    * pretraining data that looks like the target domain" pipelines):
    * fit two bag-of-hashed-unigram distributions — the TARGET (here:
    * docs passing the q120/q170 quality gate, the corpus's own
    * high-quality slice) and the RAW corpus — Laplace-smoothed over
    * B=64 buckets of the q171 portable ASCII hash, then score every
    * document by its summed per-token log-likelihood ratio
    * Σ ln(p_target(b)/p_raw(b)) and keep the top-100 by weight.
    *
    * Determinism: the per-bucket log-ratio is rounded to integer
    * MICRO-units (×10⁶, the repo's micro bridge) on the ≤64-row bucket
    * relation (the ln-portability rule — libm ln is not
    * correctly-rounded, so transcendentals are rounded once on a tiny
    * relation, never per data row), and per-doc weights accumulate
    * those micro longs with a plain integer SUM — exact,
    * order-independent, and ~10× cheaper per row than a DECIMAL
    * accumulator on the hot 2M-row aggregate. One float op total: the
    * final ÷10⁶, identical IEEE division in both engines. Selection
    * ties break on doc_id, so the top-100 is total-ordered.
    *
    * Scale shape (the reason DSIR, not a quality classifier, is what
    * runs at 100 TB): two passes over one (doc,token)-exploded scan —
    * pass 1 is a 64-group histogram (map-side combinable, the shuffle
    * carries ≤64×tasks rows), pass 2 re-joins the BROADCAST 64-row
    * ratio table and folds per-doc (map-side combinable on doc_id);
    * selection is TakeOrderedAndProject (tasks×100 rows to the driver).
    * No model training, no all-pairs, nothing driver-side. The two
    * corpus scans are the canonical fit-then-score structure. */
  /** The q233 featurized token relation: (doc_id, tgt, bucket). The
    * target gate gets its OWN projection BELOW the explode — aliased in
    * the same select as explode(...), ExtractGenerator would hoist it
    * above the Generate and re-evaluate the doc-level stopword scan per
    * TOKEN row (40× redundant work, measured 3.5 s of the first cut at
    * sf0.1; DESIGN_SCALE rule 4). PlanSpec pins this placement. */
  private[graft] def dsirTok(s: SparkSession, d: String): DataFrame = {
    // ascii(substr(i,1)), NOT ascii(element_at(split(tok,""), i)): a
    // split() referenced inside the lambda is re-evaluated PER CHARACTER
    // (the same O(len²) trap Llm.shinglesOf documents for words), and the
    // fold runs directly over the index sequence instead of materializing
    // a transformed array first. Identical integer results — ascii of the
    // i-th one-char substring IS ord(tok[i]) — so the oracle arithmetic
    // is untouched; r13 optimization round, guide §1.2 per-task work.
    val hv = aggregate(
      sequence(lit(1), length(col("tok"))),
      lit(0L),
      (acc, i) => acc + i.cast("long") *
        ascii(col("tok").substr(i, lit(1))).cast("long")) +
      lit(7919L) * length(col("tok"))
    val tgt = col("n_chars").between(100, 500) &&
      (size(filter(words, t => t.isInCollection(Llm.stopWords))).cast("double") /
        size(words)) >= 0.05
    graft.Tables.wide(s, documents(s, d))
      .select(col("doc_id"), tgt.as("tgt"), col("text"))
      .select(col("doc_id"), col("tgt"), explode(words).as("tok"))
      // length(tok) > 0: consecutive/leading spaces split into EMPTY
      // tokens, which pass the chars=bytes ASCII gate but then crash the
      // hash (Spark's sequence(1,0) yields [1,0] and element_at(ch, 0)
      // throws) while DuckDB's list_sum over an empty range is NULL→0 —
      // a data-dependent crash/divergence. Excluded on BOTH arms.
      .filter(length(col("tok")) === octet_length(col("tok")) && length(col("tok")) > 0)
      .select(col("doc_id"), col("tgt"), (hv % 64).as("b"))
  }

  val dsirSelect: Q = Q(
    s"""WITH d0 AS (SELECT doc_id, text,
       |    (n_chars BETWEEN 100 AND 500 AND
       |     CAST(len(list_filter(string_split(lower(text), ' '),
       |          t -> list_contains($sqlStopList, t))) AS DOUBLE)
       |        / len(string_split(lower(text), ' ')) >= 0.05) AS tgt
       |  FROM documents),
       |t0 AS (SELECT doc_id, tgt, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM d0),
       |tok AS (SELECT doc_id, tgt,
       |    CAST(COALESCE(list_sum(list_transform(range(length(tok)),
       |      i -> (i + 1) * ord(tok[i+1]))), 0) + 7919 * length(tok) AS BIGINT)
       |      % 64 AS b
       |  FROM t0 WHERE length(tok) = strlen(tok) AND length(tok) > 0),
       |bs AS (SELECT b, COUNT(*) AS cr, COUNT(*) FILTER (WHERE tgt) AS ct
       |  FROM tok GROUP BY b),
       |tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bs),
       |lp AS (SELECT b,
       |    CAST(ROUND((ln((ct + 1.0) / (tt + 64)) - ln((cr + 1.0) / (tr + 64)))
       |      * 1000000) AS BIGINT) AS lpr_micro
       |  FROM bs CROSS JOIN tot),
       |w AS (SELECT tok.doc_id,
       |    CAST(SUM(lpr_micro) AS DOUBLE) / 1000000 AS weight
       |  FROM tok JOIN lp USING (b) GROUP BY tok.doc_id)
       |SELECT doc_id, weight FROM w
       |ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
    // Fit-then-score = two corpus scans, NOT a materialized token
    // relation: localCheckpointing the O(n)-row featurized relation
    // OOM'd the ×1000 decade probe (execution memory starved by 2G
    // cached rows) — only the BOUNDED relation below (64 bucket rows)
    // is checkpointed, per the repo rule that localCheckpoint is for
    // broadcast-sized subtrees. Recomputing the hash scan is the same
    // trade a 100 TB run makes: re-reading pruned parquet beats
    // materializing a corpus-sized intermediate.
    val tok = dsirTok(s, d)
    val bs = tok.groupBy("b").agg(
      count(lit(1)).as("cr"),
      count(when(col("tgt"), 1)).as("ct"))
      .localCheckpoint() // ≤64 rows; feeds the totals AND the ratio table
    val tot = bs.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val lp = bs.crossJoin(broadcast(tot))
      .select(col("b"), round(
        (log((col("ct") + 1.0) / (col("tt") + 64)) -
          log((col("cr") + 1.0) / (col("tr") + 64))) * 1000000, 0)
        .cast("long").as("lpr_micro"))
    // The ratio table rides into the scoring pass as a 64-slot LITERAL
    // lookup array, not a broadcast join (r13 optimization round): the
    // join keyed on the DERIVED column b made the optimizer infer
    // IsNotNull(b) and push it below the projection, so the whole
    // per-token positional hash evaluated TWICE per row (Filter +
    // Project — the plan-pinned duplicate the guide's §4.4 describes for
    // UDFs, reproduced here by a built-in expression chain). A 64-long
    // element_at keeps one evaluation and drops the join operator
    // entirely. Collecting lp is bounded by construction (≤64 rows, the
    // fixed bucket count, already checkpointed driver-adjacent) — the
    // same cost class as broadcasting it, at any corpus size. Buckets
    // absent from the corpus simply keep slot 0: they can never be
    // probed, because every scored token's b was counted into bs.
    val lutVals = Array.fill[Long](64)(0L)
    lp.collect().foreach(r => lutVals(r.getLong(0).toInt) = r.getLong(1))
    val lut = array(lutVals.map(lit).toIndexedSeq: _*)
    tok.groupBy("doc_id")
      .agg((sum(element_at(lut, (col("b") + 1).cast("int")))
        .cast("double") / 1000000).as("weight"))
      .orderBy(desc("weight"), asc("doc_id"))
      .limit(100)
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q100_bm25"             -> bm25,
    "q105_unigram_lm"       -> unigramLm,
    "q109_lang_entropy"     -> langEntropy,
    "q110_sim_graph_degree" -> simGraphDegree,
    "q119_pagerank"         -> pagerank,
    "q134_regex_tokens"     -> regexTokens,
    "q144_pmi_bigrams"      -> pmiBigrams,
    "q148_zipf_slope"       -> zipfSlope,
    "q154_bigram_perplexity"-> bigramPerplexity,
    "q156_ngram_diversity"  -> ngramDiversity,
    "q161_boolean_retrieval"-> booleanRetrieval,
    "q169_vocab_coverage"   -> vocabCoverage,
    "q233_dsir_select"      -> dsirSelect
  )
}
