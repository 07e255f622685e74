package graft.queries

/** Generated DuckDB oracle for `ops.Bpe.learnMerges`: unrolls each merge
  * iteration into CTEs. Counting is a plain GROUP BY; the GREEDY
  * left-to-right non-overlapping merge is replayed relationally with a
  * gaps-and-islands trick — within every maximal run of consecutive
  * positions whose (tok, next) equals the winning pair, greedy selects
  * exactly the even offsets (position x merges iff x−1 didn't, and a run
  * can only stay matched when tok_a = tok_b, so parity is the whole
  * rule). A selected position emits the fused token; the position after
  * it is dropped; everything else passes through. */
object BpeOracle {

  /** The greedy-replay half of one iteration: tokens CTE `t$i` + pair CTE
    * `b$i` (one (a, b) row, learned or fixed) → merged tokens `t${i+1}`.
    * Shared by the learner's oracle and the fixed-list encode oracle so
    * the two gates can't diverge on the merge semantics. */
  private def replayCtes(i: Int): String =
    s"""p$i AS (SELECT doc_id, x, tk[x] AS tok, tk[x+1] AS nxt,
       |          CASE WHEN tk[x] = a AND tk[x+1] = b
       |               THEN 1 ELSE 0 END AS mt
       |        FROM (SELECT t.doc_id, t.tk, b.a, b.b,
       |                unnest(range(1, len(t.tk) + 1)) AS x
       |              FROM t$i t CROSS JOIN b$i b)),
       |s$i AS (SELECT *, x - row_number() OVER
       |          (PARTITION BY doc_id, mt ORDER BY x) AS isl FROM p$i),
       |g$i AS (SELECT *, CASE WHEN mt = 1 AND
       |            (x - min(x) OVER (PARTITION BY doc_id, mt, isl)) % 2 = 0
       |          THEN 1 ELSE 0 END AS sel FROM s$i),
       |e$i AS (SELECT *, lag(sel, 1, 0) OVER
       |          (PARTITION BY doc_id ORDER BY x) AS skp FROM g$i),
       |t${i + 1} AS (SELECT doc_id,
       |          list(CASE WHEN sel = 1 THEN tok || chr(1) || nxt
       |               ELSE tok END ORDER BY x)
       |            FILTER (WHERE skp = 0) AS tk
       |        FROM e$i GROUP BY doc_id)""".stripMargin

  /** One merge iteration: tokens CTE `t$i` → best pair `b$i` → merged
    * tokens `t${i+1}`. */
  private def iterCtes(i: Int): String =
    s"""c$i AS (SELECT tk[x] AS a, tk[x+1] AS b, count(*) AS n
       |        FROM (SELECT tk, unnest(range(1, len(tk))) AS x FROM t$i)
       |        GROUP BY 1, 2),
       |b$i AS (SELECT a, b, n FROM c$i ORDER BY n DESC, a, b LIMIT 1),
       |${replayCtes(i)}""".stripMargin

  def sql(iters: Int): String = {
    val head = "t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)"
    val body = (0 until iters).map(iterCtes).mkString(",\n")
    val out = (0 until iters)
      .map(i => s"SELECT $i AS iter, a AS tok_a, b AS tok_b, n::BIGINT AS n_pairs FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $head,
       |$body
       |$out
       |ORDER BY iter""".stripMargin
  }

  /** A token as a DuckDB string expression; fused tokens contain the
    * chr(1) separator, which has no literal spelling — splice it in. */
  private def tokenLit(t: String): String =
    t.split('\u0001').map(p => "'" + p.replace("'", "''") + "'")
      .mkString(" || chr(1) || ")

  /** Oracle for `ops.Bpe.applyMerges` with a FIXED merge list: the same
    * greedy-replay CTEs as the learner's oracle (so the two gates share
    * one definition of the merge semantics), but each iteration's "best
    * pair" is the given rule instead of a learned one. Output:
    * (doc_id, pos, token) of the fully encoded corpus. */
  def encodeSql(merges: Seq[(String, String)]): String = {
    val head = "t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)"
    val body = merges.zipWithIndex.map { case ((a, b), i) =>
      s"""b$i AS (SELECT ${tokenLit(a)} AS a, ${tokenLit(b)} AS b),
         |${replayCtes(i)}""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$body
       |SELECT doc_id, CAST(x AS INTEGER) AS pos, tk[x+1] AS token
       |FROM (SELECT doc_id, tk, unnest(range(len(tk))) AS x FROM t${merges.size})
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** Oracle for the q158 tokenizer-compression gate: per language,
    * whitespace word count (t0) vs post-merge token count (t$n), both
    * from the same replay CTEs as `encodeSql`. The ratio is one
    * BIGINT::DOUBLE division — engine-exact. */
  def fertilitySql(merges: Seq[(String, String)]): String = {
    val head = "t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)"
    val body = merges.zipWithIndex.map { case ((a, b), i) =>
      s"""b$i AS (SELECT ${tokenLit(a)} AS a, ${tokenLit(b)} AS b),
         |${replayCtes(i)}""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$body
       |SELECT d.lang, count(*)::BIGINT AS n_docs,
       |  sum(len(w.tk))::BIGINT AS n_words,
       |  sum(len(t.tk))::BIGINT AS n_tokens,
       |  sum(len(t.tk))::DOUBLE / sum(len(w.tk))::DOUBLE AS compression
       |FROM documents d
       |JOIN t0 w USING (doc_id) JOIN t${merges.size} t USING (doc_id)
       |GROUP BY d.lang ORDER BY lang""".stripMargin
  }

  /** Oracle for the q152 round-trip gate. `n_tokens` REPLAYS the encode
    * (the same CTEs as `encodeSql`, so the query can't silently skip
    * encoding), while `decoded` is lower(text) ITSELF — a hash match
    * therefore proves decode(encode(x)) == normalize(x) for every
    * document, not merely that two engines decode alike. */
  def roundtripSql(merges: Seq[(String, String)]): String = {
    val head = "t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)"
    val body = merges.zipWithIndex.map { case ((a, b), i) =>
      s"""b$i AS (SELECT ${tokenLit(a)} AS a, ${tokenLit(b)} AS b),
         |${replayCtes(i)}""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$body
       |SELECT t.doc_id, CAST(len(t.tk) AS INTEGER) AS n_tokens,
       |  lower(d.text) AS decoded
       |FROM t${merges.size} t JOIN documents d USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Compression-curve oracle: replay `iters` LEARNED merges (the q124
    * chain — t$k is the corpus after k merges), then read the token
    * count at each prefix in `ks`. */
  def compressionSql(iters: Int, ks: Seq[Int]): String = {
    require(ks.forall(k => k >= 0 && k <= iters), "ks within iters")
    val head = "t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)"
    val body = (0 until iters).map(iterCtes).mkString(",\n")
    val rows = ks.map { k =>
      s"""SELECT $k::BIGINT AS n_merges, count(*) AS n_docs,
         |  CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
         |  (SELECT CAST(sum(len(tk)) AS BIGINT) FROM t0) AS n_words,
         |  round(CAST(sum(len(tk)) AS DOUBLE) /
         |    (SELECT CAST(sum(len(tk)) AS DOUBLE) FROM t0), 6) AS tokens_per_word
         |FROM t$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $head,
       |$body
       |$rows
       |ORDER BY n_merges""".stripMargin
  }
}
