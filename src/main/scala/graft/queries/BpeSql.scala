package graft.queries

/** DuckDB oracle SQL for the BPE trainer ([[graft.ops.BpeOps]]).
  *
  * Replays the full iteration: per round k, pair counts (p_k), the
  * argmax merge (m_k, one row), the unrolled greedy left-to-right
  * merge application (a_k computes fire flags f1..f{maxLen-1} via
  * lateral column aliases; w_k rebuilds the symbol lists). All
  * arithmetic is integer/string — no snapping — so the merge table and
  * every intermediate word state are bit-identical to the engine's.
  *
  * The fire flags CROSS JOIN the one-row m_k (DuckDB's lateral aliases
  * reject subquery-bearing expressions, so the merge pair rides as
  * plain columns ma/mb). Precondition: all words <= maxLen symbols
  * (engine-asserted in BpeOps.train).
  */
object BpeSql {

  /** CTE chain ending open after `w{rounds}(word, n, syms)`. */
  def bpeCtes(rounds: Int, maxLen: Int = 8): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (
          SELECT word, n,
            list_transform(range(1, LENGTH(word) + 1),
              i -> substr(word, i, 1)) AS syms
          FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                FROM (SELECT UNNEST(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY word))"""
    for (k <- 1 to rounds) {
      val prev = s"w${k - 1}"
      sb ++= s""",
        p$k AS (
          SELECT syms[i] AS a, syms[i + 1] AS b, SUM(n) AS cnt
          FROM (SELECT n, syms, UNNEST(range(1, len(syms))) AS i FROM $prev)
          GROUP BY 1, 2),
        m$k AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p$k
                ORDER BY cnt DESC, a, b LIMIT 1),
        a$k AS (
          SELECT word, n, syms, m.a AS ma, m.b AS mb,"""
      sb ++= (1 until maxLen).map { i =>
        val notPrev = if (i == 1) "" else s"NOT f${i - 1} AND "
        s"""
            (${notPrev}len(syms) >= ${i + 1} AND syms[$i] = m.a
              AND syms[${i + 1}] = m.b) AS f$i"""
      }.mkString(",")
      sb ++= s"""
          FROM $prev CROSS JOIN m$k m),
        w$k AS (
          SELECT word, n, flatten(["""
      sb ++= (1 to maxLen).map { i =>
        val c1 = if (i < maxLen) s"WHEN f$i THEN [ma || mb]" else ""
        val c2 = if (i >= 2) s"WHEN f${i - 1} THEN []" else ""
        s"""
            CASE $c1 $c2 WHEN len(syms) >= $i THEN [syms[$i]] ELSE [] END"""
      }.mkString(",")
      sb ++= s"""
          ]) AS syms
          FROM a$k)"""
    }
    sb.toString
  }

  /** t21: the learned merge table, one row per round. */
  def trainOracle(rounds: Int, maxLen: Int = 8): String = {
    val tail = (1 to rounds).map { k =>
      s"SELECT CAST($k AS INT) AS round, a AS w1, b AS w2, cnt AS n FROM m$k"
    }.mkString("\n        UNION ALL ")
    bpeCtes(rounds, maxLen) + "\n        " + tail + "\n        ORDER BY round"
  }

  /** t22: per-doc subword census under the trained tokenizer. */
  def segmentOracle(rounds: Int, maxLen: Int = 8): String =
    bpeCtes(rounds, maxLen) + s""",
        occ AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
                FROM documents),
        seg AS (SELECT word, len(syms) AS n_sub FROM w$rounds)
        SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(SUM(s.n_sub) AS BIGINT) AS n_subwords
        FROM occ o JOIN seg s USING (word)
        GROUP BY o.doc_id ORDER BY o.doc_id"""
}
