package graft.functions

/** Aho–Corasick multi-pattern string automaton (Aho & Corasick 1975) —
  * the scale path for blocklist scanning. q147's `blocklistFilter`
  * compiles its term list into codegen literals: ideal for tens of
  * entries, but the plan grows with the list and every token pays an
  * `isin` over it. This automaton matches an arbitrary-size pattern
  * list in ONE left-to-right pass per document — O(|text| + matches)
  * independent of list size — and is built once on the driver (the
  * pattern list is small; the TEXT is the 100 TB side) and broadcast.
  *
  * Counting contract (what the q150 oracle brute-force-replays):
  *  - `hits`  = number of (position, pattern) occurrences, overlaps and
  *    self-overlaps included — every text position where a pattern ends
  *    counts once per pattern ending there;
  *  - `distinct` = number of distinct patterns occurring at least once.
  *
  * Implementation notes: per-node immutable child maps (serializable,
  * alphabet-agnostic — works for any UTF-16 chars, not just a-z);
  * `chainCount(s)` pre-aggregates pattern-ends along the suffix chain so
  * the total-hits increment is O(1) per character; `dictLink` jumps
  * straight to the nearest terminal suffix so the distinct-pattern walk
  * is output-sensitive (pays only when something actually matches).
  */
final class AhoCorasick private[functions] (
    children: Array[Map[Char, Int]],
    fail: Array[Int],
    chainCount: Array[Long],
    dictLink: Array[Int],
    patternAt: Array[Int],
    val nPatterns: Int) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !children(s).contains(c)) s = fail(s)
    children(s).getOrElse(c, 0)
  }

  /** (total occurrences, distinct patterns present) over `txt`. */
  def scan(txt: String): (Long, Int) = {
    val seen = new Array[Boolean](nPatterns)
    var distinct = 0
    var hits = 0L
    var s = 0
    var i = 0
    while (i < txt.length) {
      s = step(s, txt.charAt(i))
      hits += chainCount(s)
      var t = if (patternAt(s) >= 0) s else dictLink(s)
      while (t >= 0) {
        val p = patternAt(t)
        if (!seen(p)) { seen(p) = true; distinct += 1 }
        t = dictLink(t)
      }
      i += 1
    }
    (hits, distinct)
  }
}

object AhoCorasick {

  /** Builds the goto trie, failure links (BFS order), suffix-chain
    * terminal counts, and dictionary links. Duplicate patterns are
    * deduplicated; empty patterns are rejected (they would match at
    * every position, which no caller means). */
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.distinct
    require(pats.nonEmpty, "pattern list must not be empty")
    require(pats.forall(_.nonEmpty), "patterns must be non-empty strings")
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val patternAt = scala.collection.mutable.ArrayBuffer(-1)
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          patternAt += -1
          children.length - 1
        })
      }
      patternAt(s) = pi // pats are distinct, so terminal nodes are unique
    }
    val n = children.length
    val fail = new Array[Int](n)
    val dictLink = Array.fill(n)(-1)
    val chainCount = new Array[Long](n)
    val queue = scala.collection.mutable.Queue[Int]()
    children(0).values.foreach { v =>
      fail(v) = 0
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      chainCount(u) = (if (patternAt(u) >= 0) 1L else 0L) + chainCount(fail(u))
      dictLink(u) =
        if (patternAt(fail(u)) >= 0) fail(u) else dictLink(fail(u))
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).get(c) match {
          case Some(w) if w != v => w
          case _ => 0
        }
        queue += v
      }
    }
    new AhoCorasick(children.map(_.toMap).toArray, fail, chainCount,
      dictLink, patternAt.toArray, pats.length)
  }
}
