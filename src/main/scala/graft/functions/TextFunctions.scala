package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic deterministic hashing + text-analysis primitives for the
  * LLM-pipeline operators (dedup, fingerprinting, language-ID, quality
  * scoring). North-star extension — no reference analog; reference scope is
  * SURVEY.md §2.5.
  *
  * Hashing goes through md5 (identical bytes-in/hex-out in Spark and
  * DuckDB) parsed to a bounded integer, so every derived signature
  * (minhash, simhash, LSH buckets) is bitwise-reproducible across engines —
  * that's what lets the DuckDB oracle hash-match these queries. Spark's
  * native `hash()`/`xxhash64` are faster but engine-specific; swapping them
  * in is a one-line change once differential testing is done.
  */
object TextFunctions {

  /** Largest 32-bit prime; hash values land in [0, P32). Products
    * `a·h + b` with a,b < 2^31 stay under 2^63 — no overflow. */
  val P32 = 4294967291L

  /** Fixed (a, b) mixing pairs for the k minhash permutations
    * `h_i(x) = (a_i·x + b_i) mod P32` (Broder's minwise scheme). */
  val MinhashAB: Seq[(Long, Long)] = Seq(
    (1299709L, 104729L), (15485863L, 32452843L), (49979687L, 86028121L),
    (67867967L, 122949823L), (160481183L, 236887691L), (314606869L, 413158511L),
    (533000389L, 654188383L), (776531401L, 899809343L), (1020379843L, 1159512287L),
    (1298074099L, 1446236347L), (1611623773L, 1777772707L), (1945898899L, 2038074743L),
    (104395301L, 217645177L), (334214459L, 452930459L), (575194001L, 694847533L),
    (817504243L, 941083981L))

  /** 32-bit hash of a string column: first 8 md5 hex digits as an integer.
    * DuckDB mirror: `('0x' || substr(md5(s), 1, 8))::bigint`. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Character n-gram shingles of a string (positions 1..len−n+1; strings
    * shorter than n yield their whole text once). */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Word n-gram shingles (n=3): ~5× fewer instances than character
    * shingles on prose, same MinHash pipeline (MMDS ch.3 uses both; word
    * grams are the web-dedup standard). Trailing positions pad with empty
    * strings so strings match any SQL engine's `||`+COALESCE form. */
  def wordShingles3(text: Column): Column = {
    // The token array is BOUND ONCE as a lambda variable (transform over a
    // 1-element array is Catalyst's `let`): embedding split(text) directly
    // in the per-element lambda body re-evaluated it 3× per shingle —
    // O(words²) splits per document, which dominated the shingle phase of
    // every LSH pipeline (r17; q_neardup_lsh shingle cut measured in
    // OPTIMIZATION_r17.md). Same output values, element for element.
    flatten(transform(array(split(text, " ")), ws =>
      transform(
        sequence(lit(1), greatest(size(ws) - 2, lit(1))),
        i => concat(try_element_at(ws, i), lit(" "),
          coalesce(try_element_at(ws, i + 1), lit("")), lit(" "),
          coalesce(try_element_at(ws, i + 2), lit(""))))))
  }

  /** i-th minhash value over a (distinct) shingle-hash column, as an
    * aggregate expression: `min((a_i·h + b_i) mod P32)`. */
  def minhashAgg(hashCol: Column, i: Int): Column = {
    val (a, b) = MinhashAB(i)
    min((hashCol * lit(a) + lit(b)) % lit(P32))
  }

  /** Per-row MinHash signature (array of k mins) computed entirely inside
    * array expressions — no explode, no shuffle, one row in → one row
    * out. This is the streaming-friendly formulation of
    * minhashSignatures: a batch pipeline amortizes the explode across a
    * hash-agg, but a stream wants the signature before any keying so
    * state can shard by band bucket.
    *
    * The shingle-hash set is LET-BOUND via a single-element `transform`
    * so it evaluates once per row: higher-order functions are
    * codegen-fallback (no common-subexpression elimination), so writing
    * the k mins over a shared `hs` sub-expression would re-run the whole
    * shingle+md5+distinct pipeline k = 16 times per document — measured
    * 2.3 ms/doc vs ~0.15 ms with the binding at sf1. The lambda
    * variable carries the evaluated array; only the k permutation scans
    * repeat, which is the irreducible O(shingles·k). */
  def rowMinhashSig(text: Column): Column = {
    val hs = array_distinct(transform(wordShingles3(text),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")))
    element_at(transform(array(hs), h0 =>
      array(MinhashAB.map { case (a, b) =>
        array_min(transform(h0, h => (h * lit(a) + lit(b)) % lit(P32)))
      }: _*)), 1)
  }

  /** Non-overlapping occurrence count of literal `needle` in `hay` via the
    * replace-length trick — pure integer arithmetic, identical in any SQL
    * engine: `(len(h) − len(replace(h, needle, ''))) / len(needle)`. */
  def occurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(call_function("replace", hay, lit(needle), lit(""))))
      / lit(needle.length)).cast("long")

  /** Word count of single-space-separated text: `#spaces + 1`. */
  def wordCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1).cast("long")
}
