package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/**
 * Typed Column constructors for graft's 18 native Catalyst kernels.
 *
 * These build the expression DIRECTLY (`Tokens(e)` → Column), so a
 * kernel Column works on any SparkSession — including sessions built
 * without [[GraftExtensions]] and Columns constructed on threads with
 * no active session — because analysis never consults the function
 * registry. The name-based `graft_*` registrations in
 * [[GraftExtensions]] remain the SQL-text surface
 * (`SELECT graft_tokens(body) ...`); both routes resolve to the same
 * expression class, so plans, codegen and parity specs are identical.
 *
 * Aggregate kernels ([[topK]], [[kmv]]) are wrapped in an
 * `AggregateExpression` here — exactly what function resolution would
 * have produced — so they drop into `.agg(...)` like any builtin.
 */
object Kernels {

  /** Whitespace tokens, one compiled byte-scan ([[Tokens]]). */
  def tokens(text: Column): Column = toCol(Tokens(toExpr(text)))

  /** Count of array elements contained in a literal string set
    * ([[CountIn]]); the set is hoisted to a hash set once per task. */
  def countIn(toks: Column, markerSet: Column): Column =
    toCol(CountIn(toExpr(toks), toExpr(markerSet)))

  /** Contiguous word n-grams, order-preserving, non-distinct
    * ([[WindowGrams]]). */
  def windowGrams(toks: Column, n: Column): Column =
    toCol(WindowGrams(toExpr(toks), toExpr(n)))

  /** Rolling window hashes over a token array ([[WindowHashes]]). */
  def windowHashes(toks: Column, n: Column): Column =
    toCol(WindowHashes(toExpr(toks), toExpr(n)))

  /** Sorted distinct shingle hashes ([[SortedShingleHashes]]). */
  def shingleHashes(toks: Column, n: Column): Column =
    toCol(SortedShingleHashes(toExpr(toks), toExpr(n)))

  /** Intersection size of two sorted long arrays
    * ([[SortedIntersectCount]]). */
  def intersectCount(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))

  /** Positionwise equality count of two arrays ([[EqCount]]). */
  def eqCount(a: Column, b: Column): Column =
    toCol(EqCount(toExpr(a), toExpr(b)))

  /** First 60 bits of MD5 as a non-negative long ([[Md5Hash60]]). */
  def md5h60(bytes: Column): Column = toCol(Md5Hash60(toExpr(bytes)))

  /** 64-bit SimHash over an array of hashes ([[SimHash64]]). */
  def simHash64(hashes: Column): Column = toCol(SimHash64(toExpr(hashes)))

  /** MinHash signature vector from shingle hashes ([[MinHashSigs]]). */
  def minHash(hashes: Column, params: Column): Column =
    toCol(MinHashSigs(toExpr(hashes), toExpr(params)))

  /** Unicode NFC normalization ([[NfcNormalize]]). */
  def nfc(text: Column): Column = toCol(NfcNormalize(toExpr(text)))

  /** Float-vector dot product ([[DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  /** Symmetric int8 quantization of a double vector ([[QuantizeInt8]]). */
  def quantizeInt8(vec: Column): Column = toCol(QuantizeInt8(toExpr(vec)))

  /** Signed random-projection LSH bucket id ([[LshBucket]]). */
  def lshBucket(vec: Column, planes: Column, nPlanes: Column): Column =
    toCol(LshBucket(toExpr(vec), toExpr(planes), toExpr(nPlanes)))

  /** PQ code assignment against broadcast codebooks ([[PqEncodeCodes]]). */
  def pqEncode(vec: Column, codebooks: Column): Column =
    toCol(PqEncodeCodes(toExpr(vec), toExpr(codebooks)))

  /** PQ asymmetric-distance lookup-table sum ([[PqAdcDist]]). */
  def adcDist(tables: Column, codes: Column): Column =
    toCol(PqAdcDist(toExpr(tables), toExpr(codes)))

  /** Bounded top-k (score, id) aggregate ([[TopKByScore]]); map-side
    * partials cap every task at k entries per group. */
  def topK(score: Column, id: Column, k: Column): Column =
    toCol(TopKByScore(toExpr(score), toExpr(id), toExpr(k))
      .toAggregateExpression())

  /** KMV distinct-count sketch aggregate ([[KmvSketch]]). */
  def kmv(hash: Column, k: Column): Column =
    toCol(KmvSketch(toExpr(hash), toExpr(k)).toAggregateExpression())

  /** Exact byte-level BPE token ids under a literal merges table
    * ([[BpeEncodeIds]]). */
  def bpeEncode(text: Column, merges: Column): Column =
    toCol(BpeEncodeIds(toExpr(text), toExpr(merges)))

  /** Inverse of [[bpeEncode]]: ids → text ([[BpeDecodeIds]]). */
  def bpeDecode(ids: Column, merges: Column): Column =
    toCol(BpeDecodeIds(toExpr(ids), toExpr(merges)))
}
