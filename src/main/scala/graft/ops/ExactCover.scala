package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Exact-cover solver — Knuth's Algorithm X over dancing links.
  *
  * Reference analog: dancing/DancingLinks.java:1, the backtracking core under
  * both DistributedPentomino.java:1 and Sudoku.java:1. This is a fresh
  * array-based implementation of the published algorithm (Knuth, "Dancing
  * Links", 2000): nodes live in parallel Int arrays (left/right/up/down/
  * column), column choice is min-remaining-values, cover/uncover splice and
  * unsplice in O(1) per link.
  *
  * The distributed contract mirrors the reference's split model: a "prefix"
  * is the first `depth` row choices along the canonical (deterministic
  * min-column) search tree. [[prefixes]] enumerates them; [[countCompletions]]
  * replays one prefix and exhausts its subtree. Because a solution is a SET
  * of rows and each column is covered by exactly one of them, every solution
  * descends from exactly one canonical prefix — so per-prefix counts sum to
  * the global count with no overlap, and prefixes parallelize freely
  * (ref DistributedPentomino.java:94-101 ships the same prefix vectors to
  * its mappers).
  *
  * Instances are single-use per search entry point? No — searches restore
  * all links on exit, so one instance may run many queries sequentially;
  * it is NOT thread-safe (tasks each build their own, construction is cheap).
  */
final class ExactCover(val numColumns: Int) {
  // node 0 = root; 1..numColumns = column headers; then row nodes.
  // Raw primitive arrays with doubling growth — the search loop is pure
  // pointer-chasing, so boxed collections would dominate the runtime.
  private var cap = math.max(64, (numColumns + 1) * 2)
  private var L = new Array[Int](cap)
  private var R = new Array[Int](cap)
  private var U = new Array[Int](cap)
  private var D = new Array[Int](cap)
  private var C = new Array[Int](cap) // column header of a node
  private var rowOf = new Array[Int](cap) // user row id of a node (-1 = header)
  private var nNodes = 0
  private val colSize = new Array[Int](numColumns + 1)
  private val firstNodeOfRow = scala.collection.mutable.HashMap[Int, Int]()

  private def grow(): Unit = {
    cap *= 2
    L = java.util.Arrays.copyOf(L, cap); R = java.util.Arrays.copyOf(R, cap)
    U = java.util.Arrays.copyOf(U, cap); D = java.util.Arrays.copyOf(D, cap)
    C = java.util.Arrays.copyOf(C, cap); rowOf = java.util.Arrays.copyOf(rowOf, cap)
  }

  private def newNode(): Int = {
    if (nNodes == cap) grow()
    nNodes += 1
    nNodes - 1
  }

  // build root + headers as a circular row
  for (i <- 0 to numColumns) {
    val n = newNode()
    L(n) = if (i == 0) numColumns else i - 1
    R(n) = if (i == numColumns) 0 else i + 1
    U(n) = i; D(n) = i; C(n) = i; rowOf(n) = -1
  }

  /** Add a row covering `cols` (1-based column ids) under user id `rowId`. */
  def addRow(rowId: Int, cols: Array[Int]): Unit = {
    require(cols.nonEmpty)
    var first = -1
    var prev = -1
    var i = 0
    while (i < cols.length) {
      val c = cols(i)
      require(c >= 1 && c <= numColumns, s"column $c out of range")
      val n = newNode()
      // vertical splice above header (append at column tail)
      U(n) = U(c); D(n) = c; C(n) = c; rowOf(n) = rowId
      D(U(c)) = n; U(c) = n
      colSize(c) += 1
      // horizontal circular row links
      if (first == -1) { first = n; L(n) = n; R(n) = n }
      else { L(n) = prev; R(n) = first; R(prev) = n; L(first) = n }
      prev = n
      i += 1
    }
    firstNodeOfRow(rowId) = first
  }

  private def cover(c: Int): Unit = {
    R(L(c)) = R(c); L(R(c)) = L(c)
    var i = D(c)
    while (i != c) {
      var j = R(i)
      while (j != i) {
        D(U(j)) = D(j); U(D(j)) = U(j)
        colSize(C(j)) -= 1
        j = R(j)
      }
      i = D(i)
    }
  }

  private def uncover(c: Int): Unit = {
    var i = U(c)
    while (i != c) {
      var j = L(i)
      while (j != i) {
        colSize(C(j)) += 1
        D(U(j)) = j; U(D(j)) = j
        j = L(j)
      }
      i = U(i)
    }
    R(L(c)) = c; L(R(c)) = c
  }

  /** Min-size uncovered column, or 0 if none remain (solution found). */
  private def chooseColumn(): Int = {
    var best = 0
    var bestSize = Int.MaxValue
    var c = R(0)
    while (c != 0) {
      if (colSize(c) < bestSize) { bestSize = colSize(c); best = c }
      c = R(c)
    }
    best
  }

  /** Select a row (cover all its columns) — for prefixes and puzzle clues.
    * Returns the nodes to un-select with [[deselectRow]] (reverse order). */
  private def selectRow(rowId: Int): Int = {
    val first = firstNodeOfRow(rowId)
    cover(C(first))
    var j = R(first)
    while (j != first) { cover(C(j)); j = R(j) }
    first
  }

  private def deselectRow(first: Int): Unit = {
    var j = L(first)
    while (j != first) { uncover(C(j)); j = L(j) }
    uncover(C(first))
  }

  /** Exhaustively count solutions, stopping early at `limit` if > 0. */
  private def countSearch(limit: Long): Long = {
    val c = chooseColumn()
    if (c == 0) return 1L
    if (colSize(c) == 0) return 0L
    cover(c)
    var total = 0L
    var r = D(c)
    while (r != c && (limit == 0L || total < limit)) {
      var j = R(r)
      while (j != r) { cover(C(j)); j = R(j) }
      total += countSearch(if (limit == 0L) 0L else limit - total)
      j = L(r)
      while (j != r) { uncover(C(j)); j = L(j) }
      r = D(r)
    }
    uncover(c)
    total
  }

  /** Count all solutions whose row set contains `prefix` (canonical replay). */
  def countCompletions(prefix: Array[Int], limit: Long = 0L): Long = {
    val undo = prefix.map(selectRow)
    val n = countSearch(limit)
    undo.reverseIterator.foreach(deselectRow)
    n
  }

  def countAll(limit: Long = 0L): Long = countCompletions(Array.empty, limit)

  /** Canonical depth-`depth` prefixes plus the count of solutions found at
    * shallower levels (complete before the split depth). */
  def prefixes(depth: Int): (Vector[Array[Int]], Long) = {
    val out = Vector.newBuilder[Array[Int]]
    var shallow = 0L
    val stack = new Array[Int](depth)
    def walk(level: Int): Unit = {
      if (level == depth) { out += stack.clone(); return }
      val c = chooseColumn()
      if (c == 0) { shallow += 1; return }
      if (colSize(c) == 0) return
      cover(c)
      var r = D(c)
      while (r != c) {
        stack(level) = rowOf(r)
        var j = R(r)
        while (j != r) { cover(C(j)); j = R(j) }
        walk(level + 1)
        j = L(r)
        while (j != r) { uncover(C(j)); j = L(j) }
        r = D(r)
      }
      uncover(c)
    }
    walk(0)
    (out.result(), shallow)
  }

  /** First solution containing `prefix`, as the full row-id set. Links are
    * fully restored on exit, so the instance stays reusable either way. */
  def findSolution(prefix: Array[Int] = Array.empty): Option[Array[Int]] = {
    val undo = prefix.map(selectRow)
    val chosen = ArrayBuffer[Int]()
    def search(): Boolean = {
      val c = chooseColumn()
      if (c == 0) return true
      if (colSize(c) == 0) return false
      cover(c)
      var r = D(c)
      var found = false
      while (r != c && !found) {
        chosen += rowOf(r)
        var j = R(r)
        while (j != r) { cover(C(j)); j = R(j) }
        found = search()
        j = L(r)
        while (j != r) { uncover(C(j)); j = L(j) }
        if (!found) { chosen.remove(chosen.length - 1); r = D(r) }
      }
      uncover(c)
      found
    }
    val hit = search()
    undo.reverseIterator.foreach(deselectRow)
    if (hit) Some((prefix ++ chosen).sorted) else None
  }
}
