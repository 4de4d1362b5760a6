package graft

import graft.ops._

/** Specs for the distributed-compute example family: BBP pi digits and the
  * dancing-links exact-cover ops (pentomino tilings, sudoku corpus solve).
  * Ground truths are closed-form/public: pi's hex expansion (independently
  * recomputable by any bignum Machin evaluation) and the published pentomino
  * tiling counts. */
class ComputePuzzleSpec extends SparkSpecBase {

  // first 128 fractional hex digits of pi (verified against a big-integer
  // Machin-formula evaluation, 140-digit working precision)
  private val PiHex128 =
    "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89" +
    "452821E638D01377BE5466CF34E90C6CC0AC29B7C97C50DD3F84D5B5B5470917"

  test("bbp: single-offset digit extraction matches ground truth at several offsets") {
    assert(ComputeOps.hexDigitsAt(0) == "243F")
    assert(ComputeOps.hexDigitsAt(60) == PiHex128.substring(60, 64))
    assert(ComputeOps.hexDigitsAt(124) == PiHex128.substring(124, 128))
  }

  test("bbp: distributed 128-digit computation concatenates to the known expansion") {
    assert(ComputeOps.piHex(spark, 128) == PiHex128)
  }

  test("bbp far path: mulMod52 exact vs BigInteger across the 2^52 modulus range") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val n = (math.abs(rnd.nextLong()) % ((1L << 52) - 3)) + 2
      val a = math.abs(rnd.nextLong()) % n
      val b = math.abs(rnd.nextLong()) % n
      val want = (BigInt(a) * BigInt(b) % BigInt(n)).toLong
      assert(ComputeOps.mulMod52(a, b, n) == want, s"mulMod52($a, $b, $n)")
    }
  }

  test("bbp far path: distributed long-modular digits == near path inside " +
    "the near path's validity range, and == the known expansion") {
    assert(ComputeOps.hexDigitsAtFar(spark, 0) == "243F")
    assert(ComputeOps.hexDigitsAtFar(spark, 60) == PiHex128.substring(60, 64))
    assert(ComputeOps.hexDigitsAtFar(spark, 124) == PiHex128.substring(124, 128))
    // an offset large enough to exercise many-chunk distribution
    val d = 100000L
    assert(ComputeOps.hexDigitsAtFar(spark, d, chunk = 4096) ==
      ComputeOps.hexDigitsAt(d))
  }

  test("bbp far path: overlap self-validation past the near path's " +
    "double-accuracy regime (the exact-modulus arithmetic is separately " +
    "BigInteger-proven across the full 2^52 range)") {
    // two INDEPENDENT distributed summations at offsets d and d+2 share no
    // state; their overlapping digits agreeing to 2 hex chars is a 1/256
    // coincidence under error — the DistBbp self-check. Default offset
    // 1.2e8 keeps the suite fast; tools/BbpFar runs the same check at
    // beyond-Long offsets (4e8+, modulus^2 > Long.Max) as a committed
    // scale artifact, and GRAFT_BBP_FAR_OFFSET overrides here.
    val d = sys.env.getOrElse("GRAFT_BBP_FAR_OFFSET", "120000000").toLong
    val a = ComputeOps.hexDigitsAtFar(spark, d)
    val b = ComputeOps.hexDigitsAtFar(spark, d + 2)
    assert(a.substring(2) == b.substring(0, 2),
      s"overlap mismatch at $d: $a vs $b")
  }

  test("bbp: overlapping independent extractions agree (self-validation)") {
    // digits (d+1..d+4) from offset d overlap digits from offset d+2 — the
    // TeraValidate idiom: adjacent independent computations must agree
    for (d <- Seq(37L, 1000L, 9999L)) {
      val a = ComputeOps.hexDigitsAt(d)
      val b = ComputeOps.hexDigitsAt(d + 2)
      assert(a.substring(2) == b.substring(0, 2), s"offset $d: $a vs $b")
    }
  }

  test("exact cover: toy matrix has the expected solutions and prefix split is exact") {
    // Knuth's example: 7 columns, rows spelling a unique cover
    val ec = new ExactCover(7)
    Seq(
      0 -> Array(3, 5, 6),
      1 -> Array(1, 4, 7),
      2 -> Array(2, 3, 6),
      3 -> Array(1, 4),
      4 -> Array(2, 7),
      5 -> Array(4, 5, 7)
    ).foreach { case (id, cols) => ec.addRow(id, cols) }
    assert(ec.countAll() == 1L)
    assert(ec.findSolution().map(_.toSet).contains(Set(0, 3, 4)))
    // prefix split at every depth reproduces the total
    for (d <- 1 to 3) {
      val (prefs, shallow) = ec.prefixes(d)
      val total = shallow + prefs.map(p => ec.countCompletions(p)).sum
      assert(total == 1L, s"depth $d split lost/duplicated solutions: $total")
    }
  }

  test("pentomino: 3x20 board has exactly 8 tilings (2 essentially distinct x 4 symmetries)") {
    assert(PuzzleOps.pentominoMatrix(3, 20).countAll() == 8L)
  }

  test("pentomino: prefix split equals direct count on 3x20 and 4x15") {
    for (((w, h), expect) <- Seq((3, 20) -> 8L, (4, 15) -> 1472L)) {
      val ec = PuzzleOps.pentominoMatrix(w, h)
      val (prefs, shallow) = ec.prefixes(3)
      val split = shallow + prefs.map(p => ec.countCompletions(p)).sum
      assert(split == expect, s"${w}x$h: split=$split expect=$expect")
    }
  }

  test("pentomino: distributed counts match published tiling numbers") {
    val rows = PuzzleOps.pentominoCounts(spark, Seq((3, 20), (4, 15), (5, 12)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("3x20" -> 8L, "4x15" -> 1472L, "5x12" -> 4040L))
  }

  test("sudoku: solves a canonical puzzle and preserves clues") {
    // a public minimal-style puzzle with a unique solution
    val puzzle =
      "530070000600195000098000060800060003400803001700020006060000280000419005000080079"
    val sol = PuzzleOps.solveSudoku(puzzle.map(_ - '0'))
    assert(sol.isDefined)
    val s = sol.get.map(_ - '0')
    assert(PuzzleOps.validSudoku(s))
    assert(puzzle.indices.forall(i => puzzle(i) == '0' || puzzle(i) - '0' == s(i)))
  }

  test("sudoku: unsatisfiable puzzle returns None") {
    // two 5s in the first row
    val bad = "55" + "0" * 79
    assert(PuzzleOps.solveSudoku(bad.map(_ - '0')).isEmpty)
  }

  test("sudoku: generated corpus is solvable, valid, clue-preserving — distributed") {
    val out = PuzzleOps.sudokuSolveAll(PuzzleOps.sudokuPuzzles(spark, 60, blanks = 40)).collect()
    assert(out.length == 60)
    assert(out.forall(_.getBoolean(2)), "every solution must satisfy all constraints")
    assert(out.forall(_.getBoolean(3)), "every solution must preserve its clues")
  }

  test("sudoku: uniqueness-bounded blanking solves back to the base grid") {
    // blank few enough cells that the solution stays unique (verified via
    // countCompletions limit 2), then the solver must recover the original
    val full = PuzzleOps.puzzleForId(3L, blanks = 0)
    val holed = PuzzleOps.puzzleForId(3L, blanks = 24)
    val clues = holed.map(_ - '0')
    val mat = {
      val m = PuzzleOps.sudokuMatrixForTest()
      val prefix = (for (i <- clues.indices if clues(i) != 0) yield i * 9 + (clues(i) - 1)).toArray
      m.countCompletions(prefix, limit = 2)
    }
    assume(mat == 1L, "blanking happened to break uniqueness — skip equality check")
    assert(PuzzleOps.solveSudoku(clues).contains(full))
  }

  test("sudoku: 6x6 boards (2x3 boxes) solve correctly — general box geometry") {
    val blank = IndexedSeq.fill(36)(0)
    val sol = PuzzleOps.solveSudoku(blank, sx = 3, sy = 2)
    assert(sol.isDefined && PuzzleOps.validSudoku(sol.get.map(_ - '0'), sx = 3, sy = 2))
  }
}
