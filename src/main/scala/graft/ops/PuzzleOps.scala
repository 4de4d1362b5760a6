package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed combinatorial search — the dancing-links example family.
  *
  * Reference analogs: dancing/DistributedPentomino.java:1 (client enumerates
  * search-tree prefixes to a fixed depth, each map task exhausts one
  * prefix's subtree, a reducer collects solutions) and dancing/Sudoku.java:1
  * (the same exact-cover core solving a puzzle instance). Spark-native form:
  * the prefix vectors ARE the distributed dataset — a driver-side
  * enumeration bounded by `splitDepth` (the reference's createInputDirectory
  * does exactly this client-side), fanned out with `spark.createDataset`,
  * each task rebuilding the tiny matrix and counting completions; a
  * `groupBy(board).sum` is the reducer. Sudoku scales out across PUZZLES
  * (solve a corpus per-row, map-side, no shuffle) rather than within one
  * 9x9 instance.
  *
  * The search core is [[ExactCover]]; per-prefix subtrees are disjoint and
  * exhaustive (see its scaladoc), so per-prefix counts sum exactly. At scale
  * the shape holds: deeper `splitDepth` yields more, finer work units
  * (thousands-to-millions of independent prefixes for a 1000-executor fan-
  * out) with zero shuffle until the final count aggregation.
  */
object PuzzleOps {

  // ---------------------------------------------------------------- pentomino

  /** The 12 free pentominoes as ASCII grids (public shapes, standard names). */
  private val pentominoShapes: Seq[(String, Seq[String])] = Seq(
    "F" -> Seq(".##", "##.", ".#."),
    "I" -> Seq("#####"),
    "L" -> Seq("#.", "#.", "#.", "##"),
    "N" -> Seq(".#", ".#", "##", "#."),
    "P" -> Seq("##", "##", "#."),
    "T" -> Seq("###", ".#.", ".#."),
    "U" -> Seq("#.#", "###"),
    "V" -> Seq("#..", "#..", "###"),
    "W" -> Seq("#..", "##.", ".##"),
    "X" -> Seq(".#.", "###", ".#."),
    "Y" -> Seq(".#", "##", ".#", ".#"),
    "Z" -> Seq("##.", ".#.", ".##")
  )

  private def cellsOf(grid: Seq[String]): Set[(Int, Int)] =
    (for { (row, y) <- grid.zipWithIndex; (ch, x) <- row.zipWithIndex if ch == '#' }
      yield (x, y)).toSet

  private def normalize(cells: Set[(Int, Int)]): Set[(Int, Int)] = {
    val mx = cells.map(_._1).min; val my = cells.map(_._2).min
    cells.map { case (x, y) => (x - mx, y - my) }
  }

  /** The four rotations of a cell set, normalized + deduped. */
  private def rotationOrbit(cells: Set[(Int, Int)]): Seq[Set[(Int, Int)]] =
    Iterator.iterate(normalize(cells), 4)(c => normalize(c.map { case (x, y) => (-y, x) }))
      .toSeq.distinct

  /** All distinct orientations (rotations x reflection) of a cell set. */
  private def orientations(cells: Set[(Int, Int)]): Seq[Set[(Int, Int)]] = {
    val rots = rotationOrbit(cells)
    val flips = rots.map(c => normalize(c.map { case (x, y) => (-x, y) }))
    (rots ++ flips).distinct
  }

  /** Per-piece orientation lists for the FREE game (12 pieces, rotations +
    * reflections — Pentomino.java's default flippable pieces). */
  private lazy val freePieceOrients: Seq[Seq[Set[(Int, Int)]]] =
    pentominoShapes.map { case (_, grid) => orientations(cellsOf(grid)) }

  /** Per-piece orientation lists for the ONE-SIDED game (reference analog
    * dancing/OneSidedPentomino.java:1: pieces may rotate but NOT flip, so
    * each of the 6 chiral pentominoes — F L N P Y Z — contributes its
    * mirror as a SEPARATE piece: 18 pieces, 90 cells). Chirality is
    * detected, not hardcoded: a piece is chiral iff its mirror's rotation
    * orbit differs from its own. */
  private[graft] lazy val oneSidedPieceOrients: Seq[Seq[Set[(Int, Int)]]] =
    pentominoShapes.flatMap { case (_, grid) =>
      val c = normalize(cellsOf(grid))
      val rots = rotationOrbit(c)
      val mirror = normalize(c.map { case (x, y) => (-x, y) })
      val mrots = rotationOrbit(mirror)
      if (rots.toSet == mrots.toSet) Seq(rots) else Seq(rots, mrots)
    }

  /** Placement table for a width x height board: every (piece, orientation,
    * offset) that fits, as (rowId -> covered 1-based columns). Columns:
    * 1..nPieces pieces, then nPieces+1..nPieces+w*h cells. Deterministic
    * ordering. One-sided boards need 90 cells (18 pieces); free need 60. */
  private[graft] def pentominoPlacements(width: Int, height: Int,
                                         oneSided: Boolean = false): Vector[Array[Int]] = {
    val pieces = if (oneSided) oneSidedPieceOrients else freePieceOrients
    val nP = pieces.size
    require(width * height == nP * 5,
      s"board ${width}x$height must have ${nP * 5} cells for $nP pieces")
    val out = Vector.newBuilder[Array[Int]]
    for {
      (orients, p) <- pieces.zipWithIndex
      orient <- orients
      ow = orient.map(_._1).max + 1; oh = orient.map(_._2).max + 1
      oy <- 0 to height - oh
      ox <- 0 to width - ow
    } {
      val cellCols = orient.toArray.map { case (x, y) =>
        nP + 1 + (oy + y) * width + (ox + x) }
      out += (Array(p + 1) ++ cellCols.sorted)
    }
    out.result()
  }

  private[graft] def pentominoMatrix(width: Int, height: Int,
                                     oneSided: Boolean = false): ExactCover = {
    val nP = (if (oneSided) oneSidedPieceOrients else freePieceOrients).size
    val ec = new ExactCover(nP + width * height)
    pentominoPlacements(width, height, oneSided).zipWithIndex
      .foreach { case (cols, id) => ec.addRow(id, cols) }
    ec
  }

  /** Distributed full-tiling count per board. Boards as "WxH" labels.
    * Known ground truth, free game (all tilings, symmetric duplicates
    * included): 3x20 = 8, 4x15 = 1472, 5x12 = 4040, 6x10 = 9356.
    * One-sided game (oneSided = true, 18 pieces on 90 cells — reference
    * analog dancing/OneSidedPentomino.java:1): 3x30 = 184, i.e. 4 x the
    * published 46 distinct-up-to-board-symmetry solutions (none is
    * self-symmetric; duplicates-included is this suite's convention —
    * 6x10 free = 9356 = 4 x 2339 the same way). The 5x18/6x15/9x10 boards
    * run the same way but count in the 10^5–10^7 range. */
  def pentominoCounts(spark: SparkSession,
                      boards: Seq[(Int, Int)] = Seq((3, 20), (4, 15), (5, 12), (6, 10)),
                      splitDepth: Int = 3,
                      numPartitions: Int = 32,
                      oneSided: Boolean = false): DataFrame = {
    import spark.implicits._
    // client-side prefix enumeration — bounded, cheap, the reference's input-
    // generation step (DistributedPentomino.java:128-140)
    val work = boards.flatMap { case (w, h) =>
      val (prefs, shallow) = pentominoMatrix(w, h, oneSided).prefixes(splitDepth)
      val prefixRows = prefs.map(p => (s"${w}x$h", p.toSeq, 0L))
      // solutions completing above the split depth ride along as a count row
      prefixRows :+ ((s"${w}x$h", Seq.empty[Int], shallow))
    }
    spark.createDataset(work)
      .repartition(numPartitions) // spread prefixes; subtree sizes vary, small units smooth skew
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap[String, ExactCover]()
        it.map { case (board, prefix, carried) =>
          val n =
            if (prefix.isEmpty) carried
            else {
              val Array(w, h) = board.split("x").map(_.toInt)
              val ec = cache.getOrElseUpdate(board, pentominoMatrix(w, h, oneSided))
              ec.countCompletions(prefix.toArray)
            }
          (board, n)
        }
      }
      .toDF("board", "n")
      .groupBy("board").agg(sum("n").as("solutions"))
      .orderBy("board")
  }

  // ------------------------------------------------------------------ sudoku

  /** Exact-cover matrix for a (sx*sy)^2 sudoku: constraint families
    * cell / row-number / column-number / box-number, one row per (r,c,n).
    * Row id = (r*s + c)*s + n-1 — decodable without a side table. */
  private[graft] def sudokuMatrix(sx: Int, sy: Int): ExactCover = {
    val s = sx * sy
    val ec = new ExactCover(4 * s * s)
    for (r <- 0 until s; c <- 0 until s; n <- 0 until s) {
      val box = (r / sy) * sy + c / sx
      ec.addRow((r * s + c) * s + n, Array(
        1 + r * s + c,
        1 + s * s + r * s + n,
        1 + 2 * s * s + c * s + n,
        1 + 3 * s * s + box * s + n))
    }
    ec
  }

  /** Solve one puzzle given as s*s digits row-major, 0 = blank. Returns the
    * solved digit string, or None if unsatisfiable. */
  def solveSudoku(puzzle: IndexedSeq[Int], sx: Int = 3, sy: Int = 3): Option[String] = {
    val s = sx * sy
    require(puzzle.length == s * s, s"puzzle must have ${s * s} cells")
    val clues = for (i <- puzzle.indices if puzzle(i) != 0) yield i * s + (puzzle(i) - 1)
    sudokuMatrix(sx, sy).findSolution(clues.toArray).map { rows =>
      val grid = new Array[Int](s * s)
      rows.foreach(id => grid(id / s) = id % s + 1)
      grid.mkString("")
    }
  }

  /** True iff `digits` (s*s, 1..s) satisfies all row/col/box constraints. */
  def validSudoku(digits: IndexedSeq[Int], sx: Int = 3, sy: Int = 3): Boolean = {
    val s = sx * sy
    if (digits.length != s * s || digits.exists(d => d < 1 || d > s)) return false
    def distinct(cells: Seq[Int]) = cells.map(digits).toSet.size == s
    (0 until s).forall { i =>
      distinct((0 until s).map(j => i * s + j)) &&
      distinct((0 until s).map(j => j * s + i)) &&
      distinct {
        val r0 = (i / sy) * sy; val c0 = (i % sy) * sx
        for (dr <- 0 until sy; dc <- 0 until sx) yield (r0 + dr) * s + c0 + dc
      }
    }
  }

  /** Test hook: the 9x9 matrix (uniqueness probes in specs). */
  private[graft] def sudokuMatrixForTest(): ExactCover = sudokuMatrix(3, 3)

  private val M31 = 2147483648L
  private def lcg(x: Long): Long = (x * 1103515245L + 12345L) % M31

  /** Deterministic puzzle corpus: a cyclic base grid per id (digit-relabeled
    * by a seeded permutation) with `blanks` seeded holes. Reproducible across
    * runs/partitionings — rows are pure functions of (id). */
  def sudokuPuzzles(spark: SparkSession, n: Int, blanks: Int = 40): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, math.min(32, math.max(1, n / 4)))
      .as[Long]
      .map { id => (id, puzzleForId(id, blanks)) }
      .toDF("puzzle_id", "puzzle")
  }

  /** Uniqueness-bounded corpus: same deterministic generation as
    * [[sudokuPuzzles]], then clues are restored (most-recently-blanked
    * first — a deterministic repair order) until the puzzle has exactly ONE
    * solution. Because the planted source grid is A solution and the
    * repaired puzzle admits only one, the solver MUST recover the planted
    * grid — which makes the expected output a pure function of (id),
    * computable without any solver: the literal-VALUES oracle the driver
    * gate hash-compares (closing the one rows-only gate entry). */
  def sudokuPuzzlesUnique(spark: SparkSession, n: Int, blanks: Int = 40): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, math.min(32, math.max(1, n / 4)))
      .as[Long]
      .map { id => (id, puzzleAndSolutionForId(id, blanks)._1) }
      .toDF("puzzle_id", "puzzle")
  }

  /** (puzzle, planted solution) for one id, uniqueness-repaired. Pure
    * function of (id, blanks) — runs identically on executors (corpus
    * generation) and on the driver (oracle construction). */
  private[graft] def puzzleAndSolutionForId(id: Long, blanks: Int): (String, String) = {
    val s = 9
    val full = fullGridForId(id)
    val grid = full.clone()
    var st = blankSeedForId(id)
    val order = scala.collection.mutable.ArrayBuffer[Int]()
    var blanked = 0
    while (blanked < math.min(blanks, s * s)) {
      st = lcg(st)
      val pos = (st % (s * s)).toInt
      if (grid(pos) != 0) { grid(pos) = 0; order += pos; blanked += 1 }
    }
    // repair to uniqueness: restore most-recently-blanked clues until the
    // exact-cover count (capped at 2) is 1. Terminates — zero blanks is
    // trivially unique. Each check is one 9x9 matrix build + bounded search.
    def solutionCount(): Long = {
      val clues = for (i <- grid.indices if grid(i) != 0) yield i * s + (grid(i) - 1)
      sudokuMatrix(3, 3).countCompletions(clues.toArray, limit = 2L)
    }
    var k = order.length - 1
    while (solutionCount() > 1L && k >= 0) {
      grid(order(k)) = full(order(k))
      k -= 1
    }
    (grid.mkString(""), full.mkString(""))
  }

  /** The valid pre-blanking grid for an id: cyclic base construction with a
    * seeded digit relabeling (shared by [[puzzleForId]] and the unique
    * variant so both corpora plant the same solutions). */
  private def fullGridForId(id: Long): Array[Int] = {
    val s = 9
    val base = Array.tabulate(s * s)(i => ((i / s) * 3 + (i / s) / 3 + i % s) % s + 1)
    val perm = (1 to s).toArray
    var st = lcg(id + 7919)
    for (i <- s - 1 to 1 by -1) {
      st = lcg(st)
      val j = (st % (i + 1)).toInt
      val t = perm(i); perm(i) = perm(j); perm(j) = t
    }
    base.map(d => perm(d - 1))
  }

  /** LCG state right after the digit-relabel shuffle — the blank mask must
    * continue the same stream to reproduce [[puzzleForId]]'s corpus. */
  private def blankSeedForId(id: Long): Long = {
    var st = lcg(id + 7919)
    for (_ <- 8 to 1 by -1) st = lcg(st)
    st
  }

  private[graft] def puzzleForId(id: Long, blanks: Int): String = {
    val s = 9
    val grid = fullGridForId(id)
    // seeded blank mask (continues the relabel LCG stream)
    var st = blankSeedForId(id)
    var blanked = 0
    while (blanked < math.min(blanks, s * s)) {
      st = lcg(st)
      val pos = (st % (s * s)).toInt
      if (grid(pos) != 0) { grid(pos) = 0; blanked += 1 }
    }
    grid.mkString("")
  }

  /** Map-side distributed solve over a (puzzle_id, puzzle) corpus:
    * (puzzle_id, solution, valid, clues_kept). */
  def sudokuSolveAll(puzzles: DataFrame): DataFrame = {
    val spark = puzzles.sparkSession
    import spark.implicits._
    puzzles.select(col("puzzle_id").cast("long"), col("puzzle"))
      .as[(Long, String)]
      .map { case (id, pz) =>
        val cells = pz.map(_ - '0')
        solveSudoku(cells) match {
          case Some(sol) =>
            val solved = sol.map(_ - '0')
            val cluesKept = cells.indices.forall(i => cells(i) == 0 || cells(i) == solved(i))
            (id, sol, validSudoku(solved), cluesKept)
          case None => (id, "", false, false)
        }
      }
      .toDF("puzzle_id", "solution", "valid", "clues_kept")
  }
}
