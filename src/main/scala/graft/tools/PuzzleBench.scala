package graft.tools

import graft.ops.PuzzleOps
import graft.GraftSessions

/** One-off timing probe for the dancing-links ops: single-threaded DLX walls
  * vs the prefix-split distributed path. Not part of the driver contract. */
object PuzzleBench {
  def main(args: Array[String]): Unit = {
    for ((w, h) <- Seq((3, 20), (4, 15), (5, 12), (6, 10))) {
      val t0 = System.nanoTime()
      val n = PuzzleOps.pentominoMatrix(w, h).countAll()
      println(f"${w}x$h single-thread: $n tilings in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val spark = GraftSessions.local("32")
    val t1 = System.nanoTime()
    val rows = PuzzleOps.pentominoCounts(spark).collect()
    println(f"distributed all boards: ${rows.mkString(" ")} in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val t2 = System.nanoTime()
    val solved = PuzzleOps.sudokuSolveAll(PuzzleOps.sudokuPuzzles(spark, 200)).collect()
    println(f"sudoku 200 puzzles: ${solved.count(_.getBoolean(2))} valid in ${(System.nanoTime() - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
