package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import graft.sources.IO

/** HAR-analog in-place archive reading: tar (hand-built ustar bytes — the
  * public POSIX layout, no external tar needed) and zip (JDK writer). */
class ArchiveSpec extends SparkSpecBase {

  private def tarOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val b = ("%0" + (len - 1) + "o").format(v).getBytes("US-ASCII")
        System.arraycopy(b, 0, h, off, b.length)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(data.length.toLong, 124, 12)
      oct(0, 136, 12)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum field = spaces
      h(156) = '0'
      val cs = "%06o".format(h.map(_ & 0xff).sum).getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    bos.write(new Array[Byte](1024)) // two terminating zero blocks
    bos.toByteArray
  }

  test("tar entries read in place, including block-boundary sizes") {
    val dir = Files.createTempDirectory("graft_tar").toString
    val entries = Seq(
      "a.txt" -> "hello ar".getBytes("UTF-8"),
      "exact.bin" -> Array.tabulate[Byte](512)(i => (i % 127).toByte), // no pad block
      "empty.txt" -> Array.emptyByteArray)
    Files.write(Paths.get(dir, "arch.tar"), tarOf(entries: _*))
    val got = IO.readTarEntries(spark, dir).collect()
      .map(r => r.getAs[String]("entry") -> r.getAs[Array[Byte]]("bytes").toSeq).toMap
    assert(got.keySet == entries.map(_._1).toSet)
    entries.foreach { case (n, d) => assert(got(n) == d.toSeq, s"content mismatch for $n") }
  }

  test("zip entries read in place; directories skipped") {
    val dir = Files.createTempDirectory("graft_zip").toString
    val bos = new ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("sub/")) // directory: skipped
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("sub/x.txt"))
    z.write("zip payload".getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("y.bin"))
    z.write(Array[Byte](0, -1, 5)); z.closeEntry()
    z.close()
    Files.write(Paths.get(dir, "arch.zip"), bos.toByteArray)
    val got = IO.readZipEntries(spark, dir).collect()
      .map(r => r.getAs[String]("entry") -> r.getAs[Array[Byte]]("bytes").toSeq).toMap
    assert(got == Map("sub/x.txt" -> "zip payload".getBytes("UTF-8").toSeq,
      "y.bin" -> Seq[Byte](0, -1, 5)))
  }

  test("small-files-in-archive compute in place: wordcount over tar == direct") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_tar_wc").toString
    val texts = Seq("the quick fox", "the lazy dog the end")
    Files.write(Paths.get(dir, "docs.tar"),
      tarOf(texts.zipWithIndex.map { case (t, i) => s"d$i.txt" -> t.getBytes("UTF-8") }: _*))
    val fromTar = IO.readTarEntries(spark, dir)
      .select(explode(split(decode(col("bytes"), "UTF-8"), " ")).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = texts.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(fromTar == direct)
  }
}
