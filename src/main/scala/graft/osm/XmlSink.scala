package graft.osm

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** Ordered single-file bzip2 XML sink (K1 transport).
  *
  * The reference pipes one libxml2 stream through `bzip2 -c`
  * (`src/xml_writer.cpp:58-79`) — a single-threaded choke point. Here
  * each sorted range partition compresses its own complete bzip2 stream
  * in parallel on the executors, and the driver concatenates the streams
  * in partition order (bzip2 is multistream-concatenation-safe: `bunzip2`
  * of the concatenation yields the concatenation of the payloads). At
  * planet scale the parts would land on shared storage; the concat is a
  * byte-level copy, not a recompress.
  */
object XmlSink {

  def write(outPath: String, header: String, sections: Seq[Dataset[String]]): Unit = {
    val partsRoot = Paths.get(outPath + ".parts")
    deleteRec(partsRoot)
    sections.zipWithIndex.foreach { case (ds, si) =>
      val dir = partsRoot.resolve(f"sec$si%02d")
      Files.createDirectories(dir)
      val dirStr = dir.toString
      ds.foreachPartition { (it: Iterator[String]) =>
        if (it.hasNext) {
          val pid = TaskContext.get().partitionId()
          val f = new File(dirStr, f"part-$pid%05d.bz2")
          val os = new BZip2CompressorOutputStream(
            new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
          try it.foreach(s => os.write(s.getBytes(UTF_8)))
          finally os.close()
        }
      }
    }
    val out = new BufferedOutputStream(new FileOutputStream(outPath), 1 << 16)
    try {
      writeCompressed(out, header)
      sections.indices.foreach { si =>
        val dir = partsRoot.resolve(f"sec$si%02d")
        if (Files.isDirectory(dir)) {
          val parts = Files.list(dir).toArray.map(_.asInstanceOf[Path]).sortBy(_.getFileName.toString)
          parts.foreach(p => Files.copy(p, out))
        }
      }
      writeCompressed(out, XmlFormat.footer)
    } finally out.close()
    deleteRec(partsRoot)
  }

  private def writeCompressed(out: java.io.OutputStream, s: String): Unit = {
    val bz = new BZip2CompressorOutputStream(new NonClosingStream(out))
    bz.write(s.getBytes(UTF_8))
    bz.close()
  }

  private final class NonClosingStream(inner: java.io.OutputStream) extends java.io.FilterOutputStream(inner) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit = inner.write(b, off, len)
    override def close(): Unit = inner.flush()
  }

  private[osm] def deleteRecursive(p: Path): Unit = deleteRec(p)

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
