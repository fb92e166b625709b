package graft.osm

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Paths
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.apache.spark.sql.Dataset

/** Ordered single-file bzip2 XML sink (K1 transport).
  *
  * The reference pipes one libxml2 stream through `bzip2 -c`
  * (`src/xml_writer.cpp:58-79`) — a single-threaded choke point. Here
  * each sorted range partition compresses its own complete bzip2 stream
  * in parallel on the executors (via the retry-safe [[PartSink]]), and
  * the driver concatenates the streams in partition order (bzip2 is
  * multistream-concatenation-safe: `bunzip2` of the concatenation
  * yields the concatenation of the payloads). At planet scale the parts
  * land on shared storage; the concat is a byte-level copy, not a
  * recompress.
  */
object XmlSink {

  def write(outPath: String, header: String, sections: Seq[Dataset[String]]): Unit = {
    val partsRoot = Paths.get(outPath + ".parts")
    PartSink.deleteRecursive(partsRoot)
    val written = sections.zipWithIndex.map { case (ds, si) =>
      val dir = partsRoot.resolve(f"sec$si%02d")
      val ids = PartSink.writeParts(ds, dir) { (it, os) =>
        val bz = new BZip2CompressorOutputStream(os)
        it.foreach(s => bz.write(s.getBytes(UTF_8)))
        bz.finish()
      }
      (dir, ids)
    }
    val out = new BufferedOutputStream(new FileOutputStream(outPath), 1 << 16)
    try {
      writeCompressed(out, header)
      written.foreach { case (dir, ids) => PartSink.concat(out, dir, ids) }
      writeCompressed(out, XmlFormat.footer)
    } finally out.close()
    PartSink.deleteRecursive(partsRoot)
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
}
