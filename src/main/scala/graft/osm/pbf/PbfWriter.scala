package graft.osm.pbf

import java.io.OutputStream
import Proto._

/** Sequential OSMPBF writer replicating the reference byte-for-byte
  * (`src/pbf_writer.cpp`): same string-table interning order, delta
  * encoding, group flush thresholds (16000 nodes / 8000 ways / 200
  * relations / relation size estimate), block byte limit (1/8 of the
  * 16 MiB max uncompressed blob), zlib-9 blobs, and header features.
  *
  * Attribution arrives pre-joined on each element (changeset→uid→public
  * display_name resolved relationally upstream) instead of via the
  * reference's in-memory maps — `attrUid == null` means the changeset
  * was missing from the changesets table, which in FULL mode is a hard
  * error exactly like the reference (`src/pbf_writer.cpp:313-318`).
  */
final class PbfWriter(out: OutputStream, generator: String, history: Boolean,
                      anon: Boolean, denseNodes: Boolean,
                      maxTime: Option[java.sql.Timestamp],
                      source: String = "http://www.openstreetmap.org/api/0.6",
                      writeHeader: Boolean = true) {

  private val MaxUncompressedBlobSize = 16 * 1024 * 1024
  private val ByteLimit: Long = (0.125 * MaxUncompressedBlobSize).toInt // 2 MiB

  // element types (flush state machine)
  private val T_NULL = 0; private val T_CS = 1; private val T_NODE = 2
  private val T_WAY = 3; private val T_REL = 4
  private val recheck = Array[Long](1, 1, 16000, 8000, 200)

  private var curType = T_NULL
  private var numElements = 0L
  private var estPblockSize = 0L
  private var estPgroupSz = 0L

  // ---- string table (id 0 reserved; duplicates of "" beyond the
  // reserved slot are real interned entries, as in the reference) ----
  private val strMap = new java.util.HashMap[String, Int]()
  private val strList = new java.util.ArrayList[Array[Byte]]()
  private var strNextId = 1
  private var strApproxSize = 0L

  private def intern(s: String): Int = {
    val existing = strMap.get(s) // ids start at 1, so 0 (unboxed null) = absent
    if (existing != 0) existing
    else {
      val id = strNextId; strNextId += 1
      strMap.put(s, id)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      strList.add(b)
      // UTF-8 BYTE size, like the reference's std::string::size() —
      // char count would under-estimate non-ASCII tables ~3× and shift
      // block boundaries off the golden layout
      strApproxSize += b.length + (if (b.length > 128) 2 else 1)
      id
    }
  }

  private def strTableBytes: Array[Byte] = {
    val o = new Out(1 << 12)
    o.writeBytesField(1, Array.emptyByteArray) // reserved id 0
    var i = 0
    while (i < strList.size()) { o.writeBytesField(1, strList.get(i)); i += 1 }
    o.toBytes
  }

  private def strClear(): Unit = { strMap.clear(); strList.clear(); strNextId = 1; strApproxSize = 0 }

  // ---- dense-node state (reset per group) ----
  private val dIds = new LongBuf(); private val dLats = new LongBuf(); private val dLons = new LongBuf()
  private val dVersions = new LongBuf(); private val dTss = new LongBuf(); private val dCss = new LongBuf()
  private val dUids = new LongBuf(); private val dUserSids = new LongBuf(); private val dVisibles = new LongBuf()
  private val dKeysVals = new LongBuf()
  private var lastDenseId = 0L; private var lastDenseLat = 0L; private var lastDenseLon = 0L
  private var lastDenseTs = 0L; private var lastDenseCs = 0L
  private var lastDenseUid = 0; private var lastDenseUserSid = 0

  private def resetDenseIds(): Unit = {
    lastDenseId = 0; lastDenseLat = 0; lastDenseLon = 0; lastDenseTs = 0; lastDenseCs = 0
    lastDenseUid = 0; lastDenseUserSid = 0
  }

  private def denseClear(): Unit = {
    dIds.clear(); dLats.clear(); dLons.clear(); dVersions.clear(); dTss.clear(); dCss.clear()
    dUids.clear(); dUserSids.clear(); dVisibles.clear(); dKeysVals.clear()
  }

  // ---- non-dense element buffers (serialized per element message) ----
  private val groupElements = new java.util.ArrayList[Array[Byte]]()
  private var groupField = 0 // 1 nodes, 2 dense, 3 ways, 4 relations

  private val closedGroups = new java.util.ArrayList[Array[Byte]]()

  // parallel block-encoding mode: partitions write headerless block
  // streams that concatenate after a driver-written header (each block
  // is self-contained: own string table, deltas reset per group)
  if (writeHeader) writeHeaderBlock()

  // ------------------------------------------------------------------
  private def writeHeaderBlock(): Unit = {
    val h = new Out(256)
    val bbox = new Out(48)
    val res = 1000000000L // OSMPBF lonlat_resolution
    bbox.writeVarintField(1, zigzag64(-180L * res))
    bbox.writeVarintField(2, zigzag64(180L * res))
    bbox.writeVarintField(3, zigzag64(90L * res))
    bbox.writeVarintField(4, zigzag64(-90L * res))
    h.writeBytesField(1, bbox.toBytes)
    h.writeStringField(4, "OsmSchema-V0.6")
    if (history) h.writeStringField(4, "HistoricalInformation")
    if (denseNodes) h.writeStringField(4, "DenseNodes")
    h.writeStringField(5, "Has_Metadata")
    h.writeStringField(5, "Sort.Type_then_ID")
    h.writeStringField(16, generator)
    h.writeStringField(17, source)
    maxTime.foreach(t => h.writeVarintField(32, Math.floorDiv(t.getTime, 1000L)))
    writeBlob("OSMHeader", h.toBytes)
  }

  private def writeBlob(blobType: String, msg: Array[Byte]): Unit = {
    require(msg.length < MaxUncompressedBlobSize,
      s"Unable to write block of type $blobType, uncompressed size ${msg.length} exceeds maximum")
    val blob = new Out(msg.length / 2 + 64)
    blob.writeVarintField(2, msg.length.toLong) // raw_size
    blob.writeBytesField(3, zlib9(msg)) // zlib_data
    val blobBytes = blob.toBytes
    val bh = new Out(32)
    bh.writeStringField(1, blobType)
    bh.writeVarintField(3, blobBytes.length.toLong) // datasize
    val bhBytes = bh.toBytes
    out.write(Array[Byte](
      (bhBytes.length >>> 24).toByte, (bhBytes.length >>> 16).toByte,
      (bhBytes.length >>> 8).toByte, bhBytes.length.toByte))
    out.write(bhBytes)
    out.write(blobBytes)
  }

  /** Serialize the current group's content (== pgroup.ByteSizeLong). */
  private def serializeCurrentGroup(): Array[Byte] = {
    val o = new Out(1 << 16)
    if (groupField == 2) { // dense
      if (dIds.size > 0) {
        val dense = new Out(1 << 16)
        dIds.writePackedZigzag(dense, 1)
        val info = new Out(1 << 15)
        dVersions.writePackedInt32(info, 1)
        dTss.writePackedZigzag(info, 2)
        dCss.writePackedZigzag(info, 3)
        dUids.writePackedZigzag32(info, 4)
        dUserSids.writePackedZigzag32(info, 5)
        dVisibles.writePackedVarint(info, 6)
        dense.writeBytesField(5, info.toBytes)
        dLats.writePackedZigzag(dense, 8)
        dLons.writePackedZigzag(dense, 9)
        dKeysVals.writePackedInt32(dense, 10)
        o.writeBytesField(2, dense.toBytes)
      }
    } else if (groupField != 0) {
      var i = 0
      while (i < groupElements.size()) { o.writeBytesField(groupField, groupElements.get(i)); i += 1 }
    }
    o.toBytes
  }

  /** The reference's check_overflow (`src/pbf_writer.cpp:224-266`). */
  private def checkOverflow(tpe: Int): Unit = {
    if (curType == T_NULL || curType == T_CS) curType = tpe
    if (curType != tpe || numElements >= recheck(curType) ||
        (curType == T_REL && estPblockSize + estPgroupSz + strApproxSize > ByteLimit)) {
      val gBytes = serializeCurrentGroup()
      estPblockSize += gBytes.length
      val newBlock = (curType != tpe) || (estPblockSize + strApproxSize >= ByteLimit)
      closedGroups.add(gBytes)
      if (newBlock) {
        val pblock = new Out(1 << 20)
        pblock.writeBytesField(1, strTableBytes)
        var i = 0
        while (i < closedGroups.size()) {
          // groups serialized at close time; empty groups (e.g. the
          // initial one) still serialize as empty submessages like the
          // reference's add_primitivegroup
          pblock.writeBytesField(2, closedGroups.get(i)); i += 1
        }
        writeBlob("OSMData", pblock.toBytes)
        closedGroups.clear()
        strClear()
        curType = tpe
        estPblockSize = 0
      }
      resetDenseIds()
      denseClear()
      groupElements.clear()
      numElements = 0
      estPgroupSz = 0
    }
    groupField = tpe match {
      case T_NODE => if (denseNodes) 2 else 1
      case T_WAY => 3
      case T_REL => 4
      case _ => 0
    }
  }

  /** Shared Info submessage (`src/pbf_writer.cpp:297-327`). FULL mode
    * with a missing changeset throws, like the reference.
    */
  private def infoBytes(version: Long, tsSec: Long, csId: Long,
                        attrUid: java.lang.Long, userName: String, visible: Boolean): Array[Byte] = {
    if (!anon && attrUid == null)
      throw new IllegalStateException(s"Unable to find changeset $csId in changeset-to-user map.")
    val o = new Out(40)
    o.writeVarintField(1, version)
    o.writeVarintField(2, tsSec)
    o.writeVarintField(3, csId)
    if (!anon && userName != null) { // public user — else uid/user_sid absent
      o.writeVarintField(4, attrUid.longValue())
      o.writeVarintField(5, intern(userName).toLong)
    }
    if (history && !visible) o.writeVarintField(6, 0L)
    o.toBytes
  }

  def node(id: Long, visible: Boolean, lat: Int, lon: Int, version: Long, tsSec: Long,
           csId: Long, attrUid: java.lang.Long, userName: String,
           tags: Iterator[(String, String)]): Unit = {
    checkOverflow(T_NODE)
    if (denseNodes) {
      dIds.add { val d = id - lastDenseId; lastDenseId = id; d }
      val lonV = if (visible) lon.toLong else 0L
      val latV = if (visible) lat.toLong else 0L
      dLons.add { val d = lonV - lastDenseLon; lastDenseLon = lonV; d }
      dLats.add { val d = latV - lastDenseLat; lastDenseLat = latV; d }
      dVersions.add(version)
      dTss.add { val d = tsSec - lastDenseTs; lastDenseTs = tsSec; d }
      dCss.add { val d = csId - lastDenseCs; lastDenseCs = csId; d }
      if (history) dVisibles.add(if (visible) 1L else 0L)
      var uid = 0
      var sid = 0
      if (!anon) {
        if (attrUid == null)
          throw new IllegalStateException(s"Unable to find changeset $csId in changeset-to-user map for dense node.")
        if (userName != null) { uid = attrUid.toInt; sid = intern(userName) }
        else { uid = 0; sid = intern("") }
      } else { uid = 0; sid = intern("") }
      dUids.add({ val d = uid - lastDenseUid; lastDenseUid = uid; d }.toLong)
      dUserSids.add({ val d = sid - lastDenseUserSid; lastDenseUserSid = sid; d }.toLong)
      if (visible) tags.foreach { case (k, v) =>
        dKeysVals.add(intern(k).toLong); dKeysVals.add(intern(v).toLong)
      }
      dKeysVals.add(0L) // per-node terminator, even for tagless nodes
    } else {
      val info = infoBytes(version, tsSec, csId, attrUid, userName, visible)
      val keys = new LongBuf(8); val vals = new LongBuf(8)
      if (visible) tags.foreach { case (k, v) => keys.add(intern(k).toLong); vals.add(intern(v).toLong) }
      val o = new Out(64)
      o.writeVarintField(1, zigzag64(id))
      keys.writePackedVarint(o, 2)
      vals.writePackedVarint(o, 3)
      o.writeBytesField(4, info)
      o.writeVarintField(8, zigzag64(if (visible) lat.toLong else 0L))
      o.writeVarintField(9, zigzag64(if (visible) lon.toLong else 0L))
      groupElements.add(o.toBytes)
    }
    numElements += 1
  }

  def way(id: Long, visible: Boolean, version: Long, tsSec: Long, csId: Long,
          attrUid: java.lang.Long, userName: String,
          nds: Iterator[Long], tags: Iterator[(String, String)]): Unit = {
    checkOverflow(T_WAY)
    val info = infoBytes(version, tsSec, csId, attrUid, userName, visible)
    val keys = new LongBuf(8); val vals = new LongBuf(8); val refs = new LongBuf(16)
    if (visible) {
      var last = 0L
      nds.foreach { n => refs.add(n - last); last = n }
      tags.foreach { case (k, v) => keys.add(intern(k).toLong); vals.add(intern(v).toLong) }
    }
    val o = new Out(128)
    o.writeVarintField(1, id) // Way.id is int64 (not zigzag)
    keys.writePackedVarint(o, 2)
    vals.writePackedVarint(o, 3)
    o.writeBytesField(4, info)
    refs.writePackedZigzag(o, 8)
    groupElements.add(o.toBytes)
    numElements += 1
  }

  def relation(id: Long, visible: Boolean, version: Long, tsSec: Long, csId: Long,
               attrUid: java.lang.Long, userName: String,
               members: Iterator[(String, Long, String)],
               tags: Iterator[(String, String)]): Unit = {
    checkOverflow(T_REL)
    estPgroupSz += 29
    val info = infoBytes(version, tsSec, csId, attrUid, userName, visible)
    val keys = new LongBuf(8); val vals = new LongBuf(8)
    val roles = new LongBuf(16); val memids = new LongBuf(16); val types = new LongBuf(16)
    if (visible) {
      var last = 0L
      members.foreach { case (mtype, mref, mrole) =>
        roles.add(intern(mrole).toLong)
        memids.add(mref - last); last = mref
        types.add(mtype match { case "Node" => 0L; case "Way" => 1L; case _ => 2L })
        estPgroupSz += 4
      }
      tags.foreach { case (k, v) =>
        keys.add(intern(k).toLong); vals.add(intern(v).toLong); estPgroupSz += 4
      }
    }
    val o = new Out(128)
    o.writeVarintField(1, id)
    keys.writePackedVarint(o, 2)
    vals.writePackedVarint(o, 3)
    o.writeBytesField(4, info)
    roles.writePackedInt32(o, 8)
    memids.writePackedZigzag(o, 9)
    types.writePackedVarint(o, 10)
    groupElements.add(o.toBytes)
    numElements += 1
  }

  def finish(): Unit = {
    checkOverflow(T_NULL)
    out.flush()
  }
}
