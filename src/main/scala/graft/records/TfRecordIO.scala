package graft.records

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

/** TFRecord container format (public spec, tensorflow/core/lib/io/
  * record_writer.h): each record is
  *
  *   uint64 length (LE) · uint32 masked-crc32c(length) ·
  *   bytes data[length] · uint32 masked-crc32c(data)
  *
  * with crc masking `((crc >> 15) | (crc << 17)) + 0xa282ead8`.
  * CRC32C comes from `java.util.zip.CRC32C`. GZIP compression wraps the
  * whole stream (the reference's `TFRecordCompressionType.GZIP`).
  */
object TfRecordIO {

  private val MaskDelta = 0xa282ead8L

  private[records] def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val crc = new CRC32C()
    crc.update(bytes, off, len)
    val v = crc.getValue
    ((((v >>> 15) | (v << 17)) + MaskDelta) & 0xffffffffL).toInt
  }

  final class Writer(raw: OutputStream, gzip: Boolean) extends AutoCloseable {
    private val out =
      if (gzip) new BufferedOutputStream(new GZIPOutputStream(raw))
      else new BufferedOutputStream(raw)

    def write(record: Array[Byte]): Unit = {
      val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      header.putLong(record.length.toLong)
      val lenBytes = java.util.Arrays.copyOfRange(header.array(), 0, 8)
      header.putInt(maskedCrc(lenBytes, 0, 8))
      out.write(header.array())
      out.write(record)
      val footer = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      footer.putInt(maskedCrc(record, 0, record.length))
      out.write(footer.array())
    }

    override def close(): Unit = out.close()
  }

  final class Reader(raw: InputStream, gzip: Boolean) extends Iterator[Array[Byte]] with AutoCloseable {
    private val in =
      if (gzip) new BufferedInputStream(new GZIPInputStream(raw))
      else new BufferedInputStream(raw)
    private var nextRecord: Array[Byte] = _
    private var finished = false

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val read = in.read(buf, off, n - off)
        if (read < 0) {
          if (off == 0) throw new EOFException()
          else throw new EOFException(s"truncated record: $off of $n bytes")
        }
        off += read
      }
      buf
    }

    /** Reads the 12-byte header, or returns null on a clean EOF exactly at
      * a record boundary. EOF anywhere else is a torn record and must fail
      * the task (TF raises DataLossError here) — silently truncating would
      * shorten the dataset, compounding any orphan-partial-file problem.
      */
    private def readHeaderOrEof(): Array[Byte] = {
      val buf = new Array[Byte](12)
      val first = in.read(buf, 0, 12)
      if (first < 0) return null
      var off = first
      while (off < 12) {
        val read = in.read(buf, off, 12 - off)
        if (read < 0) throw new EOFException(s"truncated record header: $off of 12 bytes")
        off += read
      }
      buf
    }

    private def advance(): Unit = {
      val header = readHeaderOrEof()
      if (header == null) {
        finished = true
        in.close()
      } else {
        val bb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        require(lenCrc == maskedCrc(header, 0, 8), "corrupt TFRecord: length crc mismatch")
        val data = readFully(len.toInt)
        val dataCrc = ByteBuffer.wrap(readFully(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
        require(dataCrc == maskedCrc(data, 0, data.length), "corrupt TFRecord: data crc mismatch")
        nextRecord = data
      }
    }

    advance()

    def hasNext: Boolean = !finished
    def next(): Array[Byte] = {
      val r = nextRecord
      advance()
      r
    }
    override def close(): Unit = in.close()
  }
}
