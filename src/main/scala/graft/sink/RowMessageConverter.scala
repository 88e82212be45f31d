package graft.sink

import graft.source.Message
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/**
 * Row → [[Message]] conversion for the sink: key columns become the message
 * key, an optional dynamic tag column supplies the tag, everything else is
 * delimiter-joined into the body. Exclusion rules match the reference
 * converter (reference: sink/table/RocketMQRowDataConverter.java:50-160):
 * key columns stay out of the body unless `writeKeysToBody`; the dynamic tag
 * column stays out unless `dynamicTagIncluded`; property columns always move
 * into message properties.
 */
class RowMessageConverter(
    schema: StructType,
    staticTag: String = "",
    fieldDelimiter: String = graft.serde.Delimiters.Soh,
    keyColumns: Seq[String] = Nil,
    isDynamicTag: Boolean = false,
    dynamicTagColumn: String = null,
    dynamicTagIncluded: Boolean = true,
    writeKeysToBody: Boolean = false,
    propertyColumns: Seq[String] = Nil,
    bornTsColumn: String = null) extends Serializable {

  private def idx(name: String): Int = {
    val i = schema.fieldIndex(name)
    require(i >= 0, s"could not find column: $name")
    i
  }

  private val keyIdx: Array[Int] = keyColumns.map(idx).toArray
  private val tagIdx: Int =
    if (isDynamicTag) {
      require(dynamicTagColumn != null, "No message tag column set.")
      idx(dynamicTagColumn)
    } else -1
  private val propIdx: Array[Int] = propertyColumns.map(idx).toArray
  private val bornIdx: Int = if (bornTsColumn != null) idx(bornTsColumn) else -1

  private val excluded: Set[Int] =
    (if (writeKeysToBody) Set.empty[Int] else keyIdx.toSet) ++
      (if (isDynamicTag && !dynamicTagIncluded) Set(tagIdx) else Set.empty) ++
      propIdx.toSet
  private val bodyIdx: Array[Int] =
    schema.indices.filterNot(excluded.contains).toArray

  private def str(row: Row, i: Int): String = {
    val v = row.get(i)
    if (v == null) "" else v match {
      case ts: java.sql.Timestamp => ts.getTime.toString
      case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case other => other.toString
    }
  }

  def convert(row: Row, bornTs: Long = System.currentTimeMillis()): Message = {
    val key = keyIdx.map(str(row, _)).mkString(",")
    val tag = if (isDynamicTag) str(row, tagIdx) else staticTag
    val props = propIdx.map(i => schema.fieldNames(i) -> str(row, i)).toMap
    val body = bodyIdx.map(str(row, _)).mkString(fieldDelimiter)
    val born =
      if (bornIdx < 0) bornTs
      else row.get(bornIdx) match {
        case ts: java.sql.Timestamp => ts.getTime
        case l: Long => l
        case other => other.toString.toLong
      }
    Message(born, key, tag, props, body)
  }
}
