package graft.sink

/** Chooses the destination (topic, tag) per record
  * (reference: legacy/common/selector/TopicSelector.java). */
trait TopicSelector[T] extends Serializable {
  def getTopic(tuple: T): String
  def getTag(tuple: T): String
}

/** Constant destination (reference: legacy/common/selector/DefaultTopicSelector.java). */
class DefaultTopicSelector[T](topicName: String, tagName: String = "")
    extends TopicSelector[T] {
  override def getTopic(tuple: T): String = topicName
  override def getTag(tuple: T): String = tagName
}

/**
 * Field-driven destination with default fallback: a missing or null field
 * falls back to the default topic/tag
 * (reference: legacy/common/selector/SimpleTopicSelector.java:40-77).
 */
class SimpleTopicSelector(
    topicFieldName: String,
    defaultTopicName: String,
    tagFieldName: String,
    defaultTagName: String) extends TopicSelector[Map[String, Any]] {

  override def getTopic(tuple: Map[String, Any]): String =
    tuple.get(topicFieldName) match {
      case Some(t) if t != null => t.toString
      case _ => defaultTopicName
    }

  override def getTag(tuple: Map[String, Any]): String =
    tuple.get(tagFieldName) match {
      case Some(t) if t != null => t.toString
      case _ => defaultTagName
    }
}
