package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * The one sidecar format every persisted graft index uses: a `key=value`
 * file (`_graft_index.txt`) written next to the index parquet, carrying the
 * parameters a reader MUST match to use the index at all — hash-family
 * config for a MinHash signature index ([[graft.operators.Dedup
 * .writeMinhashIndex]]), the quantizer matrix for an IVF index
 * ([[graft.operators.Similarity.writeIvfIndex]]). A `kind` key is always
 * present and checked on read, so pointing an IVF reader at a MinHash index
 * (or any index written under different semantics) fails loudly instead of
 * joining incompatible data.
 *
 * Values may be anything newline-free; [[encodeMatrix]]/[[decodeMatrix]]
 * pack a rectangular Double matrix (rows `;`-joined, dims `,`-joined —
 * `Double.toString` round-trips exactly through `parseDouble`).
 */
object IndexSidecar {
  val FileName = "_graft_index.txt"

  def write(path: String, kind: String, props: Map[String, String]): Unit = {
    require(!props.contains("kind"), "'kind' is reserved")
    props.foreach { case (k, v) =>
      require(!k.contains("=") && !k.contains("\n") && !v.contains("\n"),
        s"sidecar entry $k is not newline/=-free")
    }
    val body = (Seq("kind" -> kind) ++ props.toSeq.sortBy(_._1))
      .map { case (k, v) => s"$k=$v" }.mkString("\n")
    Files.write(Paths.get(path, FileName),
      body.getBytes(StandardCharsets.UTF_8))
  }

  /** Read the sidecar at `path`, failing if it was written for a different
    * `expectKind` of index. */
  def read(path: String, expectKind: String): Map[String, String] = {
    val m = new String(
      Files.readAllBytes(Paths.get(path, FileName)), StandardCharsets.UTF_8)
      .split("\n").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    require(m.get("kind").contains(expectKind),
      s"index at $path is kind=${m.getOrElse("kind", "?")}, expected $expectKind")
    m
  }

  def encodeMatrix(m: Array[Array[Double]]): String =
    m.map(_.mkString(",")).mkString(";")

  def decodeMatrix(s: String): Array[Array[Double]] =
    s.split(";").map(_.split(",").map(_.toDouble))
}
