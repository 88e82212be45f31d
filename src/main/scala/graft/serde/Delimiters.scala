package graft.serde

/** Canonical delimiter constants. The default field delimiter is ASCII SOH
  * (\u0001) — the Hive/streaming convention the reference's text serde
  * uses. Kept as a visible escape in ONE place: a raw control byte in
  * source renders as an empty string (misreading as "never splits") and any
  * editor/formatter that normalizes control characters silently changes
  * wire semantics. */
object Delimiters {
  val Soh: String = "\u0001"
}
