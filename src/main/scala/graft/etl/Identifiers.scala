package graft.etl

/** E13 — identifier sanitization (setup.py:50, cleanup.py:35): the
  * reference derives per-user database names by stripping every
  * non-alphanumeric character from the user id and lowercasing.
  * Engine-adjacent (driver-side naming, not a data-plane op).
  */
object Identifiers {
  def sanitize(userId: String): String =
    userId.replaceAll("[^A-Za-z0-9]+", "").toLowerCase

  def databaseNameFor(userId: String, prefix: String = "graft"): String =
    s"${prefix}_${sanitize(userId)}"
}
