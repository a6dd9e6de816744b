package graft.util

/** Table-path normalization.
  *
  * Spark's session catalog qualifies a table location before handing it to a
  * DSv1 provider (`saveAsTable` passes `path = file:/tmp/...`), while the
  * embedded meta store and the data writers work in plain local filesystem
  * paths — a raw `file:` URI string would be treated as a RELATIVE path by
  * `java.nio` and scatter `file:/...` directories under the working dir.
  * Strip the local-filesystem scheme at every public path entry point.
  */
object PathUtil {
  def local(p: String): String =
    if (p != null && p.startsWith("file:"))
      try {
        val u = new java.net.URI(p)
        if (u.getPath != null && u.getPath.nonEmpty) u.getPath else p.stripPrefix("file:")
      } catch { case _: java.net.URISyntaxException => p.stripPrefix("file:") }
    else p
}
