package graft.util

object HashUtil {
  /** Lowercase hex MD5 — stable ids for checkpoint-binding properties. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
