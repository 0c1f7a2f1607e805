package graft.api

/** Duration / resolution parsing — duration-parser.ts: ISO 8601
  * (PT1H, P1D, PT1H30M), integer seconds ("3600"), shorthand
  * ("1h", "30m", "5s", "2d").
  */
object Durations {

  private val Shorthand = "(?i)^(\\d+)([smhd])$".r

  private val unitMs = Map('s' -> 1000L, 'm' -> 60000L, 'h' -> 3600000L, 'd' -> 86400000L)

  def parseMillis(duration: String): Long = {
    val trimmed = duration.trim
    if (trimmed.toUpperCase.startsWith("P")) {
      // java.time.Duration handles PTnHnMnS; P1D must go through the
      // date-based prefix split (Duration.parse accepts PnDTnH…)
      java.time.Duration.parse(trimmed.toUpperCase).toMillis
    } else if (trimmed.forall(_.isDigit) && trimmed.nonEmpty) {
      trimmed.toLong * 1000L
    } else trimmed match {
      case Shorthand(n, u) => n.toLong * unitMs(u.toLowerCase.head)
      case _ => throw new IllegalArgumentException(
        s"Invalid duration: $duration. Use PT1H, 3600, or 1h")
    }
  }

  /** `resolution` parameter: seconds or `<n><unit>` → millis. */
  def parseResolutionMillis(resolution: String): Long = {
    val trimmed = resolution.trim
    val ms = trimmed match {
      case Shorthand(n, u) => n.toLong * unitMs(u.toLowerCase.head)
      case _ =>
        val secs = try trimmed.toDouble catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"resolution must be seconds or a time expression like 1m: $resolution")
        }
        (secs * 1000).toLong
    }
    if (ms <= 0) throw new IllegalArgumentException(s"resolution must be positive: $resolution")
    ms
  }
}
