package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Presto's COLOR type + ColorFunctions, re-expressed for Spark
  * (reference: presto-main/.../scalar/ColorFunctions.java:35-323).
  *
  * COLOR maps to BIGINT using the reference's own encoding
  * (ColorFunctions.java:96-100): a non-negative value is a 24-bit RGB
  * triple; a negative value `-(index+1)` is one of the 8 ANSI system
  * colors. Rendering functions return ANSI-escape strings
  * (`ESC[38;5;<idx>m` 256-color foreground), byte-identical to the
  * reference's output.
  *
  * All methods are static-forwarded (top-level object) so the registry
  * can bind them through `StaticInvoke`, which participates in
  * whole-stage codegen.
  */
object ColorFns {

  private val AnsiReset = "\u001b[0m"

  // index order is the ANSI system palette (ColorFunctions.java:42-51)
  private val SystemColors = Map(
    "BLACK" -> 0, "RED" -> 1, "GREEN" -> 2, "YELLOW" -> 3,
    "BLUE" -> 4, "MAGENTA" -> 5, "CYAN" -> 6, "WHITE" -> 7)

  /** color('#rgb') or color('<system name>') (ColorFunctions.java:88-105). */
  def color(name: UTF8String): Long = {
    val s = name.toString
    val rgbVal = parseRgb(s)
    if (rgbVal != -1L) rgbVal
    else SystemColors.get(s.toUpperCase) match {
      case Some(idx) => -(idx + 1).toLong
      case None => throw new IllegalArgumentException(s"Invalid color: '$s'")
    }
  }

  /** CSS short-hex '#rgb' → 24-bit rrggbb, or -1 if not that shape
    * (ColorFunctions.java:278-298). */
  private def parseRgb(s: String): Long = {
    if (s.length != 4 || s.charAt(0) != '#') return -1L
    val r = Character.digit(s.charAt(1), 16)
    val g = Character.digit(s.charAt(2), 16)
    val b = Character.digit(s.charAt(3), 16)
    if (r == -1 || g == -1 || b == -1) return -1L
    rgb((r << 4 | r).toLong, (g << 4 | g).toLong, (b << 4 | b).toLong)
  }

  /** rgb(r, g, b) → 24-bit color (ColorFunctions.java:109-116). */
  def rgb(red: Long, green: Long, blue: Long): Long = {
    require(red >= 0 && red <= 255, "red must be between 0 and 255")
    require(green >= 0 && green <= 255, "green must be between 0 and 255")
    require(blue >= 0 && blue <= 255, "blue must be between 0 and 255")
    (red << 16) | (green << 8) | blue
  }

  /** color(fraction, lowColor, highColor): HSB-space interpolation with the
    * fraction clamped to [0,1] (ColorFunctions.java:144-153). */
  def interpolate(fraction: Double, lowColor: Long, highColor: Long): Long = {
    require(lowColor >= 0, "lowColor not a valid RGB color")
    require(highColor >= 0, "highColor not a valid RGB color")
    val f = math.max(0.0, math.min(1.0, fraction))
    interpolateUnchecked(f.toFloat, lowColor, highColor)
  }

  /** color(value, low, high, lowColor, highColor)
    * (ColorFunctions.java:126-134). */
  def colorBetween(value: Double, low: Double, high: Double,
                   lowColor: Long, highColor: Long): Long =
    interpolate((value - low) / (high - low), lowColor, highColor)

  // HSB-space lerp, exactly the reference's float arithmetic
  // (ColorFunctions.java:234-244); java.awt.Color here is pure math.
  private def interpolateUnchecked(fraction: Float, lowRgb: Long,
                                   highRgb: Long): Long = {
    val lo = java.awt.Color.RGBtoHSB(red(lowRgb), green(lowRgb), blue(lowRgb), null)
    val hi = java.awt.Color.RGBtoHSB(red(highRgb), green(highRgb), blue(highRgb), null)
    val h = fraction * (hi(0) - lo(0)) + lo(0)
    val s = fraction * (hi(1) - lo(1)) + lo(1)
    val v = fraction * (hi(2) - lo(2)) + lo(2)
    (java.awt.Color.HSBtoRGB(h, s, v) & 0xFFFFFF).toLong
  }

  private def red(c: Long): Int = ((c >>> 16) & 0xff).toInt
  private def green(c: Long): Int = ((c >>> 8) & 0xff).toInt
  private def blue(c: Long): Int = (c & 0xff).toInt

  /** 256-color ANSI index for an encoded color: 6×6×6 cube for RGB,
    * the raw palette index for system colors (ColorFunctions.java:249-275). */
  def toAnsi(c: Long): Int =
    if (c >= 0) 16 + (red(c) * 6 / 256) * 36 + (green(c) * 6 / 256) * 6 + (blue(c) * 6 / 256)
    else (-c - 1).toInt

  private def escape(c: Long): String = "\u001b[38;5;" + toAnsi(c) + "m"

  /** render(value, color) → ANSI-colored string
    * (ColorFunctions.java:161-185; numeric overloads are handled by a
    * string cast at the registry layer, matching Long/Double.toString). */
  def render(value: UTF8String, c: Long): UTF8String =
    UTF8String.fromString(escape(c) + value.toString + AnsiReset)

  /** render(boolean) → green check / red cross (ColorFunctions.java:187-192). */
  def renderBool(value: Boolean): UTF8String =
    if (value) UTF8String.fromString(escape(-3L) + "✓" + AnsiReset)
    else UTF8String.fromString(escape(-2L) + "✗" + AnsiReset)

  /** bar(percent, width, lowColor, highColor): fixed-width ANSI bar chart,
    * each block colored by its position along the low→high gradient
    * (ColorFunctions.java:203-232). */
  def bar(percent: Double, width: Long, lowColor: Long,
          highColor: Long): UTF8String = {
    var count = (percent * width).toInt.toLong
    count = math.min(width, count)
    count = math.max(0, count)
    val sb = new StringBuilder
    var i = 0
    while (i < count) {
      val fraction = (i * 1.0 / (width - 1)).toFloat
      sb.append(escape(interpolateUnchecked(fraction, lowColor, highColor)))
      sb.append('█')
      i += 1
    }
    sb.append(AnsiReset)
    var j = count
    while (j < width) { sb.append(' '); j += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** bar(percent, width): red→green default gradient
    * (ColorFunctions.java:196-199). */
  def bar(percent: Double, width: Long): UTF8String =
    bar(percent, width, 0xFF0000L, 0x00FF00L)
}
