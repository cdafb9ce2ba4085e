package graft.vis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Plotting-adjacent scalar utilities (reference `vis.py`). The actual
  * matplotlib rendering of `plot_intervals` (vis.py:60-237) is declared out
  * of scope (no plotting stack in a Spark engine); its data-preparation
  * kernel is [[graft.ops.Extras.stackIntervals]]. */
object Vis {

  /** Color-name table: the matplotlib single-letter codes (classic
    * palette), the tab: palette, and the CSS/X11 names (subset — the
    * common ones; unknown names yield null, see [[toUcscColorstring]]).
    * Values are the (r,g,b) bytes `int(x*255)` of matplotlib's `to_rgb`,
    * reference `vis.py:18-59`. */
  val NamedColors: Map[String, (Int, Int, Int)] = Map(
    // matplotlib classic single-letter codes
    "b" -> (0, 0, 255), "g" -> (0, 127, 0), "r" -> (255, 0, 0),
    "c" -> (0, 191, 191), "m" -> (191, 0, 191), "y" -> (191, 191, 0),
    "k" -> (0, 0, 0), "w" -> (255, 255, 255),
    // tab: palette
    "tab:blue" -> (31, 119, 180), "tab:orange" -> (255, 127, 14),
    "tab:green" -> (44, 160, 44), "tab:red" -> (214, 39, 40),
    "tab:purple" -> (148, 103, 189), "tab:brown" -> (140, 86, 75),
    "tab:pink" -> (227, 119, 194), "tab:gray" -> (127, 127, 127),
    "tab:olive" -> (188, 189, 34), "tab:cyan" -> (23, 190, 207),
    // CSS basic + common extended names
    "black" -> (0, 0, 0), "white" -> (255, 255, 255), "red" -> (255, 0, 0),
    "lime" -> (0, 255, 0), "blue" -> (0, 0, 255), "yellow" -> (255, 255, 0),
    "cyan" -> (0, 255, 255), "aqua" -> (0, 255, 255),
    "magenta" -> (255, 0, 255), "fuchsia" -> (255, 0, 255),
    "silver" -> (192, 192, 192), "gray" -> (128, 128, 128),
    "grey" -> (128, 128, 128), "maroon" -> (128, 0, 0),
    "olive" -> (128, 128, 0), "green" -> (0, 128, 0),
    "purple" -> (128, 0, 128), "teal" -> (0, 128, 128),
    "navy" -> (0, 0, 128), "orange" -> (255, 165, 0),
    "tomato" -> (255, 99, 71), "skyblue" -> (135, 206, 235),
    "dimgray" -> (105, 105, 105), "dimgrey" -> (105, 105, 105),
    "pink" -> (255, 192, 203), "brown" -> (165, 42, 42),
    "gold" -> (255, 215, 0), "indigo" -> (75, 0, 130),
    "violet" -> (238, 130, 238), "salmon" -> (250, 128, 114),
    "khaki" -> (240, 230, 140), "orchid" -> (218, 112, 214),
    "plum" -> (221, 160, 221), "coral" -> (255, 127, 80),
    "crimson" -> (220, 20, 60), "chocolate" -> (210, 105, 30),
    "orangered" -> (255, 69, 0), "royalblue" -> (65, 105, 225),
    "steelblue" -> (70, 130, 180), "seagreen" -> (46, 139, 87),
    "forestgreen" -> (34, 139, 34), "darkgreen" -> (0, 100, 0),
    "darkblue" -> (0, 0, 139), "darkred" -> (139, 0, 0),
    "darkorange" -> (255, 140, 0), "deeppink" -> (255, 20, 147),
    "dodgerblue" -> (30, 144, 255), "firebrick" -> (178, 34, 34),
    "hotpink" -> (255, 105, 180), "lightblue" -> (173, 216, 230),
    "lightgreen" -> (144, 238, 144), "lightgray" -> (211, 211, 211),
    "lightgrey" -> (211, 211, 211), "limegreen" -> (50, 205, 50),
    "midnightblue" -> (25, 25, 112), "goldenrod" -> (218, 165, 32),
    "cornflowerblue" -> (100, 149, 237), "turquoise" -> (64, 224, 208),
    "tan" -> (210, 180, 140), "sienna" -> (160, 82, 45),
    "wheat" -> (245, 222, 179), "beige" -> (245, 245, 220),
    "ivory" -> (255, 255, 240), "lavender" -> (230, 230, 250),
    "azure" -> (240, 255, 255), "snow" -> (255, 250, 250),
    "yellowgreen" -> (154, 205, 50), "greenyellow" -> (173, 255, 47),
    "mediumblue" -> (0, 0, 205),
    // the one xkcd name the reference suite exercises (vis tests)
    "xkcd:sky blue" -> (117, 187, 253))

  /** Column form of `to_ucsc_colorstring` (reference `vis.py:18-59`):
    * any color identifier -> UCSC itemRgb "r,g,b". Pure codegen'd Column
    * expression — no UDF, so it runs inside whole-stage codegen over
    * billions of rows. Differences from the reference, documented:
    * null / "none" -> "0" (same); hex `#rgb`/`#rrggbb`(+ignored alpha)
    * parsed exactly (same); named colors resolve through [[NamedColors]]
    * (a packaged subset of matplotlib's table — an unknown name yields
    * null rather than raising, the relational convention for a scalar
    * function). */
  def toUcscColorstring(c: Column): Column = {
    val s = lower(trim(c))
    def hx2(pos: Int) =
      conv(substring(s, pos, 2), 16, 10).cast("int").cast("string")
    def hx1(pos: Int) =
      conv(concat(substring(s, pos, 1), substring(s, pos, 1)), 16, 10)
        .cast("int").cast("string")
    val named = typedLit(NamedColors.map { case (k, (r, g, b)) =>
      k -> s"$r,$g,$b" })
    when(c.isNull || s === "none", lit("0"))
      .when(s.rlike("^#[0-9a-f]{6}([0-9a-f]{2})?$"),
        concat_ws(",", hx2(2), hx2(4), hx2(6)))
      .when(s.rlike("^#[0-9a-f]{3,4}$"),
        concat_ws(",", hx1(2), hx1(3), hx1(4)))
      .otherwise(element_at(named, s))
  }
}
