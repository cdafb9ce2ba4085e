package graft

import org.apache.spark.sql.functions._

import graft.vis.Vis

/** `plot_intervals` made real (reference vis.py:60-237): the geometry
  * kernel, the SVG serializer, and the java.awt rasterizer. */
class VisSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("c1", 0L, 10L, "a"), ("c1", 5L, 15L, "b"), ("c1", 20L, 30L, "c"),
    ("c2", 0L, 4L, "d&<e>")).toDF("chrom", "start", "end", "name")

  test("plotGeometry: rect anchors, stacking, colors, labels, levels=") {
    val g = Vis.plotGeometry(fixture, labelCol = Some("name"))
    val rows = g.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("rect_h") == 0.6)
      assert(r.getAs[Double]("rect_y") == r.getAs[Int]("level") - 0.3)
      assert(r.getAs[Double]("rect_x") == r.getAs[Long]("start").toDouble)
      assert(r.getAs[Double]("rect_w") ==
        (r.getAs[Long]("end") - r.getAs[Long]("start")).toDouble)
      assert(r.getAs[String]("face_rgb") == "135,206,235") // skyblue
      assert(r.getAs[String]("edge_rgb") == "105,105,105") // dimgray
    }
    // overlapping a/b split levels {0,1}; disjoint c and other-chrom d at 0
    val lv = rows.map(r => r.getAs[String]("label") -> r.getAs[Int]("level"))
      .toMap
    assert(Set(lv("a"), lv("b")) == Set(0, 1))
    assert(lv("c") == 0 && lv("d&<e>") == 0)
    // caller-provided levels pass through untouched (vis.py levels=)
    val g2 = Vis.plotGeometry(fixture.withColumn("lv", lit(7)),
      levelCol = Some("lv"))
    assert(g2.collect().forall(_.getAs[Int]("level") == 7))
    // per-row colors resolve; null color falls back to the default face
    val g3 = Vis.plotGeometry(
      fixture.withColumn("colr", when($"name" === "a", "red")),
      colorCol = Some("colr"))
    val faces = g3.collect().map(_.getAs[String]("face_rgb")).toSet
    assert(faces == Set("255,0,0", "135,206,235"))
  }

  test("plotSvg: one document per chrom, rect/text counts, axes, escaping") {
    val svgs = Vis.plotSvg(Vis.plotGeometry(fixture, labelCol = Some("name")))
      .collect().map(r => r.getAs[String]("chrom") ->
        (r.getAs[Long]("n_rects"), r.getAs[String]("svg"))).toMap
    assert(svgs.keySet == Set("c1", "c2"))
    val (n1, svg1) = svgs("c1")
    assert(n1 == 3L)
    assert("<rect ".r.findAllIn(svg1).length == 3)
    assert("<text ".r.findAllIn(svg1).length == 3)
    // c1: x in [-0.5, 30.5], levels {0,1} -> y span 2.5 data units
    assert(svg1.contains("viewBox=\"-0.5 0 31.0 2.0\""))
    // y flip: level-1 rect (b, data top 1.3) sits ABOVE level-0 rects
    // ymax = 1.5, so b's svg y = 1.5 - 1.3 = 0.2; a's = 1.5 - 0.3 = 1.2
    assert(svg1.contains("y=\"0.2\"") && svg1.contains("y=\"1.2\""))
    assert(svg1.contains("fill=\"rgb(135,206,235)\""))
    val (n2, svg2) = svgs("c2")
    assert(n2 == 1L)
    // XML-escaped label
    assert(svg2.contains(">d&amp;&lt;e&gt;</text>"))
    assert(!svg2.contains("d&<e>"))
    // explicit xlim overrides the derived x span (vis.py xlim=)
    val clipped = Vis.plotSvg(Vis.plotGeometry(fixture),
      xlim = Some((0.0, 100.0))).collect()
    clipped.foreach(r =>
      assert(r.getAs[String]("svg").contains("viewBox=\"0.0 0 100.0")))
  }

  test("plotPng: real raster — planted fill colors at rect centers") {
    val df = Seq(("c1", 0L, 10L, "red"), ("c1", 20L, 30L, "blue"))
      .toDF("chrom", "start", "end", "colr")
    val g = Vis.plotGeometry(df, colorCol = Some("colr"))
    val out = Vis.plotPng(g, pxPerUnit = 10.0).collect()
    assert(out.length == 1)
    val r = out(0)
    val w = r.getAs[Int]("width_px"); val h = r.getAs[Int]("height_px")
    // x span [-0.5, 30.5] * 10 px/unit; one level -> 1 unit * 20 px
    assert(w == 310 && h == 20)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("png")))
    assert(img.getWidth == w && img.getHeight == h)
    def px(x: Int, y: Int) = img.getRGB(x, y) & 0xffffff
    // centers of the two rects: (5 data units, level 0) and (25, 0)
    assert(px(((5.0 + 0.5) * 10).toInt, h / 2) == 0xff0000)
    assert(px(((25.0 + 0.5) * 10).toInt, h / 2) == 0x0000ff)
    // background stays white between the rects
    assert(px(((17.0 + 0.5) * 10).toInt, h / 2) == 0xffffff)
    // determinism: identical bytes on re-render
    val again = Vis.plotPng(g, pxPerUnit = 10.0).collect()(0)
      .getAs[Array[Byte]]("png")
    assert(java.util.Arrays.equals(again, r.getAs[Array[Byte]]("png")))
  }
}
