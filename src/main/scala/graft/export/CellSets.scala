package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cell-sets inverted index — label → sorted member `cells_id` list
  * with a deterministic color per group (`5_Upload-to-aws.py:138-196`).
  *
  * The reference pops colors positionally from a fixed 405-entry pool
  * (`src/color_pool.json`, popped at `5_Upload-to-aws.py:150,191`); the
  * k-th group (in a deterministic order) gets the k-th color. The same
  * 405 values ship as a bundled resource so cell-sets documents are
  * byte-comparable with the reference's; past 405 groups the pool
  * extends with a golden-angle HSV walk (the reference would throw).
  * Groups are ordered by sort key rather than first-appearance, per the
  * SURVEY §2.10 rule that every ordinal comes from an explicit sort.
  */
object CellSets {

  /** The reference's fixed color pool (resource copy of
    * `src/color_pool.json`, 405 `#rrggbb` values). */
  private lazy val referencePool: IndexedSeq[String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/color_pool.json"), "UTF-8")
    try "#[0-9a-fA-F]{6}".r.findAllIn(src.mkString).toIndexedSeq
    finally src.close()
  }

  /** First `n` colors: the reference pool positionally, then a
    * golden-angle hue walk once the 405 run out. */
  def colorPool(n: Int): Seq[String] =
    if (n <= referencePool.size) referencePool.take(n)
    else referencePool ++ (referencePool.size until n).map(goldenAngle)

  private def goldenAngle(i: Int): String = {
    val h = (i * 137.508) % 360
    val (s, v) = (0.65, 0.90)
    val c = v * s
    val x = c * (1 - math.abs((h / 60) % 2 - 1))
    val m = v - c
    val (r1, g1, b1) =
      if (h < 60) (c, x, 0.0) else if (h < 120) (x, c, 0.0)
      else if (h < 180) (0.0, c, x) else if (h < 240) (0.0, x, c)
      else if (h < 300) (x, 0.0, c) else (c, 0.0, x)
    f"#${((r1 + m) * 255).round.toInt}%02x${((g1 + m) * 255).round.toInt}%02x${((b1 + m) * 255).round.toInt}%02x"
  }

  /** Build one cell-set group from a label column of the cells table:
    * `(key, name, color, cellIds)` with `cellIds` sorted ascending
    * (`5_Upload-to-aws.py:146-157`: sample sets; `:171-196`: metadata
    * sets — both are the same group→members inversion). */
  def fromColumn(cells: DataFrame, labelCol: String, keyPrefix: String): DataFrame = {
    val colors = colorPool(405)
    val colorArr = array(colors.map(lit): _*)
    val pos = Window.orderBy(labelCol)
    cells
      .groupBy(col(labelCol))
      .agg(sort_array(collect_list(col("cells_id"))).as("cellIds"))
      .withColumn("__pos", row_number().over(pos) - 1)
      .select(
        concat(lit(keyPrefix), lit("-"), col(labelCol)).as("key"),
        col(labelCol).cast("string").as("name"),
        element_at(colorArr, (col("__pos") % colors.size) + 1).as("color"),
        col("cellIds"))
  }

  /** Serialize groups under a root node as the cell-sets JSON document
    * (`5_Upload-to-aws.py:256,290-292` shape). Group count is small
    * (samples, metadata values, clusters) — a driver-side collect of
    * the *aggregated* table only, never of per-cell data. */
  def toJsonDocument(groups: DataFrame, rootKey: String, rootName: String): String = {
    val rows = groups
      .select(to_json(struct(col("key"), col("name"), col("color"), col("cellIds"))).as("j"))
      .orderBy(col("j"))
      .collect().map(_.getString(0))
    s"""{"key":"$rootKey","name":"$rootName","rootNode":true,"children":[${rows.mkString(",")}]}"""
  }
}
