package graft
import org.apache.spark.sql.SparkSession

/** One-call SQL surface: registers every native expression as a session
  * function, so SQL-only users (the reference's `clickhouse-client`
  * audience) get `format_readable_size`, `hex_to_decimal`, and
  * `graft_dot` without touching the Column API. */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    expr.FormatReadableSize.register(spark)
    expr.HexToDecimal.register(spark)
    expr.IsHexWord.register(spark)
    expr.DotProduct.register(spark)
    expr.ZValue.register(spark)
    expr.Kll.register(spark)
    expr.Bmp.register(spark)
    expr.Tht.register(spark)
    expr.TkW.register(spark)
    expr.Funnel.register(spark)
  }
}
