package graft
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sfDir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sfDir)
    import spark.implicits._
    println("docs=" + docs.count())
    // doc length distribution
    docs.selectExpr("size(split(text,' ')) as ntok").summary().show()
    // trigram shingle count overall
    val sh = llm.Dedup.shingleIndexOf(docs)
    sh.selectExpr("size(shingles) as ns").summary().show()
    // distinct shingles
    val ex = sh.select(explode(col("shingles")).as("s"))
    println("total shingle rows=" + ex.count() + " distinct=" + ex.distinct().count())
    spark.stop()
  }
}
