package graft.tools
import org.apache.spark.sql.SparkSession
object ListFns {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("lf").getOrCreate()
    graft.functions.PrestoFunctions.registerAll(spark)
    spark.catalog.listFunctions().collect().foreach(f => println(f.name.toLowerCase))
  }
}
