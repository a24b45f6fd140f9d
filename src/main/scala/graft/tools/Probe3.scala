package graft.tools
object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.createSession("p3", "local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT regexp_extract_all('a1-b2', '([a-z])([0-9])') AS d").show(false)
    Seq("week('2026-08-16')", "hmac_sha256('k','v')", "to_base(255, 16)", "from_base('ff', 16)").foreach { f =>
      try spark.sql(s"SELECT $f AS x").show(false)
      catch { case e: Exception => println(s"[p3] $f -> ${e.getMessage.takeWhile(_ != '\n').take(90)}") }
    }
    spark.stop()
  }
}
