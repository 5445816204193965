package graft

import org.apache.spark.sql.SparkSession

/** Scratch experiment (r14 s3): does `spark.read.parquet(dir)` launch a
  * driver job (schema inference / footer read), and does an explicit
  * `.schema(...)` remove it? Iteration tooling only — never run by the
  * driver. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        println(s"  JOB ${j.jobId}  " +
          Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      }
    })
    val tmp = TempRoots.create("readprobe").toString
    import spark.implicits._
    // flat dir
    (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("id", "s")
      .coalesce(2).write.parquet(tmp + "/flat")
    // partitioned dir (like the IVF cell layout)
    (1 to 1000).map(i => (i.toLong, s"s$i", i % 8)).toDF("id", "s", "cell")
      .write.partitionBy("cell").parquet(tmp + "/part")
    Thread.sleep(300)
    def trial(label: String)(body: => Unit): Unit = {
      val j0 = jobs.get()
      body
      Thread.sleep(200)
      println(s"TRIAL $label: jobs=${jobs.get() - j0}")
    }
    trial("read flat, inferred")(spark.read.parquet(tmp + "/flat"))
    trial("read flat, inferred again")(spark.read.parquet(tmp + "/flat"))
    val flatSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    trial("read flat, explicit schema")(spark.read.schema(flatSchema).parquet(tmp + "/flat"))
    trial("read part, inferred")(spark.read.parquet(tmp + "/part"))
    val partSchema = flatSchema.add("cell", org.apache.spark.sql.types.IntegerType)
    trial("read part, explicit schema")(spark.read.schema(partSchema).parquet(tmp + "/part"))
    trial("count flat explicit")(spark.read.schema(flatSchema).parquet(tmp + "/flat").count())
    spark.stop()
  }
}
