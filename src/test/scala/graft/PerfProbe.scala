package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: time alternative formulations of the heavy near-dup pipeline
  * stages at a given SF. Run:
  *   sbt "Test/runMain graft.PerfProbe /root/testdata/sf0.1"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name%-40s rows=$n")
    }

    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    def toks(c: org.apache.spark.sql.Column) = split(lower(c), " ")
    def shingles(text: org.apache.spark.sql.Column) = {
      val tk = toks(text)
      array_distinct(
        when(size(tk) >= 5,
          transform(sequence(lit(0), size(tk) - 5), i => concat_ws(" ", slice(tk, i + 1, lit(5)))))
        .otherwise(array(concat_ws(" ", tk))))
    }

    // warm up
    docs.count(); spark.range(100000).selectExpr("sum(id)").collect()

    time("scan+shingle+explode only") {
      docs.select(col("doc_id"), explode(shingles(col("text"))).as("sh")).count()
    }
    time("counted index (size before explode)") {
      docs.select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        .count()
    }
    time("md5 hash over index rows") {
      docs.select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
        .select(conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("x"))
        .agg(sum("x")).count()
    }
    time("minhash 32-col agg") {
      val sh = docs.select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
        .withColumn("shx", conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long") % 1073741789L)
      val aggs = (0 until 32).map(i => min((lit(1000003L * (i + 1)) * col("shx") + lit(7L * i)) % 2147483647L).as(s"h$i"))
      sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }

    def counted: DataFrame =
      docs.select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))

    time("pairjoin: self-join merge hint") {
      val sh = counted
      sh.as("x").join(sh.as("y").hint("merge"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: self-join no hint") {
      val sh = counted
      sh.as("x").join(sh.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: round1 window + renamed sides") {
      val w = Window.partitionBy(col("doc_id"))
      val sh = docs.select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
        .withColumn("n_sh", count(lit(1)).over(w))
      val a = sh.select(col("doc_id").as("doc_a"), col("sh"), col("n_sh").as("na"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sh"), col("n_sh").as("nb"))
      a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)))
        .count()
    }
    def countedHashed: DataFrame =
      docs.select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), col("n_sh"),
          (conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")).as("shk"))

    time("pairjoin: long-key shuffle_hash") {
      val sh = countedHashed
      sh.as("x").join(sh.as("y").hint("shuffle_hash"),
          col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: long-key merge") {
      val sh = countedHashed
      sh.as("x").join(sh.as("y").hint("merge"),
          col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: long-key no hint") {
      val sh = countedHashed
      sh.as("x").join(sh.as("y"),
          col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: string-key shuffle_hash") {
      val sh = counted
      sh.as("x").join(sh.as("y").hint("shuffle_hash"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    println("scan partitions = " + docs.rdd.getNumPartitions)
    time("index build, repartition(32) first") {
      docs.repartition(32)
        .select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        .count()
    }
    time("pairjoin: repart32 + long-key shuffle_hash") {
      val sh = docs.repartition(32)
        .select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), col("n_sh"),
          (conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")).as("shk"))
      sh.as("x").join(sh.as("y").hint("shuffle_hash"),
          col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()
    }
    time("pairjoin: postings collect + HOF pair expansion") {
      val sh = countedHashed
      val postings = sh.groupBy(col("shk"))
        .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ds"))
        .filter(size(col("ds")) > 1)
      val pairs = postings.select(explode(expr(
        """flatten(transform(ds, (a, i) ->
             transform(slice(ds, i + 2, size(ds) - i - 1), b ->
               if(a.doc_id < b.doc_id, struct(a.doc_id as doc_a, a.n_sh as na, b.doc_id as doc_b, b.n_sh as nb),
                  struct(b.doc_id as doc_a, b.n_sh as na, a.doc_id as doc_b, a.n_sh as nb)))))""")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"))
      pairs.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1))).count()
    }
    time("hot-shingle profile: max postings") {
      docs.select(explode(shingles(col("text"))).as("sh"))
        .groupBy("sh").count().agg(max("count"), sum(col("count") * col("count"))).count()
    }
    val hot = docs.select(explode(shingles(col("text"))).as("sh"))
      .groupBy("sh").count().agg(max("count").as("mx"), sum(col("count") * col("count")).as("sumsq"))
      .collect()(0)
    println(s"max postings per shingle = ${hot.getLong(0)}, sum of squares (pair candidates) = ${hot.getLong(1)}")
    spark.stop()
  }
}
