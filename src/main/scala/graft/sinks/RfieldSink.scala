package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** rfield file output — the reference's end product: one text file per
  * forecast timestep holding `lon lat value` rows sorted by (lon, lat)
  * (`gen_rfields.py:177-229` builds exactly these under
  * `<version>/<model>/.../<timestamp>.txt`).
  *
  * Spark-idiomatic equivalent: hash-repartition on the timestep (all
  * rows of a timestep land in one task), sort within partitions by
  * (timestep, lon, lat), then a partitioned write — yielding exactly
  * one sorted file per `t=<timestep>/` directory. One shuffle total;
  * file count = timestep count regardless of cluster size, and each
  * file's internal order matches the reference's rfield contract.
  */
object RfieldSink {

  /** Write `rfield` (must carry `lon`, `lat`, value + `timeCol`) as
    * space-separated text partitioned by `timeCol`. */
  def write(rfield: DataFrame, outDir: String, timeCol: String,
            valueCol: String = "value"): Unit =
    rfield
      .select(col(timeCol), col("lon"), col("lat"), col(valueCol))
      .repartition(col(timeCol))
      .sortWithinPartitions(col(timeCol), col("lon"), col("lat"))
      .write
      .partitionBy(timeCol)
      .option("sep", " ")
      .mode("overwrite")
      .csv(outDir)
}
