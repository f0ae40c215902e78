package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed twin of `ntile(n).over(Window.orderBy(order...))` — the
  * gate fixtures' oracle-exact file assignment without the
  * single-partition global window. `WindowExec: No Partition Defined`
  * moves EVERY row through one task (the bench tail was full of the
  * warning; at 100 TB that one task is the whole job), yet the bucket
  * arithmetic only needs each row's GLOBAL RANK, which distributes
  * (guide §2): one range exchange on the same sort keys establishes a
  * globally ordered partitioning, a count pass over the sorted shuffle
  * output gives per-partition row offsets (the second pass reuses the
  * shuffle files — the map side runs once), and `offset + local index`
  * IS the rank the serial window would have produced. The callers'
  * sort keys are total orders (unique key suffix), so the assignment
  * is value-identical to the serial `ntile` — the oracle-pinned
  * `planned_files` / `total_files` outputs cannot move.
  *
  * NTILE semantics reproduced exactly: with N rows in n buckets the
  * first `N mod n` buckets hold `ceil(N/n)` rows, the rest
  * `floor(N/n)` (SQL standard, Spark and DuckDB agree). */
object GlobalNtile {

  /** `df` plus an IntegerType column `out` = NTILE(`n`) over the
    * global `order` — computed with a range exchange instead of a
    * single-partition window. `order` must be a total order (the
    * fixtures order by a unique key suffix); ties could otherwise
    * straddle a partition boundary and draw different buckets than
    * the serial window (whose tie order is itself unspecified). */
  def withBucket(df: DataFrame, out: String, n: Int,
      order: Seq[Column]): DataFrame = {
    require(n > 0, s"GlobalNtile: bucket count $n must be positive")
    val spark = df.sparkSession
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    // ONE RDD lineage for both passes: the count job materializes the
    // range shuffle; the data job re-reads the same shuffle files
    // (map stage skipped), so the global sort is paid once.
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        Iterator((i, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val total = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _) // rows before partition i
    val base = total / n
    val rem = total % n
    val cut = (base + 1) * rem // last rank inside the wide buckets
    val bucketed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var rank = offsets(i)
      it.map { r =>
        rank += 1
        val b =
          if (rank <= cut) (rank - 1) / (base + 1) + 1
          else rem + (rank - cut - 1) / base + 1
        Row.fromSeq(r.toSeq :+ b.toInt)
      }
    }
    spark.createDataFrame(bucketed,
      StructType(df.schema.fields :+ StructField(out, IntegerType)))
  }
}
