package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four ETL pipeline patterns (SURVEY.md §2/§3), collapsed
  * into generic, parameterized Spark operators.
  *
  * Reference anchors (under /root/reference/src/main/scala/com/kanseiu/spark/):
  *  - Pattern A audit-append: common/SimpleDataCleanUtils.scala:8-34
  *  - Pattern B SCD latest-record merge: handler/CustomerInfDataClean.scala:22-88
  *  - Pattern C bi-store full-outer coalesce merge: handler/OrderMasterDataClean.scala:42-190
  *  - Pattern D star denormalization: handler/CustomerAddrLevelAggrDataClean.scala:22-44
  *
  * Scale notes (100 TB / 1000-executor design):
  *  - No driver-side `.collect()` in any op: the reference's
  *    `MAX(etl_date)` driver round-trip (SimpleDataCleanUtils.scala:19) is
  *    replaced by a broadcast 1-row join, so latest-partition selection
  *    stays inside one distributed plan and the filter still prunes
  *    partitions (Catalyst folds the broadcast join into a
  *    DynamicPruning-style filter under AQE).
  *  - `dedupLatest` is a single hash-shuffle on the business key followed
  *    by a per-partition sort; Spark ≥3.5 rewrites the rank=1 filter into
  *    WindowGroupLimit (partial top-1 before the shuffle), so the shuffle
  *    carries at most one row per key per map partition.
  *  - `scdMerge` unions before the one shuffle, so ODS+DWD merge costs
  *    exactly one exchange regardless of input count.
  *  - `coalesceMerge` is one full-outer sort-merge join (both sides
  *    exchanged on the key, which is unavoidable for full-outer at scale);
  *    callers with a small side should pass it pre-filtered so AQE can
  *    downgrade to broadcast.
  *  - `denormalize` broadcasts every dimension explicitly — the fact side
  *    never shuffles.
  */
object EtlOps {

  /** Deterministic audit clock. The reference stamps
    * `current_timestamp()` but keeps a commented-out fixed timestamp for
    * reproducibility (SimpleDataCleanUtils.scala:15-16); we make the
    * clock injectable, defaulting to that same fixed instant.
    */
  val FixedClock: String = "2024-01-01 00:00:00"
  val FixedClockLater: String = "2024-06-01 00:00:00"

  /** Pattern A core — stamp the 4-column DWD/DWS audit contract
    * (reference SimpleDataCleanUtils.scala:24-27: dwd_insert_user,
    * dwd_insert_time, dwd_modify_user, dwd_modify_time; dws_* variant at
    * CustomerAddrLevelAggrDataClean.scala:35-38).
    */
  def withAudit(df: DataFrame, prefix: String = "dwd",
                user: String = "user1",
                clock: String = FixedClock): DataFrame =
    df.withColumn(s"${prefix}_insert_user", lit(user))
      .withColumn(s"${prefix}_insert_time", lit(clock).cast("timestamp"))
      .withColumn(s"${prefix}_modify_user", lit(user))
      .withColumn(s"${prefix}_modify_time", lit(clock).cast("timestamp"))

  /** Latest-partition selection (reference G1/P6/P7:
    * `WHERE etl_date = (SELECT MAX(etl_date) …)`,
    * OrderMasterDataClean.scala:70-72, and the driver-round-trip form at
    * SimpleDataCleanUtils.scala:19-20).
    *
    * Implemented as a broadcast single-row join instead of a collect: no
    * driver boundary, one plan. On a table physically partitioned by
    * `partCol` the max is answerable from file listing metadata; here it
    * is a cheap single-column scan (parquet reads only `partCol`).
    */
  def latestPartition(df: DataFrame, partCol: String): DataFrame = {
    val mx = df.agg(max(col(partCol)).as("__latest"))
    df.join(broadcast(mx), col(partCol) === col("__latest")).drop("__latest")
  }

  /** [[latestPartition]] for a PHYSICALLY partitioned table — the
    * reference's actual layout (metastore partition values,
    * SimpleDataCleanUtils.scala:19-20). Two properties the joined form
    * can't give (PlanSpec asserts both):
    *
    *  - the max computation reads ZERO data columns: partition values
    *    live in directory/metastore metadata, so the max-side scan's
    *    ReadSchema is `struct<>` — O(#partitions) metadata, no data IO;
    *  - the result scan STATICALLY prunes to the one matching
    *    partition, because Spark prunes at plan time only on literals —
    *    so the single-value collect here is the point, not a wart: it
    *    is the `SHOW PARTITIONS → max` metastore lookup, and turns the
    *    downstream read into one partition directory instead of a
    *    full-table runtime filter.
    *
    * Use on directory-partitioned data; [[latestPartition]] stays the
    * shape for arbitrary (unpartitioned) relations.
    */
  def latestPartitionPruned(df: DataFrame, partCol: String): DataFrame = {
    val row = df.select(col(partCol)).agg(max(col(partCol))).head()
    if (row.isNullAt(0)) df.where(lit(false))
    else df.where(col(partCol) === lit(row.get(0)))
  }

  /** W1+P8 — keep the single newest row per business key
    * (reference CustomerInfDataClean.scala:41-45: `row_number()` over
    * (partition by key order by time desc), filter rank=1, drop rank).
    *
    * `tieBreakers` make the ordering total — the reference's single-column
    * desc ordering is nondeterministic under ties (SURVEY.md §7.2.1).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String],
                  orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") === 1)
      .drop("__rank")
  }

  /** Pattern B — SCD-style latest-record merge (upsert) of a new ODS
    * snapshot into the existing DWD table
    * (reference CustomerInfDataClean.scala:22-88, CouponInfo, ProductInfo).
    *
    * Semantics reproduced exactly:
    *  - tag each side with `data_source` 'ods'/'dwd' (:32-33);
    *  - `unionByName` (:37) — here with `allowMissingColumns=true` so ODS
    *    input needn't carry DWD audit columns (defect A-3, SURVEY §7.4);
    *  - keep newest row per key via row_number (:41-43);
    *  - audit reconciliation CASE (:55-58): surviving DWD rows keep their
    *    original `dwd_insert_time`; ODS-sourced rows get `clock`;
    *    `dwd_modify_time` is refreshed to `clock` only for ODS rows.
    */
  def scdMerge(ods: DataFrame, dwd: DataFrame, keys: Seq[String],
               orderCol: String, tieBreakers: Seq[Column] = Nil,
               user: String = "user1",
               clock: String = FixedClockLater): DataFrame = {
    val tagged = ods.withColumn("data_source", lit("ods"))
      .unionByName(dwd.withColumn("data_source", lit("dwd")),
        allowMissingColumns = true)
    val newest = dedupLatest(tagged, keys,
      col(orderCol).desc +: tieBreakers)
    val now = lit(clock).cast("timestamp")
    newest
      .withColumn("dwd_insert_user",
        when(col("data_source") === "ods", lit(user))
          .otherwise(coalesce(col("dwd_insert_user"), lit(user))))
      .withColumn("dwd_insert_time",
        when(col("data_source") === "ods", now)
          .otherwise(coalesce(col("dwd_insert_time"), now)))
      .withColumn("dwd_modify_user", lit(user))
      .withColumn("dwd_modify_time",
        when(col("data_source") === "ods", now)
          .otherwise(coalesce(col("dwd_modify_time"), now)))
  }

  /** Pattern B extended — SCD Type-2 history: instead of keeping only the
    * newest row per key (scdMerge), keep EVERY version with its validity
    * interval: valid_from = its own order value, valid_to = the next
    * version's (null while current), plus an is_current flag. The
    * reference's warehouse stores dim_* tables as upsert snapshots; this
    * is the standard upgrade when history must be queryable.
    * One window shuffle on the key — same cost shape as dedupLatest.
    */
  def scd2History(df: DataFrame, keys: Seq[String],
                  orderCol: String, tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc +: tieBreakers: _*)
    df.withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Pattern C — bi-store full-outer merge with left-side precedence
    * (reference OrderMasterDataClean.scala:157-187: Hive latest partition
    * FULL OUTER JOIN HBase snapshot on the business key, then per-column
    * `coalesce(hive_c, hbase_c)`).
    *
    * Implements the *intended* join — explicit condition on the renamed
    * key — not the as-written USING defect (A-1, SURVEY §7.4). Column set
    * is the union of both sides; columns present on both are coalesced
    * left-first, the join key is coalesced from both sides (fixes A-5:
    * right-only rows keep their key/partition value).
    */
  def coalesceMerge(left: DataFrame, right: DataFrame,
                    key: String): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val joined = l.join(r, col(s"l.$key") === col(s"r.$key"), "full_outer")
    val rightOnly = right.columns.filterNot(left.columns.contains)
    val merged: Seq[Column] =
      left.columns.toSeq.map { c =>
        if (c == key) coalesce(col(s"l.$key"), col(s"r.$key")).as(key)
        else if (right.columns.contains(c))
          coalesce(col(s"l.$c"), col(s"r.$c")).as(c)
        else col(s"l.$c").as(c)
      } ++ rightOnly.toSeq.map(c => col(s"r.$c").as(c))
    joined.select(merged: _*)
  }

  /** Pattern D — star denormalization: fact ⟕ dim ⟕ dim …
    * (reference CustomerAddrLevelAggrDataClean.scala:28-30: chained
    * left-outer USING joins customer_inf→customer_addr→customer_level_inf).
    *
    * Dimensions are broadcast explicitly — at 100 TB the fact table never
    * shuffles for these joins. Each dim is pruned to `keys ++ keep`
    * before the join (fixes the duplicate-audit-column collision, defect
    * A-4): only requested columns survive.
    */
  def denormalize(fact: DataFrame,
                  dims: Seq[(DataFrame, Seq[String], Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys, keep)) =>
      val pruned = dim.select((keys ++ keep).distinct.map(col): _*)
      acc.join(broadcast(pruned), keys, "left_outer")
    }

  /** S3/P9 — keyed-snapshot scan with a row-key regex predicate
    * (reference OrderMasterDataClean.scala:76-95: HBase `Scan` +
    * `RowFilter(RegexStringComparator(".*20221001.*"))`, the regex
    * evaluated server-side in the region servers).
    *
    * Re-based on a keyed table: `rlike` on the key column. Catalyst keeps
    * the predicate next to the scan; on parquet the StartsWith/contains
    * subset of the regex benefits from row-group stats pruning, which is
    * the storage-side-pushdown analog of the HBase region filter.
    */
  def keyedSnapshotScan(df: DataFrame, keyCol: String,
                        rowkeyRegex: String): DataFrame =
    df.filter(col(keyCol).rlike(rowkeyRegex))

  /** CDC changelog apply — the upsert-with-tombstones upgrade of
    * [[scdMerge]] (extension; the reference's merges never delete).
    * The log is a stream of (key, seq, op) rows where op ∈ {upsert,
    * delete}: the final state keeps, per key, the row with the highest
    * sequence UNLESS that row is a delete tombstone, in which case the
    * key vanishes. This is the standard collapse of a Debezium/binlog
    * style changelog into a snapshot.
    *
    * `seqCols` must totally order each key's changes (pass a tie-breaker
    * like the log offset, same determinism rule as [[dedupLatest]]).
    * One window shuffle on the key; rank=1 rides Spark 4's
    * WindowGroupLimit rewrite, so per-partition top-1 happens before the
    * exchange — at 100 TB the shuffle carries one row per key per map
    * partition, not the whole log.
    */
  def applyChangelog(log: DataFrame, keys: Seq[String],
                     seqCols: Seq[String], opCol: String,
                     deleteOp: String = "D"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    log.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__graft_rn")
  }
}
