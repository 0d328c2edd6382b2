package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Medallion (bronze → silver) ETL operators — Spark-native
  * re-expressions of the reference's silver layer
  * (reference: `2 Medaillon architecture.py`:104-567).
  *
  * Scale notes: enrichments and hashes are map-only (no shuffle);
  * dedup/merge shuffle exactly once on their key; the surrogate-key
  * dim join broadcasts the dimension.
  */
object Medallion {

  /** Silver customer dim: surrogate key + CASE-WHEN region-code
    * enrichment (≈ dim_locations `country_code` + dim_customers
    * `unique_id` at reference `2 Medaillon architecture.py`:128-176). */
  def silverDimCustomer(customer: DataFrame, nation: DataFrame,
                        region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        concat_ws("-", col("n_name"), col("c_custkey").cast("string"))
          .as("unique_id"),
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation_name"),
        when(col("r_name").isin("ASIA", "AFRICA"), "APJ-EMEA-SOUTH")
          .when(col("r_name").isin("EUROPE", "MIDDLE EAST"), "EMEA")
          .otherwise("AMER").as("region_code"))

  /** Latest-record-per-key dedup (≈ v_silver_sales `row_number() over
    * (partition by SaleID order by exported_ts desc) = 1`, reference
    * `2 Medaillon architecture.py`:321-356).
    *
    * Tie-broken on `tieBreaker` desc so the result is deterministic
    * even with equal order keys. One shuffle on `key`.
    */
  def dedupLatest(df: DataFrame, key: String, orderCol: String,
                  tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(orderCol).desc, col(tieBreaker).desc)
    df.withColumn("latest_record", row_number().over(w))
      .filter(col("latest_record") === 1)
      .drop("latest_record")
  }

  /** Whole-row change-detection hash (≈ `sha2(concat_ws('||', *), 256)
    * as row_hash`, reference `2 Medaillon architecture.py`:353). Only
    * pass columns with engine-stable string renderings (ints/strings —
    * not doubles or timestamps). Map-only. */
  def withRowHash(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("row_hash",
      sha2(concat_ws("||", cols.map(c => col(c).cast("string")): _*), 256))

  /** Itemisation via posexplode + `id-pos` surrogate key (≈
    * v_silver_sale_items `posexplode(from_json(sale_items, ...))`,
    * reference `2 Medaillon architecture.py`:380-414). Here the nested
    * payload is the whitespace-tokenised document body. Map-side only
    * (explode never shuffles). */
  def explodeItems(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("item_number", "token")))
      .select(
        concat_ws("-", col("doc_id").cast("string"),
          col("item_number").cast("string")).as("id"),
        col("doc_id"), col("item_number"), col("token"))

  /** Batch MERGE upsert: rows from `updates` win on `keys`; unmatched
    * `base` rows survive (≈ `merge into silver_sales ... when matched
    * then update set * when not matched then insert *`, reference
    * `2 Medaillon architecture.py`:530-541).
    *
    * anti-join + union: both sides shuffle once on `keys`; no window,
    * no driver round-trip — scales linearly with input.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
                  keys: Seq[String]): DataFrame =
    base.join(updates, keys, "left_anti").unionByName(updates)

  /** SCD-2-style validity intervals per key from an append log —
    * the batch analog of the reference's Delta time travel (`VERSION
    * AS OF`, reference `1 Data ingestion.py`:189-213): every historical
    * version is addressable by its validity interval. One shuffle. */
  def scd2History(df: DataFrame, key: String, orderCol: String,
                  versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(orderCol), col(versionCol))
    df.withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_version", lead(col("version"), 1).over(w))
      .withColumn("is_current", col("valid_to_version").isNull)
  }

  /** Row-level diff between two snapshots of a keyed table: per key,
    * `added` / `removed` / `changed` (same key, different content
    * hash over `cols`) — the data-diff a pipeline runs before
    * promoting a rebuilt table, where [[graft.operators.Profile]]'s
    * profile_diff answers "did the SHAPE move" this answers "WHICH
    * rows moved". Unchanged rows are omitted (at 100 TB they are the
    * overwhelming majority — emitting them would make the diff as big
    * as the table).
    *
    * Scale shape: each side collapses to (key, row_hash) — 40-byte
    * rows — before the one full-outer join shuffle on the key; the
    * content columns never shuffle. */
  def tableDiff(prev: DataFrame, cur: DataFrame, key: String,
                cols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String): DataFrame =
      withRowHash(df, cols).select(col(key), col("row_hash").as(h))
    hashed(prev, "h_prev").join(hashed(cur, "h_cur"),
        Seq(key), "full_outer")
      .withColumn("diff_status",
        when(col("h_prev").isNull, lit("added"))
          .when(col("h_cur").isNull, lit("removed"))
          .when(col("h_prev") =!= col("h_cur"), lit("changed")))
      .filter(col("diff_status").isNotNull)
      .select(col(key), col("diff_status"))
  }
}
