package graft

/** Session-wide engine tuning shared by every graft entry point
  * (Bench, Verify, Explain, ScaleProbe, PlanDump, the test harness).
  *
  * Grown during the optimization rounds; every entry is measured, has
  * a scale rationale (not a local[32] artifact), and cannot change
  * query RESULTS — only how fast identical results are produced.
  */
object SessionTuning {
  /** Spark conf entries folded into each session builder.
    *
    * - Fork-free local FS wiring: see [[graft.sources.NoForkFs]].
    * - `spark.sql.streaming.checkpoint.fileChecksum.enabled=false`:
    *   Spark 4.1 turned on sidecar checksum files for every streaming
    *   checkpoint write (state deltas, offset/commit log entries).
    *   Thread dumps of the stream-stream join bench showed every
    *   state-store commit blocked in
    *   `ChecksumCancellableFSDataOutputStream.close` awaiting the
    *   async checksum-file write — per batch, per partition, per
    *   store (a stream-stream join keeps 4 stores per partition), the
    *   commit path pays a second small-file round trip. That doubles
    *   checkpoint file ops at ANY scale and on object stores doubles
    *   PUT traffic; the pre-4.1 behavior (no sidecars) is what Delta/
    *   vanilla deployments ran for years. Disabling restores it.
    *   Interleaved A/B on `stream_join_outer` (reps=1, alternating,
    *   host-calibrated): ON {10.6, 8.7, 13.6} s vs OFF {9.1, 7.6,
    *   9.1} s — OFF faster in all three pairs.
    */
  /** Core-count-aware entries — call with the session's core count
    * (the `local[N]` N at the entry points; a cluster session would
    * pass its executor-core total).
    *
    * `parallelPartitionDiscovery.parallelism` defaults to 10000, which
    * makes every distributed file-listing job launch ONE TASK PER
    * PATH: the binaryFile-stream bench (`stream_image_dedup`, 5000
    * staged files) spent 4.5 s wall per 2048-task listing job on
    * ≤0.2 s of actual stat work — pure scheduling overhead, 12×
    * per run. Listing is latency-bound I/O, so a small multiple of
    * the core count keeps full overlap at any cluster size while
    * bounding task-scheduling cost; 10000 single-path tasks is only
    * right when paths ≫ 10000. */
  def sparkConf(cores: Int): Seq[(String, String)] =
    base ++ Seq(
      "spark.sql.sources.parallelPartitionDiscovery.parallelism" ->
        math.min(10000, math.max(32, 4 * cores)).toString,
    )

  private val base: Seq[(String, String)] =
    graft.sources.NoForkFs.sparkConf ++ Seq(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
      // Skip Hadoop's CLIENT-side checksum layer for `file:` too
      // (LocalFileSystem = ChecksumFileSystem): every staged/committed
      // file otherwise pays a second `.crc` sidecar create on write
      // and a CRC verify pass on read-back. Production filesystems do
      // integrity server-side (HDFS) or per-object (S3 etags), and
      // parquet carries its own page-level integrity — the sidecars
      // are pure local-mode overhead that scales with file COUNT.
      // Interleaved A/B on the file-heavy lifecycle basket
      // {curation_incremental, sql_catalog_merge,
      // pipeline_cdf_incremental, stream_file_ingest}: checksummed
      // {30.0, 27.2, 28.2} s vs raw {28.3, 26.4, 25.8} s — raw faster
      // in all three pairs. Overrides the fs.file.impl entry from
      // NoForkFs.sparkConf (later entry wins in builder fold order).
      "spark.hadoop.fs.file.impl" ->
        classOf[graft.sources.NoForkRawLocalFileSystem].getName,
    )
}
