package graft.streaming

/** Key-value side-sink plumbing for [[StreamOps.startParquetSink]]'s
  * multi-sink fan-out (S8). The reference mirrors stream results into
  * KV stores for point-lookup serving — profile tags into HBase, hot
  * aggregates into Redis (reference docs/画像开发方案.md:5,
  * docs/实时数仓.md:54,79). The Spark-shaped version of that contract:
  *
  *  - the SINK is a plain `DataFrame => Unit` over each micro-batch
  *    (same interface as [[StreamOps.jdbcSideSink]]), writing via
  *    `foreachPartition` so puts stream out of every executor in
  *    parallel — rows never funnel through the driver;
  *  - each task obtains its client from a PER-JVM registry (the
  *    standard HBase/Redis connection-pool pattern: connections are
  *    not serializable, so the closure carries the store's address and
  *    the executor materializes/caches the client on first use);
  *  - last-write-wins per key within and across micro-batches — KV
  *    upsert semantics, which is what makes the sink idempotent under
  *    micro-batch replay (an at-least-once re-put of the same row is
  *    invisible).
  *
  * The embedded binding here is RocksDB (ships with Spark — it backs
  * the streaming state store), which is a real LSM KV store with the
  * same put/get surface a remote HBase/Redis client exposes; on a
  * cluster the registry would hand out network clients keyed by the
  * store address instead of local DB handles keyed by path.
  */
trait KvClient {
  def put(key: Array[Byte], value: Array[Byte]): Unit
  def get(key: Array[Byte]): Option[Array[Byte]]
  /** All pairs, for serving-side scans and test assertions. */
  def scanAll(): Iterator[(Array[Byte], Array[Byte])]
}

/** Per-JVM RocksDB handle registry. One shared, thread-safe DB handle
  * per canonical path (RocksDB allows exactly one open per process;
  * puts are internally synchronized). Handles live for the JVM —
  * the lifecycle a connection pool would own. */
object RocksKv {
  private val open = scala.collection.mutable.HashMap[String, KvClient]()

  // whole lookup synchronized: a concurrent-map getOrElseUpdate may
  // evaluate its default twice under contention, and a second
  // RocksDB.open on the same path throws on the process lock
  def client(path: String): KvClient = synchronized {
    val canonical = new java.io.File(path).getCanonicalPath
    open.getOrElseUpdate(canonical, {
      org.rocksdb.RocksDB.loadLibrary()
      val opts = new org.rocksdb.Options().setCreateIfMissing(true)
      val db = org.rocksdb.RocksDB.open(opts, canonical)
      new KvClient {
        def put(key: Array[Byte], value: Array[Byte]): Unit =
          db.put(key, value)
        def get(key: Array[Byte]): Option[Array[Byte]] =
          Option(db.get(key))
        def scanAll(): Iterator[(Array[Byte], Array[Byte])] = {
          val it = db.newIterator()
          it.seekToFirst()
          new Iterator[(Array[Byte], Array[Byte])] {
            def hasNext: Boolean = it.isValid
            def next(): (Array[Byte], Array[Byte]) = {
              val kv = (it.key(), it.value())
              it.next()
              kv
            }
          }
        }
      }
    })
  }
}
