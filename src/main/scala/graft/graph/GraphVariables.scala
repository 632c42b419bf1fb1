package graft.graph

/** Graph-level metadata variables — the TinkerPop `Graph.Variables`
  * surface (reference: TorcGraphVariables.java:26-47; the reference
  * declares the interface but throws UnsupportedOperationException on
  * every method, so this is a working superset of its contract).
  *
  * A small driver-side KV map, deliberately NOT a DataFrame: graph
  * variables are catalog metadata (a schema version, a load timestamp,
  * a lineage tag), bounded by what an operator types by hand — never
  * data-scale. Values are strings; callers serialize richer types.
  * Thread-safe via a concurrent map. Persisted as a JSON sidecar by
  * [[graft.sources.GraphLoader.persist]] / restored by `open`.
  */
final class GraphVariables {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** All defined variable names. */
  def keys: Set[String] = {
    val it = m.keySet().iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** `Optional<R> get(key)` of the reference interface. */
  def get(key: String): Option[String] = Option(m.get(key))

  def set(key: String, value: String): Unit = {
    require(key != null && key.nonEmpty, "variable key must be non-empty")
    require(value != null, "variable value must be non-null (use remove)")
    m.put(key, value)
  }

  def remove(key: String): Unit = m.remove(key)

  def toMap: Map[String, String] = {
    val it = m.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  def setAll(kvs: Map[String, String]): Unit = kvs.foreach { case (k, v) => set(k, v) }
}
