package graft.functions

/** File-resource registry (reference: AddFileResource /
  * RemoveFileResource / ListFileResources proxy RPCs, impl.go:6727-;
  * client contract tests/python_client/milvus_client/
  * test_milvus_client_file_resource.py — named dictionary files that
  * analyzer params reference by `resource_name` instead of inlining,
  * e.g. a stop-word list or synonym dictionary shared across
  * collections).
  *
  * Spark shape: a driver-side name → content registry; analyzers
  * resolve `stop_words_resource` / `synonyms_resource` /
  * `word_list_resource` params through it at ANALYZER-BUILD time, so
  * the resolved dictionary rides into the compiled column expression
  * like any literal — executors never read resource files. Contract
  * per the reference tests: re-adding the same name with identical
  * content is idempotent; a different content under an existing name
  * errors (resources are immutable — remove first); removing or
  * resolving a missing name errors.
  */
object FileResources {

  private val resources = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // monotone registry epoch, bumped by every successful mutation:
  // analyzer-derived caches (Analyzers.analyzeLocal) key on it so a
  // remove+re-add with different content invalidates their entries
  private val epochCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def epoch: Long = epochCounter.get()

  def add(name: String, content: String): Unit = {
    require(name.nonEmpty, "file resource name must be non-empty")
    val prev = resources.putIfAbsent(name, content)
    require(prev == null || prev == content,
      s"file resource '$name' already exists with different content — remove it first")
    if (prev == null) epochCounter.incrementAndGet()
  }

  def remove(name: String): Unit =
    if (resources.remove(name) == null)
      throw new NoSuchElementException(s"file resource '$name' does not exist")
    else epochCounter.incrementAndGet()

  def get(name: String): String = {
    val c = resources.get(name)
    if (c == null) throw new NoSuchElementException(
      s"file resource '$name' does not exist")
    c
  }

  def list: Seq[String] = {
    import scala.jdk.CollectionConverters._
    resources.keySet().asScala.toSeq.sorted
  }
}
