package graft.sinks.v2

/**
 * Crash-point fault injection for the kv commit protocols. Every
 * multi-step mutation (two-phase epoch commit, OCC upsert CAS, deletion-
 * vector swap, clustered compaction, retention fold, row-level DML)
 * calls [[hit]] at each step boundary where a real writer could die —
 * after staging, after segment publish, after dv writes, between the
 * manifest-tmp write and the CAS rename, after the CAS but before
 * cleanup. A test arms a named point and the next writer to reach it
 * throws [[InjectedFailure]] there, exactly as if the process had been
 * killed: files written so far stay on disk, nothing after the point
 * runs. KvCrashSpec then asserts the protocol's crash contract —
 * `readCurrent` equals the pre-op state for any point before the CAS,
 * the post-op state for any point after it, a retry converges to the
 * model, and `vacuum` reclaims every orphan the crash left.
 *
 * Production cost: one static `isEmpty` check per step boundary, driver
 * side only — never in a per-row or per-task path.
 */
object Failpoints {

  /** thrown at an armed point — the stand-in for `kill -9` */
  final class InjectedFailure(val point: String)
    extends RuntimeException(s"graft-kv: injected crash at '$point'")

  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // every point that fired at least once — lets the sweep assert it
  // actually exercised the path it armed (a renamed/moved hook would
  // otherwise silently degrade the spec to testing nothing)
  private val fired =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Arm `point` to fire ONCE: the next [[hit]] throws, subsequent hits
   * pass — so the test's retry runs the same code path to completion. */
  def arm(point: String): Unit = armed.add(point)

  /** Disarm every point. Fire history survives (several specs assert
   * `hasFired` after their `finally disarmAll()`) — a test that must
   * witness ITS OWN injection calls [[reset]] first. */
  def disarmAll(): Unit = armed.clear()

  /** Disarm everything AND forget fire history. Call at the START of a
   * test whose `hasFired` assertion must not be satisfied by a sticky
   * flag left by an earlier test in the same JVM — otherwise the
   * "armed hook never fired" guard silently tests nothing after the
   * first firing. */
  def reset(): Unit = { armed.clear(); fired.clear() }

  def hasFired(point: String): Boolean = fired.contains(point)

  /** Step boundary marker. No-op unless `point` is armed. */
  def hit(point: String): Unit =
    if (!armed.isEmpty && armed.remove(point)) {
      fired.add(point)
      throw new InjectedFailure(point)
    }
}
