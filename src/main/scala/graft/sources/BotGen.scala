package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.util.Random

/**
 * Deterministic port of the reference's clickstream generator
 * (`botgen.py:22-42,66-80`): per second, `freqPerSec` users sampled from the
 * population act (10% clicks, 10 categories 1000–1009); every 2 s EVERY bot
 * acts (75% clicks, 20 categories 1000–1019). The per-capita asymmetry is
 * the point: an individual user sees ~freq·600/nUsers actions per 10-min
 * window (≈1 at the reference's 100/s over 50 000 users) while every bot
 * racks up 300 — so bots trip all three rules and users none. Seeded PRNG +
 * fixed base time replace the reference's wall clock (SURVEY.md §5).
 *
 * Writes json-lines files compatible with [[Ingest.wireSchema]].
 */
object BotGen {

  final case class Event(time: Long, categoryId: String, ip: String, action: String)

  def userIp(id: Int): String = s"172.10.${id / 255}.${id % 255}"
  def botIp(id: Int): String = s"172.20.${id / 255}.${id % 255}"

  /** Generate `durationS` seconds of traffic starting at `baseS`. */
  def events(nUsers: Int, nBots: Int, durationS: Long, freqPerSec: Int = 1,
      baseS: Long = 1767225600L, seed: Long = 42L): Seq[Event] = {
    val rnd = new Random(seed)
    val users = (0 until nUsers).map(userIp).toVector
    val bots = (0 until nBots).map(botIp)
    val out = Seq.newBuilder[Event]
    var t = baseS
    while (t < baseS + durationS) {
      rnd.shuffle(users).take(math.min(freqPerSec, nUsers)).foreach { ip =>
        val action = if (rnd.nextDouble() < 0.10) "click" else "view"
        out += Event(t, (1000 + rnd.nextInt(10)).toString, ip, action)
      }
      if (t % 2 == 0) bots.foreach { ip =>
        val action = if (rnd.nextDouble() < 0.75) "click" else "view"
        out += Event(t, (1000 + rnd.nextInt(20)).toString, ip, action)
      }
      t += 1
    }
    out.result().sortBy(e => (e.time, e.ip))
  }

  private def toJsonLine(e: Event): String =
    s"""{"time": ${e.time}, "categoryId": "${e.categoryId}", "ip": "${e.ip}", "action": "${e.action}"}"""

  /** Write events as json-lines, split into `nFiles` files (the generator
   * appends to rotating log files; file streaming sources pick each up once
   * it appears). Modification times are staggered in chunk order: the file
   * source processes files by mtime, and ties would randomize processing
   * order — making time-ordered chunks arrive out of order and get dropped
   * as late data by the watermark. */
  def writeJsonDir(dir: String, evs: Seq[Event], nFiles: Int = 4,
      startIndex: Int = 0): Unit = {
    Files.createDirectories(Paths.get(dir))
    val t0 = System.currentTimeMillis() - 3600L * 1000L
    evs.grouped(math.max(1, (evs.size + nFiles - 1) / nFiles)).zipWithIndex.foreach {
      case (chunk, i) =>
        // startIndex keeps a later batch of files (e.g. written between two
        // runs of a checkpointed query) from overwriting the earlier ones
        val p = Files.write(Paths.get(dir, f"part-${startIndex + i}%04d.log.json"),
          chunk.map(toJsonLine).mkString("", "\n", "\n").getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 + (startIndex + i) * 1000L))
    }
  }
}
