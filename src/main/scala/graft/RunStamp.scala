package graft

/** Run provenance for the correctness/bench artifacts (ADVICE r8): the
  * repo commit and wall-clock timestamp embedded in each output make a
  * genuine re-run distinguishable from a copied file. Best-effort — a
  * missing git binary degrades to "unknown", never fails the run. */
object RunStamp {
  lazy val commit: String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      p.waitFor()
      if (p.exitValue == 0 && out.matches("[0-9a-f]{40}")) out else "unknown"
    } catch { case _: Throwable => "unknown" }

  lazy val ts: String =
    java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
}
