package graft

/** Tiny main used to verify that the sbt output settings keep a JSON line
  * on stdout clean (no "[info] " logger prefix, no "[success]" postlude) —
  * the bench/verify driver parses the JSON from the tail of `sbt run`
  * output, and rounds 1-4 all lost it to sbt log decoration. */
object ProbeJson {
  def main(args: Array[String]): Unit = {
    System.err.println("[probe] this goes to stderr")
    println("""{"metric":"probe","value":1}""")
  }
}
