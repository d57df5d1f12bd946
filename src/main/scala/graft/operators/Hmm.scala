package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Hidden-Markov-Model decoding (reference: stdlib/ml/hmm.py:11
  * create_hmm_reducer — a stateful reducer running Viterbi beam search
  * over each key's observation sequence, with the state graph supplied
  * by the caller).
  *
  * Spark-first mapping: the reference folds observations into per-key
  * reducer state; here each instance's sequence is decoded in one
  * `flatMapGroups` pass after an in-group sort by the order column —
  * the same "one key's history fits one worker" contract the
  * reference's reducer state has. Keys decode in parallel across the
  * cluster; nothing about the corpus size is driver-resident.
  *
  * Everything is deterministic: states are iterated in declaration
  * order and ties break toward the lexicographically smallest state
  * name, so re-runs (and engines) agree bit-for-bit.
  */
object Hmm {

  /** Model: log initial / transition probabilities as maps (absent
    * entries = -∞, i.e. forbidden), log emission as a serializable
    * function of (state, observation). Mirrors the reference's
    * node/edge attributes (calc_emission_log_ppb, log_transition_ppb). */
  case class Model(states: Seq[String],
      logInit: Map[String, Double],
      logTrans: Map[(String, String), Double],
      logEmit: (String, String) => Double) extends Serializable

  private val NegInf = Double.NegativeInfinity

  /** Viterbi-decode each instance's observation sequence. Returns
    * (instance, order, observation, state) — the max-likelihood state
    * per observation. `beamSize` keeps only the top-k states per step
    * (the reference's beam_size), trading exactness for state-space
    * size. Sequences with zero total probability decode to the
    * best-effort prefix argmax (same as beam exhaustion). */
  def viterbi(df: DataFrame, instance: Column, order: Column, obs: Column,
      model: Model, beamSize: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(instance.cast("string").as("i"),
        order.cast("long").as("o"), obs.cast("string").as("x"))
      .as[(String, Long, String)]
    // the state scan order is a property of the MODEL — sort once here
    // and ship the sorted list in the closure, not once per observation
    val sortedStates = model.states.sorted.toList
    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      val seq = it.toIndexedSeq.sortBy(r => (r._2, r._3))
      if (seq.isEmpty) Iterator.empty
      else {
        // dp: per state, (log prob of best path ending here, that path
        // reversed). States scanned in model order; ties toward the
        // smaller state name keep the decode deterministic.
        var dp: List[(String, (Double, List[String]))] =
          sortedStates.map { s =>
            val lp = model.logInit.getOrElse(s, NegInf) +
              model.logEmit(s, seq.head._3)
            s -> ((lp, List(s)))
          }
        def prune(l: List[(String, (Double, List[String]))]) =
          beamSize match {
            case Some(k) => l.sortBy { case (s, (lp, _)) => (-lp, s) }.take(k)
            case None => l
          }
        dp = prune(dp)
        seq.tail.foreach { t =>
          dp = prune(sortedStates.map { s =>
            val (plp, ppath) = dp.map { case (p, (lp, path)) =>
              (lp + model.logTrans.getOrElse((p, s), NegInf), path)
            }.maxBy(_._1) // stable max: first in dp order wins ties
            s -> ((plp + model.logEmit(s, t._3), s :: ppath))
          })
        }
        val bestRev = dp.minBy { case (s, (lp, _)) => (-lp, s) }._2._2
        bestRev.reverse.iterator.zip(seq.iterator).map {
          case (state, (_, o, x)) => (key, o, x, state)
        }
      }
    }.toDF("instance", "order", "observation", "state")
  }
}
