package graft

import org.scalatest.matchers.should.Matchers

/** The materialization-policy contract (r12 verdict "what's wrong"
  * #2): every shared-intermediate site routes through [[Ckpt]], whose
  * default is executor-local checkpointing (fast, non-fault-tolerant)
  * and whose cluster mode (`spark.graft.reliableCheckpoint=true` + a
  * checkpoint dir) swaps in reliable `checkpoint()` so a 100 TB run
  * survives executor loss. Correctness must be IDENTICAL under
  * either policy — the helpers depend on reading one materialization,
  * never on where its blocks live. Exercised over the shapes that
  * lean hardest on the checkpoint: the two-phase rank helper
  * (rangedByKey's stable partition ids), the iterative CC fixpoint,
  * the memoized-signature dedup family, and the size-adaptive salted
  * pair build.
  */
class CheckpointPolicySpec extends SparkSuite with Matchers {

  test("reliable checkpoint() path returns results identical to localCheckpoint") {
    val probes = Seq(
      "q_skew_stats",     // Skew.scalableRank (ranged checkpoint)
      "q_dedup_clusters", // CC fixpoint (in-loop lineage truncation)
      "q_lsh_neardup",    // memoized signature + star-score tables
      "q_basket_pairs")   // saltedSelfPairs' shared size-tag table

    def runAll(): Map[String, Seq[Seq[Any]]] = {
      // memoized tables must rebuild under the policy being tested
      graft.ops.Text.clearMemoCaches()
      try probes.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().toSeq.map(_.toSeq)
      }.toMap
      finally graft.ops.Text.clearMemoCaches()
    }

    val local = runAll()
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    spark.conf.set(Ckpt.Flag, "true")
    val reliable =
      try runAll()
      finally spark.conf.set(Ckpt.Flag, "false")
    probes.foreach { n =>
      withClue(n) {
        reliable(n) shouldBe local(n)
        reliable(n).size should be > 0
      }
    }
    // the reliable path actually wrote to the checkpoint dir (proof
    // the flag routed to checkpoint(), not localCheckpoint)
    java.nio.file.Files.list(ckptDir).count() should be > 0L
  }
}
