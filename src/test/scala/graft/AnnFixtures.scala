package graft

/** The 4-center 16-dim clustered ANN corpus shared by the durable-index
  * specs (PipelineOpsSpec) and the plan gates (PlanInvariantsSpec) —
  * one spelling so the gate and the lifecycle tests exercise the same
  * data shape. */
object AnnFixtures {
  def annRows(ids: Range, seed: Int = 9103)
      : Seq[(Long, Array[Float], String)] = {
    val rnd = new scala.util.Random(seed)
    val centers = (0 until 4).map { c =>
      Array.tabulate(16)(i => if (i / 4 == c) 10f else 0f)
    }
    ids.map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.3f),
        if ((i / 4) % 2 == 0) "even" else "odd")
    }
  }
}
