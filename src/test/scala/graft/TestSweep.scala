package graft

/** Bounded-parallel full-inventory sweeps for the CI suites.
  *
  * Three suites walk every `SparkEntry.queries` builder (determinism,
  * runs-at-sf0.001, plan lint); run sequentially they alone cost ~18
  * min and pushed `sbt test` past the 30-min CI budget (r16 verdict
  * task 2). Per-query work is independent and Spark's scheduler runs
  * concurrent driver threads' jobs side by side, so each sweep fans out
  * over a fixed pool. Coverage is unchanged — every query still runs;
  * only the wall-clock shrinks.
  */
object TestSweep {

  /** Threads per sweep: enough to hide per-query driver latency on the
    * local[4] test session without starving concurrent stages.
    */
  val Threads = 8

  /** Run `check` over every item on a bounded pool; collect the failure
    * messages (None = pass) in input order. Throwables become failures
    * rather than aborting the sweep, so one bad query reports alongside
    * the rest.
    */
  def sweep[A](items: Seq[A])(check: A => Option[String]): Seq[String] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Threads)
    try {
      val futs = items.map { it =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] =
            try check(it)
            catch {
              case e: Throwable =>
                Some(s"sweep item threw ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
        })
      }
      futs.flatMap(_.get())
    } finally pool.shutdown()
  }

  /** Like [[sweep]] but collects every item's result (the plan-lint
    * sweep wants the per-query finding map, not only failures). `f`
    * must convert its own throwables into a result value.
    */
  def sweepResults[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Threads)
    try {
      val futs = items.map { it =>
        pool.submit(new java.util.concurrent.Callable[B] { def call(): B = f(it) })
      }
      futs.map(_.get())
    } finally pool.shutdown()
  }
}
