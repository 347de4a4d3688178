package graft

/** Shared 64-dim fixture-vector builder for the LSH-contract specs
  * (c11's planted geometry, d28's planted leak): the deterministic
  * hyperplane family is 64-dimensional, so every planted embedding
  * must be too — one definition keeps that dimension assumption in one
  * place instead of a per-spec copy that could drift.
  */
object TestVectors {
  val Dim = 64

  def axes(w: (Int, Double)*): Array[Float] = {
    val a = Array.fill(Dim)(0f)
    w.foreach { case (i, x) => a(i) = x.toFloat }
    a
  }
}
