package graft.server

/** Request-shape error: the CALLER's fault, surfaced as HTTP 400.
  *
  * A dedicated type rather than IllegalArgumentException (ADVICE r8):
  * Spark throws IllegalArgumentException subclasses
  * (SparkIllegalArgumentException, NumberFormatException, …) while
  * EXECUTING /query SQL, and a blanket `case e: IllegalArgumentException
  * => 400` labeled those engine-side faults as caller errors — contrary
  * to the contract that engine errors stay 500 (the reference surfaces
  * engine errors the same way). Only request-validation sites throw
  * this, so only genuine caller errors map to 400. */
final class BadRequest(msg: String) extends RuntimeException(msg)

object BadRequest {
  /** Run a request-validation expression, relabeling its
    * IllegalArgumentException as BadRequest — for validators shared
    * with non-HTTP callers (Precision.of, the line-protocol parser,
    * CreateRequest.fromJson), whose IAE stays IAE for those callers. */
  def relabel[A](f: => A): A =
    try f
    catch { case e: IllegalArgumentException => throw new BadRequest(e.getMessage) }
}
