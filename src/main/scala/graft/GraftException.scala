package graft

/** Engine-level errors, mirroring the reference's exception surface
  * (ref: slide/exceptions.py:1-22 — SlideException / SlideInvalidOperation /
  * SlideIndexIncompatibleError / SlideCastError).
  */
class GraftException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Raised when a cast between two types is not allowed by the SQL cast
  * matrix (ref: slide/utils.py:1017,1057 raise SlideCastError).
  */
class GraftCastException(msg: String) extends GraftException(msg)

/** Raised for invalid operations, e.g. an unknown join type
  * (ref: slide/utils.py:58-61).
  */
class GraftInvalidOperation(msg: String) extends GraftException(msg)
