package graft

/** Core typed row models for the engine.
  *
  * `Basket` is the engine's fundamental input abstraction (SURVEY.md §1.3):
  * one customer purchase sequence — customer id plus products **in purchase
  * order** (order is semantically meaningful; repeats allowed and meaningful,
  * cf. reference `src/CrystalBallPair.java:42-63`).
  */
final case class Basket(customer: String, products: Seq[String])

/** One directed co-occurrence observation: `neighbor` was bought after
  * `product`, within `product`'s repeat-terminated window.
  */
final case class CoPair(product: String, neighbor: String)
