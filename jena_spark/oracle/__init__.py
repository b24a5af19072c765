"""Reference-semantics oracle: a tiny pure-Python re-implementation of
Jena's Graph/Model contract plus a single-threaded run of the same
extraction rules the distributed pipeline applies. The P/R gate
(BASELINE.md) compares the Spark pipeline's emitted triples against
this oracle's."""
