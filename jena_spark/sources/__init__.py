"""Sources & sinks. N-Triples/N-Quads are line-oriented — the same
splittable-by-newline property jena-elephas exploits for distributed
reads (``jena-elephas/jena-elephas-io/.../input/ntriples/NTriplesInputFormat.java``)
is what makes ``spark.read.text`` + JVM-side regex parsing the right
Spark mapping. Iceberg/Delta writers are gated behind import-try (jars
not in the sandbox image)."""
