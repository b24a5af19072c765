"""Structured Streaming ingest (optional surface).

The reference has NO event-time streaming engine — its 'streaming' is
push-based incremental parse/IO (``StreamRDF``,
``jena-arq/.../riot/system/StreamRDF.java``; ``PipedRDFIterator``).
Honest mapping (SURVEY.md §2.11): batch semantics are the target;
``ingest.stream_transcripts`` mirrors StreamRDF's incremental role by
running the SAME extraction stages per micro-batch via foreachBatch.
We deliberately do not invent watermark/window semantics the reference
lacks."""
