"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) over the ``documents`` /
``embeddings`` tables. These are first-class engine components for the
100 TB posture: everything is built-in-function-first, with pandas UDFs
only where vectorized Python is genuinely needed."""
