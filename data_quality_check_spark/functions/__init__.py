"""Scalar / vectorized functions: text models (langid, perplexity), scrub,
text analysis, dedup and similarity primitives."""
