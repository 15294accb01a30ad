"""Scalar/batch kernels: hashing, text analysis, dedup, similarity,
multimodal plumbing.  All vectorized (pyarrow.compute / numpy / pandas)
— no per-row Python in hot paths except C-backed hashlib calls."""
