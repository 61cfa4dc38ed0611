"""Reusable engine operators.

Modules:
    relational.py — join/agg helpers with scale-aware strategies
    chunking.py   — row-number chunker + range batcher (W1/W2)
    validation.py — constraint validation gates (error catalogue)
    dedup.py      — exact / MinHash-LSH / SimHash / n-gram Jaccard
    similarity.py — cosine expressions, brute-force + LSH ANN
    text.py       — tokenization, quality, language-ID, fingerprints
    multimodal.py — binary media columns (decode stubbed; plumbing real)
    asof.py       — as-of join composition
"""
