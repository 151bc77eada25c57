"""Query-time engine: expansion, reference TF-IDF scorer, BM25, WAND, suggest."""
