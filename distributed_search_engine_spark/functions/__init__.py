"""Shared scalar functions: tokenization, stemming, stop words, hashing.

Index-time and query-time code import the SAME functions, mirroring the
reference's requirement that the Indexer and SearchEngine regexes match
(reference: jobs/Indexer.java:77-95 vs frontend/SearchEngine.java:27-30).
"""
