"""Round-6 optimization: differential tests pinning the vectorized Arrow
kernels (operators/arrow_kernels.py) value-identical to the JVM Column
paths they replaced. Every operator keeps a use_arrow=False fallback
precisely so this comparison stays runnable; the DuckDB oracle gates
cover the same operators end-to-end at sf0.01/sf0.001.

The fixture corpus stresses the edge cases the kernels must reproduce:
empty docs, whitespace-only, NULL content, sub-window-length docs,
HTML tags, punctuation, unicode (case mapping + multibyte trigrams),
vertical-tab/whitespace-class corners, and heavy repetition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.operators import dedup as D
from distributed_search_engine_spark.operators import text_analysis as TA
from distributed_search_engine_spark.index import trigram as TRI


ROWS = [
    (1, "The quick brown fox jumps over the lazy dog the quick brown fox"),
    (2, ""),
    (3, "   "),
    (4, None),
    (5, "a"),
    (6, "Hello, WORLD! 123 foo-bar <b>tag</b> baz qux quux corge grault"),
    (7, "ünïcode tëst ça va? 日本語 text here more words again ok fine"),
    (8, "x y z w v u t s r q p o n m l k j i h g f e d c b a " * 3),
    (9, "repeat me repeat me repeat me repeat me repeat me repeat me"),
    (10, "tab\tsep\nnewline\x0bvtab mix   spaces"),
    (11, "İstanbul ẞtraße ÆØÅ mixed CASE words here"),
]


@pytest.fixture(scope="module")
def kdocs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_simhash_kernel_matches_jvm(spark, kdocs):
    assert _rows(D.simhash(kdocs)) == _rows(D.simhash(kdocs, use_arrow=False))


def test_shingles_kernel_matches_jvm(spark, kdocs):
    for n in (2, 3, 5):
        assert _rows(D.shingles(kdocs, n=n)) == _rows(
            D.shingles(kdocs, n=n, use_arrow=False)
        )


def test_window_hash_kernel_matches_jvm(spark, kdocs):
    for w in (3, 8):
        assert _rows(D.duplicate_windows(kdocs, w)) == _rows(
            D.duplicate_windows(kdocs, w, use_arrow=False)
        )


def test_token_count_kernel_matches_jvm(spark, kdocs):
    from distributed_search_engine_spark.operators.arrow_kernels import (
        token_counts_arrow,
    )

    jvm = D._token_arrays(kdocs, "doc_id", "text").select(
        "doc_id", F.size("toks").alias("n_tokens")
    )
    assert _rows(token_counts_arrow(kdocs)) == _rows(jvm)


def test_bigram_stream_kernel_matches_jvm(spark, kdocs):
    assert _rows(TA._bigram_stream(kdocs, "doc_id", "text")) == _rows(
        TA._bigram_stream(kdocs, "doc_id", "text", use_arrow=False)
    )


def test_cms_kernel_matches_jvm(spark, kdocs):
    assert _rows(TA.cms_build(kdocs)) == _rows(TA.cms_build(kdocs, use_arrow=False))


def test_distinct_tokens_kernel_matches_jvm(spark, kdocs):
    from distributed_search_engine_spark.operators.arrow_kernels import (
        distinct_tokens_arrow,
    )

    jvm = (
        TA._tok_df(kdocs, "doc_id", "text")
        .where(F.col("tok") != "")
        .select("tok")
        .distinct()
    )
    assert _rows(distinct_tokens_arrow(kdocs)) == _rows(jvm)


def test_hll_registers_kernel_matches_jvm(spark, kdocs):
    from distributed_search_engine_spark.functions.hashing import md5_prefix_long
    from distributed_search_engine_spark.operators.arrow_kernels import (
        hll_registers_arrow,
    )

    b, rem = 8, 24
    t = TA._tok_df(kdocs, "doc_id", "text").where(F.col("tok") != "")
    h = md5_prefix_long(F.col("tok"))
    r = h.bitwiseAND(F.lit((1 << rem) - 1))
    rho = F.when(r == 0, F.lit(rem + 1)).otherwise(
        F.lit(rem + 1) - F.length(F.bin(r))
    )
    jvm = (
        t.select(F.shiftright(h, rem).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("reg"))
    )
    assert _rows(hll_registers_arrow(kdocs, b)) == _rows(jvm)


def test_trigram_kernel_matches_jvm(spark, kdocs):
    assert _rows(TRI.trigram_postings(kdocs)) == _rows(
        TRI.trigram_postings(kdocs, use_arrow=False)
    )
