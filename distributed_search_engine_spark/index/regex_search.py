"""Regex search over the trigram index — the Google-Code-Search query
planner (Cox, "Regular Expression Matching with a Trigram Index", 2012;
the same structure Zoekt and livegrep use). The reference engine's query
pipeline matches whole tokens only (jobs/Indexer.java tokenizer +
jobs/Query.java lookup); a source-code corpus needs REGEX search
(``(memcpy|strcpy)\\s*\\(``) — this module compiles a regex into a
lossless boolean trigram requirement, prunes candidates through the
:mod:`trigram` postings, and exact-verifies only the survivors.

Compilation (``required_clauses``): a small recursive-descent parse of
the pattern (alternation / concatenation / quantified atoms), then a
requirement analysis that extracts, per match branch, the literal runs
every match MUST contain contiguously:

  - a literal char extends the current run; ``x+`` keeps x then breaks
    the run (later chars are no longer adjacent); ``x?``/``x*`` breaks
    the run WITHOUT x (x is optional);
  - ``.``, char classes, anchors, and groups break runs;
  - a group quantified min>=1 contributes its own clauses; min==0 drops
    them (the group may not occur at all);
  - alternation ORs its branches: one clause per branch is chosen and
    their alternatives unioned — sound because a match of branch i
    satisfies every clause of branch i, in particular the chosen one.

The result is a CNF ``[[alt, ...], ...]``: every clause must hold, a
clause holds when SOME alternative literal is contained. Any clause
with an alternative shorter than 3 chars is dropped whole (dropping a
REQUIREMENT is lossless — it only widens the candidate set; dropping an
alternative would not be). An empty CNF degrades to the full exact scan
(documented seam, same as sub-3-char needles in ``substring_search``).

100-TB shape: the clause table is a tiny literal DataFrame broadcast
against the (trigram, doc_id) postings; candidate evaluation is two
bounded aggregations (alt satisfied -> clause satisfied -> all clauses
satisfied); the exact ``(?i)`` regex verify touches candidates only.
The gate oracle is an INDEPENDENT full-scan ``regexp_matches`` in
DuckDB (RE2) with no trigram machinery — equality proves the compiled
requirement is lossless, not merely twin-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .trigram import trigram_stats

# ---------------------------------------------------------------------------
# parser: pattern -> AST
#   node := ("alt", [node, ...]) | ("cat", [atom, ...])
#   atom := ("lit", char, min, max) | ("any", min, max)
#          | ("grp", node, min, max)
# max is None for unbounded. "any" covers ., classes, \d-style escapes,
# anchors, and opaque constructs — anything that breaks a literal run.

_CLASS_ESCAPES = set("dDwWsSbBAZzG")


class RegexCompileError(ValueError):
    """Raised on an unparseable pattern (unbalanced group/class/brace)."""


def _parse(pattern: str):
    pos = 0
    n = len(pattern)

    def parse_alt():
        nonlocal pos
        branches = [parse_cat()]
        while pos < n and pattern[pos] == "|":
            pos += 1
            branches.append(parse_cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def parse_cat():
        nonlocal pos
        atoms = []
        while pos < n and pattern[pos] not in "|)":
            atoms.append(parse_atom())
        return ("cat", atoms)

    def parse_quant():
        nonlocal pos
        if pos >= n:
            return 1, 1
        c = pattern[pos]
        if c == "?":
            lo, hi = 0, 1
        elif c == "*":
            lo, hi = 0, None
        elif c == "+":
            lo, hi = 1, None
        elif c == "{":
            end = pattern.find("}", pos)
            if end < 0:
                raise RegexCompileError("unbalanced {")
            body = pattern[pos + 1 : end]
            parts = body.split(",")
            try:
                lo = int(parts[0]) if parts[0] else 0
                hi = (
                    lo
                    if len(parts) == 1
                    else (int(parts[1]) if parts[1] else None)
                )
            except ValueError as e:
                raise RegexCompileError(f"bad quantifier {{{body}}}") from e
            pos = end  # advance past body; '}' consumed below
        else:
            return 1, 1
        pos += 1
        if pos < n and pattern[pos] == "?":  # lazy marker — same counts
            pos += 1
        return lo, hi

    def parse_atom():
        nonlocal pos
        c = pattern[pos]
        if c == "(":
            pos += 1
            opaque = False
            if pos < n and pattern[pos] == "?":
                pos += 1
                if pos < n and pattern[pos] in ":":
                    pos += 1
                elif pos < n and pattern[pos] in "=!<":
                    # lookaround: contents are NOT consumed by the match,
                    # so its literals are not required — treat as opaque
                    opaque = True
                else:
                    # inline flags (?i) / (?is:...) — skip to ':' or ')'
                    while pos < n and pattern[pos] not in ":)":
                        pos += 1
                    if pos < n and pattern[pos] == ":":
                        pos += 1
            inner = parse_alt()
            if pos >= n or pattern[pos] != ")":
                raise RegexCompileError("unbalanced (")
            pos += 1
            lo, hi = parse_quant()
            if opaque:
                return ("any", 0, 0)
            return ("grp", inner, lo, hi)
        if c == "[":
            pos += 1
            if pos < n and pattern[pos] == "^":
                pos += 1
            if pos < n and pattern[pos] == "]":  # leading ] is literal
                pos += 1
            while pos < n and pattern[pos] != "]":
                pos += 2 if pattern[pos] == "\\" else 1
            if pos >= n:
                raise RegexCompileError("unbalanced [")
            pos += 1
            lo, hi = parse_quant()
            return ("any", lo, hi)
        if c == "\\":
            if pos + 1 >= n:
                raise RegexCompileError("trailing backslash")
            esc = pattern[pos + 1]
            pos += 2
            lo, hi = parse_quant()
            if esc in _CLASS_ESCAPES or esc.isdigit():
                return ("any", lo, hi)  # class escape / backreference
            ch = {"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc)
            return ("lit", ch, lo, hi)
        if c in ".^$":
            pos += 1
            lo, hi = parse_quant()
            return ("any", lo, hi)
        pos += 1
        lo, hi = parse_quant()
        return ("lit", c, lo, hi)

    node = parse_alt()
    if pos != n:
        raise RegexCompileError(f"unbalanced ) at {pos}")
    return node


# ---------------------------------------------------------------------------
# requirement analysis: AST -> CNF [[alt, ...], ...] over lowercased
# literal strings; every clause's every alternative is >= 3 chars.


def _clauses(node) -> list[list[str]]:
    kind = node[0]
    if kind == "alt":
        chosen: list[str] = []
        for branch in node[1]:
            branch_clauses = _clauses(branch)
            if not branch_clauses:
                return []  # one unprunable branch -> OR gives no info
            # pick the branch clause with the longest shortest-alternative
            # (rarest trigrams tend to live in the longest required runs)
            best = max(branch_clauses, key=lambda cl: min(map(len, cl)))
            chosen.extend(best)
        return [sorted(set(chosen))]
    if kind == "cat":
        out: list[list[str]] = []
        run: list[str] = []

        def flush():
            if len(run) >= 3:
                out.append(["".join(run)])
            run.clear()

        for atom in node[1]:
            akind = atom[0]
            if akind == "lit":
                _, ch, lo, hi = atom
                if lo >= 1 and hi == 1:
                    run.append(ch.lower())
                elif lo >= 1:  # x+ / x{2,}: x required, adjacency ends
                    run.append(ch.lower())
                    flush()
                else:  # optional: required run breaks, x excluded
                    flush()
            elif akind == "grp":
                _, inner, lo, _hi = atom
                flush()
                if lo >= 1:
                    out.extend(_clauses(inner))
            else:  # "any"
                flush()
        flush()
        return out
    raise AssertionError(f"unknown node {kind}")  # pragma: no cover


def required_clauses(pattern: str) -> list[list[str]]:
    """CNF of required literals: every clause must hold; a clause holds
    when some alternative is contained in the lowercased text. ``[]``
    means the pattern is unprunable (full scan)."""
    return [cl for cl in _clauses(_parse(pattern)) if min(map(len, cl)) >= 3]


def _alt_trigrams(alt: str) -> list[str]:
    return sorted({alt[i : i + 3] for i in range(len(alt) - 2)})


def regex_search_batch(
    docs: DataFrame,
    postings: DataFrame,
    patterns: list[str],
    prune_to: int = 4,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(pattern, doc_id, n_matches) for a whole pattern SET in ONE Spark
    job — the batch form of :func:`regex_search` (the same amortization
    substring_search_batch applies to needles).

    All patterns' clause tables union into ONE broadcast frame keyed by
    pattern id; candidate evaluation adds pattern_id to the two
    aggregations; the exact verify matches a per-row PATTERN COLUMN
    (Spark's regexp_count accepts a column regexp; per-pattern compiled
    regex caching happens engine-side). Unprunable patterns take the
    documented full-scan branch; a pattern with an absent required
    literal contributes nothing."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    keyed = docs.withColumn("doc_id", F.col(doc_id_col))

    def verify(frame: DataFrame) -> DataFrame:
        n = F.regexp_count(
            F.coalesce(F.col(content_col), F.lit("")),
            F.concat(F.lit("(?i)"), F.col("pattern")),
        )
        barrier = F.when(
            F.monotonically_increasing_id() >= 0, n
        ).otherwise(F.lit(0))
        return frame.select(
            "pattern", "doc_id", barrier.alias("n_matches")
        ).where("n_matches > 0")

    compiled = {p: required_clauses(p) for p in dict.fromkeys(patterns)}
    needed = sorted(
        {
            g
            for clauses in compiled.values()
            for cl in clauses
            for a in cl
            for g in _alt_trigrams(a)
        }
    )
    df_by_gram = (
        {
            r["trigram"]: r["df"]
            for r in trigram_stats(
                postings.where(F.col("trigram").isin(needed))
            ).collect()
        }
        if needed
        else {}
    )
    rows = []
    fullscan: list[str] = []
    for pat, clauses in compiled.items():
        if not clauses:
            fullscan.append(pat)
            continue
        pat_rows = []
        satisfied = set()
        for ci, clause in enumerate(clauses):
            for ai, alt in enumerate(clause):
                grams = _alt_trigrams(alt)
                if any(g not in df_by_gram for g in grams):
                    continue
                picked = sorted(
                    grams, key=lambda g: (df_by_gram[g], g)
                )[:prune_to]
                satisfied.add(ci)
                pat_rows.extend(
                    (pat, ci, ai, g, len(picked)) for g in picked
                )
        if len(satisfied) < len(clauses):
            continue  # a clause lost every alternative: cannot match
        rows.extend((r, len(clauses)) for r in pat_rows)

    parts = []
    if rows:
        need = spark.createDataFrame(
            [
                (pat, ci, ai, g, an, ncl)
                for (pat, ci, ai, g, an), ncl in rows
            ],
            "pattern string, clause_id int, alt_id int, trigram string,"
            " alt_n int, n_clauses int",
        )
        cand = (
            postings.join(F.broadcast(need), "trigram")
            .groupBy(
                "pattern", "doc_id", "clause_id", "alt_id", "alt_n",
                "n_clauses",
            )
            .agg(F.count(F.lit(1)).alias("_got"))
            .where(F.col("_got") == F.col("alt_n"))
            .select("pattern", "doc_id", "clause_id", "n_clauses")
            .distinct()
            .groupBy("pattern", "doc_id", "n_clauses")
            .agg(F.count(F.lit(1)).alias("_ncl"))
            .where(F.col("_ncl") == F.col("n_clauses"))
            .select("pattern", "doc_id")
        )
        parts.append(verify(keyed.join(cand, "doc_id")))
    for pat in fullscan:
        parts.append(verify(keyed.withColumn("pattern", F.lit(pat))))
    if not parts:
        return spark.createDataFrame(
            [], "pattern string, doc_id string, n_matches int"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def regex_search(
    docs: DataFrame,
    postings: DataFrame,
    pattern: str,
    prune_to: int = 4,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matches): every doc whose text matches ``pattern``
    case-insensitively, found through the trigram index.

    Each clause alternative keeps only its ``prune_to`` rarest trigrams
    (one bounded collect against the stats table — lossless, dropping
    requirements only widens candidates). Candidate evaluation is a
    broadcast join of the clause table against the postings plus two
    aggregations; the ``(?i)`` exact verify runs on candidates only.
    Unprunable patterns degrade to the exact full scan."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    clauses = required_clauses(pattern)
    ci_pat = f"(?i){pattern}"

    def verify(frame: DataFrame) -> DataFrame:
        # the exact regex runs AFTER any candidate join, so the (costly)
        # engine match touches candidate rows only. The always-true
        # nondeterministic wrapper on the projected column is
        # load-bearing: with a plain deterministic projection Catalyst
        # pushes the n_matches > 0 filter back through the join to the
        # full docs scan (pushdown has no per-row cost model),
        # re-running the regex on EVERY doc; a filter never pushes
        # through a projection with a nondeterministic field. Locked by
        # test_regex_plan_verifies_after_candidate_join.
        n = F.regexp_count(
            F.coalesce(F.col(content_col), F.lit("")), F.lit(ci_pat)
        )
        barrier = F.when(
            F.monotonically_increasing_id() >= 0, n
        ).otherwise(F.lit(0))
        return frame.select(
            "doc_id", barrier.alias("n_matches")
        ).where("n_matches > 0")

    keyed = docs.withColumn("doc_id", F.col(doc_id_col))
    if not clauses:
        return verify(keyed)
    needed = sorted({g for cl in clauses for a in cl for g in _alt_trigrams(a)})
    df_by_gram = {
        r["trigram"]: r["df"]
        for r in trigram_stats(
            postings.where(F.col("trigram").isin(needed))
        ).collect()
    }
    rows = []
    for ci, clause in enumerate(clauses):
        for ai, alt in enumerate(clause):
            grams = _alt_trigrams(alt)
            # a required trigram missing from the whole corpus kills this
            # alternative outright — no doc can contain the literal
            if any(g not in df_by_gram for g in grams):
                continue
            picked = sorted(grams, key=lambda g: (df_by_gram[g], g))[:prune_to]
            rows.extend(
                (ci, ai, g, len(picked)) for g in picked
            )
    clause_alts = {ci for ci, _, _, _ in rows}
    if len(clause_alts) < len(clauses):
        # some clause lost ALL alternatives -> pattern cannot match
        return verify(keyed.where(F.lit(False)))
    need = spark.createDataFrame(
        rows, "clause_id int, alt_id int, trigram string, alt_n int"
    )
    cand = (
        postings.join(F.broadcast(need), "trigram")
        .groupBy("doc_id", "clause_id", "alt_id", "alt_n")
        .agg(F.count(F.lit(1)).alias("_got"))
        .where(F.col("_got") == F.col("alt_n"))
        .select("doc_id", "clause_id")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_ncl"))
        .where(F.col("_ncl") == len(clauses))
        .select("doc_id")
    )
    return verify(keyed.join(cand, "doc_id"))
