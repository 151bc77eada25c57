"""The 124-entry English stop-word list.

Semantics (reference: jobs/Indexer.java:103,463,675-677 and
src/cis5550/resources/stopwords.txt): stop words ARE indexed (positions kept
for phrase search) but flagged is_stop, capped harder (5,000 docs/term vs
20,000), never stemmed, and skipped by the reference-mode scorer
(frontend/SearchEngine.java:314). A single-stop-word query short-circuits to
empty (frontend/SearchEngine.java:117-127).
"""

STOP_WORDS: frozenset[str] = frozenset(
    """a about above after again against all am an and any are as at be
    because been before being below between both but by can did do does
    doing don down during each few for from further had has have having he
    her here hers herself him himself his how i if in into is it its itself
    just me more most my myself no nor not now of off on once only or other
    our ours ourselves out over own same she should so some such than that
    the their theirs them themselves then there these they this those
    through to too under until up very was we were what when where which
    while who whom why will with you your yours yourself yourselves""".split()
)
