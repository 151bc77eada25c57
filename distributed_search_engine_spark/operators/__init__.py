"""DataFrame operators of the engine (logical ops I1-I15, P1-P8 of SURVEY §2)."""
