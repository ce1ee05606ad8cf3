"""Driver-contract query registry, split by domain.

Each domain module owns its queries and DuckDB oracles; this package
merges them into the QUERIES/ORACLES dicts consumed by
``__spark_entry__`` and re-exports every query function and SQL
constant for tests.
"""

from . import (
    annq, dedupq, eventsq, graphq, logs, media, searchq, streamq, tokensq,
    tpch, tpch2, tpch3, training, urlq, windowsq,
)

QUERIES = {}
ORACLES = {}
# Registration order IS the driver's verification order (its correctness
# budget caps at the first 50 entries). Round 5 rotates the
# training/media/streaming families to the FRONT: they were past the
# 50-slot window in r3/r4 and never got a driver row, while the
# logs/TPC-H families have been driver-verified twice running
# (r4 verdict #2). validate.py covers ALL entries at sf0.1 regardless.
_MODULES = (training, dedupq, annq, media, streamq, graphq, tpch2, eventsq,
            tokensq, searchq, tpch3, urlq, logs, tpch, windowsq)
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

for _m in _MODULES:
    for _k, _v in vars(_m).items():
        if _k.startswith(("q_", "SQL_")):
            globals()[_k] = _v
del _m, _k, _v
