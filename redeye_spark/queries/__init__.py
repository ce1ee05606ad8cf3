"""Driver-contract query registry, split by domain.

Each domain module owns its queries and DuckDB oracles; this package
merges them into the QUERIES/ORACLES dicts consumed by
``__spark_entry__`` and re-exports every query function and SQL
constant for tests.
"""

from . import logs, media, streamq, tpch, training

QUERIES = {}
ORACLES = {}
for _m in (logs, tpch, training, media, streamq):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

for _m in (logs, tpch, training, media, streamq):
    for _k, _v in vars(_m).items():
        if _k.startswith(("q_", "SQL_")):
            globals()[_k] = _v
del _m, _k, _v
