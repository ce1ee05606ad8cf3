"""Back-compat shim: the monolith moved to redeye_spark/queries/*."""

from .queries import *  # noqa: F401,F403
from .queries import QUERIES, ORACLES  # noqa: F401
