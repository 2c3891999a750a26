from .collection import Collection, create_collection, open_collection
from .merge import (concat, replace, resolve_merge, time_series, upsert,
                    upsert_within)

__all__ = ["Collection", "create_collection", "open_collection",
           "replace", "concat", "time_series", "upsert", "upsert_within",
           "resolve_merge"]
