"""zcollection_spark — a PySpark-native partitioned-collection engine.

Re-expresses the capabilities of CNES/zcollection (reference at
``/root/reference/``, see ``SURVEY.md``) on Spark DataFrames: partitioned
collections over a Hive-style ``key=value/`` layout with schema binding,
partition-predicate pushdown, column projection, insert-with-merge,
per-partition map/update, write-once immutable variables, overlay views and
a parquet secondary index — plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from .collection import (Collection, concat, create_collection,
                         open_collection, replace, time_series, upsert,
                         upsert_within)
from .errors import (CollectionExistsError, CollectionNotFoundError,
                     ExpressionError, FormatVersionError, IndexerError,
                     PartitioningError, ReadOnlyError, SchemaError,
                     StoreError, ViewError, ZCollectionError)
from .layout import (bucketed_join, explain_shuffles, salted_join,
                     write_bucketed)
from .partitioning import (Date, GroupedSequence, Partitioning, Sequence,
                           compile_filter)
from .changes_stream import stream_changes
from .icechunk_compat import open_icechunk_collection
from .schema import (DatasetSchema, Dimension, SchemaBuilder, VariableSchema,
                     infer_schema, nest_struct_columns)
from .session import get_spark
from .xbridge import dataset_nbytes, is_lazy, tree_repr

__version__ = "0.1.0"

__all__ = [
    "Collection", "create_collection", "open_collection",
    "open_icechunk_collection",
    "replace", "concat", "time_series", "upsert", "upsert_within",
    "Date", "Sequence", "GroupedSequence", "Partitioning", "compile_filter",
    "DatasetSchema", "Dimension", "SchemaBuilder", "VariableSchema",
    "infer_schema", "nest_struct_columns", "get_spark", "stream_changes",
    "dataset_nbytes", "is_lazy", "tree_repr",
    "write_bucketed", "bucketed_join", "salted_join", "explain_shuffles",
    "ZCollectionError", "SchemaError", "PartitioningError",
    "ExpressionError", "StoreError", "CollectionExistsError",
    "CollectionNotFoundError", "ReadOnlyError", "FormatVersionError",
    "ViewError", "IndexerError",
]
