"""Object-store quick-start: a collection on Azure Blob (az://), end to
end against a local emulator — create → insert → query → concurrent-
writer CAS → manifest publish.

The reference reaches az:// through obstore
(``/root/reference/zcollection/store/factory.py:22-79``); here
:class:`zcollection_spark.fs.AzureBlobFS` speaks the Blob REST API
directly (SharedKey signing, conditional-PUT CAS), and the staged
manifest publish gives crash-safe commits on a store with no atomic
rename.  The same program runs against real Azure by setting
``AZURE_STORAGE_ACCOUNT``/``AZURE_STORAGE_KEY`` and dropping the
endpoint override.  Run: ``python examples/ex_object_store.py``
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# the signature-verifying emulator lives with the tests (a test double,
# not library surface) — real deployments talk to real Azure instead
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import pandas as pd

from azurite_mini import ACCOUNT, KEY_B64, start_server

import zcollection_spark as zc
from zcollection_spark.errors import CommitConflictError
from zcollection_spark.fs import AzureBlobFS


def main() -> None:
    srv, endpoint = start_server()
    os.environ.update(AZURE_STORAGE_ACCOUNT=ACCOUNT,
                      AZURE_STORAGE_KEY=KEY_B64,
                      AZURE_BLOB_ENDPOINT=endpoint)
    spark = zc.get_spark("ex-object-store")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. a collection rooted on az:// — no JVM connector needed: bulk
    # I/O rides the scratch bridge, metadata is direct REST
    schema = (zc.SchemaBuilder()
              .add_dimension("t")
              .add_variable("t", "int64", ("t",))
              .add_variable("value", "float64", ("t",))
              .add_variable("day", "int64", ("t",))
              .build())
    coll = zc.create_collection(
        spark, "az://demo/telemetry", schema=schema, axis="t",
        partitioning=zc.Sequence(("day",)))
    assert isinstance(coll._fs, AzureBlobFS)

    pdf = pd.DataFrame({
        "t": np.arange(30, dtype=np.int64),
        "value": np.sin(np.arange(30) / 5.0),
        "day": np.repeat(np.arange(3, dtype=np.int64), 10)})
    coll.insert(spark.createDataFrame(pdf,
                                      schema=coll.schema.to_struct_type()))
    print("partitions:", coll.partitions())
    print("day==1 rows:", coll.query(filters="day == 1").count())

    # 2. the catalog commit is a TRUE compare-and-swap (conditional
    # PUT): a writer holding a stale ETag loses loudly, never silently
    fs = coll._fs
    state_path = "az://demo/telemetry/_catalog/state.json"
    text, token = fs.read_versioned(state_path)
    fs.write_if(state_path, text, token)          # winner
    try:
        fs.write_if(state_path, text, token)      # stale token: loses
    except CommitConflictError as exc:
        print("stale writer correctly rejected:", exc)

    # 3. publish the file manifest: the collection becomes servable
    # from any static/read-only mirror (see the http(s):// store)
    manifest = coll.write_manifest()
    print("manifest partitions:", sorted(manifest))

    print("api calls:", dict(fs.api_counts))
    srv.shutdown()


if __name__ == "__main__":
    main()
